"""spark-submit entry point for ANALYZE over an encoded store.

    spark-submit --py-files choetl_spark.zip jobs/analyze_job.py \
        --store /path/to/encoded \
        [--ndv url,lang] [--quantiles warc_ts,n_bytes] \
        [--probs 0.05,0.5,0.95] [--as-of 3] [--report stats.json]

Everything here is METADATA-scale — the Iceberg `ANALYZE TABLE` +
`.partitions` analog: per-partition rollups from the ledger, approx
distinct counts from the per-chunk HyperLogLog sketches
(`EncodeConfig.ndv_columns`), and approx percentiles from the
per-chunk quantile digests (`EncodeConfig.quantile_columns`). No
payload bytes are scanned; at 10^12 rows the job collects
O(tasks x columns) sketch rows and one partition-rollup frame.
Columns whose chunks carry no sketch/digest are reported as
unavailable (with the config knob to enable them) rather than
estimated from partial data.
"""

from __future__ import annotations

import argparse
import json
import sys


def _split(s: str | None) -> list[str]:
    return [c.strip() for c in s.split(",") if c.strip()] if s else []


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--store", required=True, help="encoded store dir")
    p.add_argument("--ndv", default=None, help="comma list of columns")
    p.add_argument("--quantiles", default=None, help="comma list of columns")
    p.add_argument("--probs", default="0.05,0.25,0.5,0.75,0.95")
    p.add_argument("--as-of", type=int, default=None, dest="as_of")
    p.add_argument("--report", default=None, help="write JSON here too")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    from choetl_spark.ledger import snapshots, store_partitions

    spark = SparkSession.builder.appName("choetl-analyze").getOrCreate()

    parts = store_partitions(spark, args.store, as_of=args.as_of)
    rollup = parts.agg(
        F.count("*").alias("n_partitions"),
        F.sum("live_rows").alias("live_rows"),
        F.sum("n_chunks").alias("n_chunks"),
        F.sum("encoded_bytes").alias("encoded_bytes"),
        F.sum("raw_bytes").alias("raw_bytes"),
    ).collect()[0]
    report: dict = {
        "store": args.store,
        "as_of": args.as_of,
        "snapshots": [
            {"epoch": r["run_seq"], "operation": r["operation"]}
            for r in snapshots(spark, args.store).collect()
        ],
        "partitions": {k: rollup[k] for k in rollup.asDict()},
        "ndv": {},
        "quantiles": {},
    }

    ndv_cols = _split(args.ndv)
    if ndv_cols:
        from choetl_spark.ndv import approx_ndv

        try:
            report["ndv"] = approx_ndv(
                spark, args.store, ndv_cols, as_of=args.as_of
            )
        except ValueError as e:
            report["ndv"] = {"unavailable": str(e)}

    q_cols = _split(args.quantiles)
    if q_cols:
        from choetl_spark.quantiles import approx_quantile

        probs = [float(x) for x in _split(args.probs)]
        try:
            got = approx_quantile(
                spark, args.store, q_cols, probs, as_of=args.as_of
            )
            report["quantiles"] = {
                c: dict(zip(map(str, probs), vals))
                for c, vals in got.items()
            }
        except ValueError as e:
            report["quantiles"] = {"unavailable": str(e)}

    line = json.dumps(report, default=str)
    print(line)
    if args.report:
        with open(args.report, "w", encoding="utf-8") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
