"""Benchmark harness (driver contract + scaling evidence).

Default: run headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec}, "sf": ...}

--scaling: run the identical encode job at local[8] and local[32] on the
same input and write BENCH/BASELINE.md with throughput at both plus
efficiency (T32/T8)/4 — the sandbox evidence for the north rule's
N→4N ≥0.8 scaling criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def make_spark(cores: str, shuffle_partitions: int | None = None):
    from pyspark.sql import SparkSession

    n = int(cores)
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("choetl_spark-bench")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 2 * n))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _pages(spark, sf_dir: str):
    """Bench input: the web-page table derived from driver documents,
    html amplified so the encode path moves real bytes."""
    from choetl_spark.synth import webpages_from_documents

    return webpages_from_documents(spark, sf_dir, repeat_html=8)


def bench_encode(spark, sf_dir: str) -> None:
    from choetl_spark.engine import EncodeConfig, encode_dataframe

    pages = _pages(spark, sf_dir)
    cfg = EncodeConfig(num_partitions=64, chunk_rows=8192, chunk_bytes=8 << 20)
    enc = encode_dataframe(pages, cfg)
    enc.select("encoded_bytes").agg({"encoded_bytes": "sum"}).collect()


def bench_roundtrip(spark, sf_dir: str) -> None:
    from choetl_spark.engine import (
        EncodeConfig,
        decode_dataframe,
        encode_dataframe,
    )

    pages = _pages(spark, sf_dir)
    cfg = EncodeConfig(num_partitions=32, chunk_rows=8192, chunk_bytes=8 << 20)
    enc = encode_dataframe(pages, cfg)
    decoded = decode_dataframe(enc, columns=["url", "text"])
    decoded.count()


def bench_pricing(spark, sf_dir: str) -> None:
    import __spark_entry__ as e

    e.q_pricing_summary(spark, sf_dir).collect()


def bench_join_topk(spark, sf_dir: str) -> None:
    import __spark_entry__ as e

    e.q_join_topk_revenue(spark, sf_dir).collect()


def bench_minhash(spark, sf_dir: str) -> None:
    import __spark_entry__ as e

    e.q_minhash_pairs_documents(spark, sf_dir).collect()


def bench_cosine(spark, sf_dir: str) -> None:
    import __spark_entry__ as e

    e.q_cosine_topk(spark, sf_dir).collect()


BENCHES = {
    "encode_webpages": bench_encode,
    "roundtrip_decode": bench_roundtrip,
    "pricing_summary": bench_pricing,
    "join_topk_revenue": bench_join_topk,
    "minhash_pairs": bench_minhash,
    "cosine_topk": bench_cosine,
}


def run_default() -> None:
    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}
    for name, fn in BENCHES.items():
        t0 = time.perf_counter()
        fn(spark, SF_DIR)
        times[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(times.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (encode/decode/query)",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


def _measure_encode(cores: str, sf_dir: str) -> dict:
    """One full encode run at a given parallelism; returns metrics."""
    from pyspark.sql import functions as F

    from choetl_spark.engine import EncodeConfig, encode_dataframe

    spark = make_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    pages = _pages(spark, sf_dir).persist()
    n_rows = pages.count()
    raw_bytes = pages.select(
        (
            F.length("url")
            + F.length("html")
            + F.length(F.col("text"))
            + F.lit(8)
            + F.length("lang")
        ).alias("b")
    ).agg(F.sum("b")).collect()[0][0]
    cfg = EncodeConfig(num_partitions=128, chunk_rows=8192, chunk_bytes=8 << 20)
    t0 = time.perf_counter()
    enc = encode_dataframe(pages, cfg)
    agg = enc.agg(
        F.sum("encoded_bytes").alias("enc"),
        F.sum("pre_zstd_bytes").alias("pre"),
        F.sum("raw_bytes").alias("raw"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    pages.unpersist()
    spark.stop()
    return {
        "cores": int(cores),
        "rows": n_rows,
        "raw_bytes": int(raw_bytes),
        "encoded_bytes": int(agg["enc"]),
        "pre_zstd_bytes": int(agg["pre"]),
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(n_rows / wall, 1),
        "gb_per_sec": round(raw_bytes / wall / 1e9, 4),
    }


def _parquet_zstd_footprint(sf_dir: str) -> int:
    spark = make_spark("8")
    spark.sparkContext.setLogLevel("ERROR")
    out = "/tmp/choetl_bench_parquet_zstd"
    shutil.rmtree(out, ignore_errors=True)
    _pages(spark, sf_dir).write.option("compression", "zstd").parquet(out)
    spark.stop()
    total = 0
    for root, _, files in os.walk(out):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def run_scaling() -> None:
    os.makedirs("BENCH", exist_ok=True)
    r8 = _measure_encode("8", SF_DIR)
    r32 = _measure_encode("32", SF_DIR)
    baseline = _parquet_zstd_footprint(SF_DIR)
    speedup = r32["rows_per_sec"] / r8["rows_per_sec"]
    eff = speedup / (32 / 8)
    ratio_vs_parquet = r8["encoded_bytes"] / baseline
    md = f"""# BENCH/BASELINE.md — measured encode throughput + scaling evidence

Input: web-page table derived from {SF_DIR}/documents.parquet
(repeat_html=8), columns (url, warc_ts, html, text, lang).
Identical input + code at both parallelism levels; only spark.master
differs (`local[8]` vs `local[32]`) — the sandbox evidence for the
north rule's N->4N executor scaling criterion (see BASELINE.md).

| metric | local[8] | local[32] |
|---|---|---|
| rows | {r8["rows"]} | {r32["rows"]} |
| raw bytes | {r8["raw_bytes"]:,} | {r32["raw_bytes"]:,} |
| wall sec | {r8["wall_sec"]} | {r32["wall_sec"]} |
| rows/sec | {r8["rows_per_sec"]:,} | {r32["rows_per_sec"]:,} |
| GB/s (raw in) | {r8["gb_per_sec"]} | {r32["gb_per_sec"]} |

- speedup 8->32 cores: **{speedup:.2f}x** (ideal 4.0x)
- scaling efficiency (T32/T8)/4: **{eff:.3f}** (target >= 0.8)

## Compression footprint

| | bytes |
|---|---|
| raw column data | {r8["raw_bytes"]:,} |
| ours, lightweight codecs only (pre-zstd) | {r8["pre_zstd_bytes"]:,} |
| ours, final (with zstd entropy pass) | {r8["encoded_bytes"]:,} |
| reference Spark parquet (zstd) footprint | {baseline:,} |

- ratio vs raw: **{r8["encoded_bytes"] / r8["raw_bytes"]:.4f}**
- ratio vs reference parquet+zstd: **{ratio_vs_parquet:.4f}** (target <= 1.0)
"""
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(md)
    print(
        json.dumps(
            {
                "local8": r8,
                "local32": r32,
                "scaling_efficiency": round(eff, 4),
                "parquet_zstd_bytes": baseline,
                "ratio_vs_parquet_zstd": round(ratio_vs_parquet, 4),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        run_default()
