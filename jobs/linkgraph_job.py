"""spark-submit entry point for the LINK-GRAPH pipeline: crawl pages ->
outlink edge list -> PageRank (optionally HITS) -> per-url scores in a
resumable encoded store.

    spark-submit --py-files choetl_spark.zip jobs/linkgraph_job.py \\
        --input  /path/to/webpages.parquet   (url + html columns) \\
        --output /path/to/linkrank           (encoded chunks + ledger) \\
        [--warc]           input is a WARC/WET directory instead \\
        [--n-iter 10] [--damping 0.85] [--hits] [--canonicalize] \\
        [--partitions 256] [--profile speed] [--run-id X]

The page-importance stage of a crawl/training-data pipeline (crawl
prioritization, quality weighting for mixtures), composed entirely
from `choetl_spark.operators`:

    with_outlinks    html -> resolved outgoing links (pure map, zero
                     shuffle — the edge list materializes without
                     touching an exchange)
      -> [optional] with_url_canonical on BOTH endpoints, so
         `page.html?utm_source=x` and `page.html` are one node
      -> xxhash64 both endpoints -> (src, dst) LONG edges: every
         PageRank/HITS round shuffles 16 bytes/edge instead of two URL
         strings
      -> pagerank (+ optionally hits) over the hashed graph
      -> join scores back to the url universe (pages ∪ link targets;
         `is_page` marks urls we actually crawled vs frontier-only)
      -> resumable encode into the chunk store (ledger commit; re-runs
         skip completed partitions)

Scale notes: the only per-round state is (node, rank/deg) longs+doubles;
html never crosses a shuffle. xxhash64 node ids are a 64-bit space — at
the north rule's 10^12 urls the birthday bound expects ~30k colliding
pairs (n^2 / 2^65), each merging two urls' link mass; deploying at that
scale, widen to 128 bits (two xxhash64 seeds) and keep this job's shape.
Prints ONE JSON line: page/edge/node counts, rank mass (must be ~1.0),
and the encode summary.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_graph(spark, args):
    """(pages, edges, url_nodes): load input, extract + hash edges."""
    from pyspark.sql import functions as F

    from choetl_spark.operators import (
        with_outlinks,
        with_url_canonical,
    )

    if args.warc:
        from choetl_spark.sources import read_warc, warc_webpages

        pages = warc_webpages(read_warc(spark, args.input))
    else:
        pages = spark.read.parquet(args.input)
    pages = pages.select("url", "html").filter(F.col("url").isNotNull())
    if args.partitions:
        pages = pages.repartition(args.partitions)

    links = (
        with_outlinks(pages, html_col="html", base_url_col="url")
        .select("url", F.explode("outlinks").alias("link"))
        # only followable absolute targets become graph edges; unresolved
        # relative links (pages with no usable origin) are not nodes
        .filter(F.col("link").rlike("^[A-Za-z][A-Za-z0-9+.-]*://"))
    )
    if args.canonicalize:
        links = with_url_canonical(links, url_col="url", out_col="url")
        links = with_url_canonical(links, url_col="link", out_col="link")
        page_urls = with_url_canonical(
            pages.select("url"), url_col="url", out_col="url"
        )
    else:
        page_urls = pages.select("url")
    edges = links.select(
        F.xxhash64("url").alias("src"), F.xxhash64("link").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    url_nodes = (
        page_urls.select("url", F.lit(True).alias("is_page"))
        .unionByName(
            links.select(
                F.col("link").alias("url"), F.lit(False).alias("is_page")
            )
        )
        .groupBy("url")
        # a url that is both crawled page and link target counts as page
        .agg(F.max("is_page").alias("is_page"))
    )
    return pages, edges, url_nodes


def run(spark, args) -> dict:
    from pyspark.sql import functions as F

    from choetl_spark.engine import EncodeConfig
    from choetl_spark.ledger import encode_with_resume
    from choetl_spark.operators import hits, pagerank

    pages, edges, url_nodes = build_graph(spark, args)
    ranks = pagerank(edges, n_iter=args.n_iter, damping=args.damping)
    scores = url_nodes.join(
        ranks, F.xxhash64(url_nodes.url) == ranks.node, "left"
    ).select(
        "url", "is_page", F.coalesce("rank", F.lit(0.0)).alias("rank")
    )
    if args.hits:
        hs = hits(edges, n_iter=args.hits_iter)
        scores = scores.join(
            hs, F.xxhash64(scores.url) == hs.node, "left"
        ).select(
            "url", "is_page", "rank",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("auth", F.lit(0.0)).alias("auth"),
        )
    counts = {
        "pages": pages.count(),
        "edges": edges.distinct().count(),
        "nodes": scores.count(),
        "rank_mass": scores.agg(F.sum("rank")).collect()[0][0],
    }
    cfg = EncodeConfig(
        num_partitions=args.partitions or 32,
        chunk_rows=args.chunk_rows,
        chunk_bytes=args.chunk_bytes,
        key_col="url",
        optimize_for=args.profile,
    )
    summary = encode_with_resume(
        spark, scores, args.output, cfg, run_id=args.run_id
    )
    return {"counts": counts, "encode": summary}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--warc", action="store_true",
                   help="input is a WARC/WET directory, not parquet")
    p.add_argument("--n-iter", type=int, default=10)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--hits", action="store_true")
    p.add_argument("--hits-iter", type=int, default=8)
    p.add_argument("--canonicalize", action="store_true",
                   help="canonicalize urls before hashing node ids")
    p.add_argument("--partitions", type=int, default=0)
    p.add_argument("--chunk-rows", type=int, default=65536)
    p.add_argument("--chunk-bytes", type=int, default=16 << 20)
    p.add_argument("--profile", default="speed",
                   choices=["speed", "balanced", "ratio"])
    p.add_argument("--run-id", default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    from pyspark.sql import SparkSession

    args = build_parser().parse_args(argv)
    spark = SparkSession.builder.appName("choetl-linkgraph").getOrCreate()
    out = run(spark, args)
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
