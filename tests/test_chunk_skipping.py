"""Chunk-stats predicate skipping (engine analog of row-group stats)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from choetl_spark.engine import (
    EncodeConfig,
    decode_dataframe,
    encode_dataframe,
    prune_partitions_by_stats,
)
from choetl_spark.synth import webpages


@pytest.fixture(scope="module")
def enc(spark):
    pages = webpages(spark, 1500, partitions=4)
    cfg = EncodeConfig(num_partitions=6, chunk_rows=128, chunk_bytes=1 << 20)
    e = encode_dataframe(pages, cfg).cache()
    e.count()
    return e


def test_prune_keeps_matching_rows(spark, enc):
    full = decode_dataframe(enc, columns=["url", "warc_ts"]).cache()
    lo_ts = full.agg(F.min("warc_ts")).collect()[0][0]
    lo = int(lo_ts.timestamp() * 1_000_000)
    pruned = prune_partitions_by_stats(enc, "warc_ts", lo, lo + 10**9)
    assert pruned.select("part_id").distinct().count() <= enc.select(
        "part_id"
    ).distinct().count()
    # every row in the target range survives pruning
    dec = decode_dataframe(pruned, columns=["url", "warc_ts"])
    want = full.filter(
        F.col("warc_ts").cast("long") * 1_000_000 <= lo + 10**9
    ).count()
    got = dec.filter(
        F.col("warc_ts").cast("long") * 1_000_000 <= lo + 10**9
    ).count()
    assert got == want


def test_prune_drops_out_of_range(spark, enc):
    pruned = prune_partitions_by_stats(enc, "warc_ts", 0, 1)  # epoch ~1970
    assert pruned.count() == 0
