"""Incremental changelog reads (ledger.read_changes — the Iceberg
incremental scan / changelog analog) and the streaming CDC-apply
(upsert) sink.

The changelog contract is pinned as an algebraic invariant: for every
epoch pair (a, b) across ingest / delete / upsert / clustering-rewrite
history,

    scan(as_of=a)  +  inserts(a, b]  -  deletes(a, b]  ==  scan(as_of=b)

checked as multisets (exceptAll both ways).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from choetl_spark.clustering import rewrite_clustered
from choetl_spark.deletes import delete_where, upsert
from choetl_spark.engine import EncodeConfig
from choetl_spark.ledger import (
    encode_with_resume,
    read_changes,
    scan_encoded,
    snapshots,
)
from choetl_spark.streaming import upsert_sink
from choetl_spark.synth import webpages


def _applies_cleanly(spark, base_df, changes_df, target_df, cols):
    """base + inserts - deletes == target, as multisets."""
    ins = changes_df.filter(F.col("_change_type") == "insert").select(*cols)
    dels = changes_df.filter(F.col("_change_type") == "delete").select(*cols)
    applied = base_df.select(*cols).exceptAll(dels).unionByName(ins)
    tgt = target_df.select(*cols)
    return (
        applied.exceptAll(tgt).count() == 0
        and tgt.exceptAll(applied).count() == 0
    )


def test_changelog_reconstructs_every_epoch_pair(spark, tmp_path):
    out = str(tmp_path / "store")
    pages = webpages(spark, 500, partitions=4).cache()
    pages.count()
    cfg = EncodeConfig(
        num_partitions=4, chunk_rows=128, chunk_bytes=1 << 20,
        bloom_columns=("url",),
    )
    # epoch 1: ingest
    encode_with_resume(spark, pages, out, cfg, run_id="i1")
    # epoch 2: row-level delete
    delete_where(spark, out, equals={"lang": "de"})
    # epochs 3-4: upsert (delete commit + ingest commit)
    upd = pages.filter(F.col("lang") == "en").limit(20).select(
        "url", "warc_ts", "html", F.lit("UPDATED").alias("text"), "lang"
    )
    upsert(spark, out, upd, "url", cfg=cfg)
    # epoch 5: clustering rewrite (pure layout churn — must net to zero)
    rewrite_clustered(spark, out, ["url"], cfg=cfg)

    epochs = [0] + [
        r["run_seq"] for r in snapshots(spark, out).collect()
    ]
    cols = ["url", "text"]
    for a, b in zip(epochs, epochs[1:]):
        base = (
            scan_encoded(spark, out, cols, as_of=a)
            if a > 0
            else spark.createDataFrame([], "url string, text string")
        )
        tgt = scan_encoded(spark, out, cols, as_of=b)
        ch = read_changes(spark, out, a, b, columns=cols)
        assert _applies_cleanly(spark, base, ch, tgt, cols), (a, b)
    # and the widest window: bootstrap straight to latest
    ch = read_changes(spark, out, 0, columns=cols)
    tgt = scan_encoded(spark, out, cols)
    base = spark.createDataFrame([], "url string, text string")
    assert _applies_cleanly(spark, base, ch, tgt, cols)
    # a pure-layout window nets to zero for keyed consumers: the
    # rewrite's inserts and deletes carry identical row multisets
    last = epochs[-1]
    ch = read_changes(spark, out, last - 1, last, columns=cols)
    ins = ch.filter(F.col("_change_type") == "insert").select(*cols)
    dels = ch.filter(F.col("_change_type") == "delete").select(*cols)
    assert ins.exceptAll(dels).count() == 0
    assert dels.exceptAll(ins).count() == 0
    pages.unpersist()


def test_changelog_delete_rows_are_the_tombstoned_rows(spark, tmp_path):
    out = str(tmp_path / "store")
    pages = webpages(spark, 300, partitions=4).cache()
    pages.count()
    cfg = EncodeConfig(num_partitions=3, chunk_rows=128,
                       bloom_columns=("url",))
    encode_with_resume(spark, pages, out, cfg, run_id="i1")
    urls = sorted(r["url"] for r in pages.select("url").collect())
    delete_where(spark, out, equals={"url": urls[:7]})
    ch = read_changes(spark, out, 1, 2, columns=["url"]).collect()
    assert all(r["_change_type"] == "delete" for r in ch)
    assert sorted(r["url"] for r in ch) == urls[:7]
    pages.unpersist()


def test_changelog_refuses_expired_history(spark, tmp_path):
    from choetl_spark.ledger import expire_snapshots

    out = str(tmp_path / "store")
    pages = webpages(spark, 300, partitions=4)
    cfg = EncodeConfig(num_partitions=3, chunk_rows=128,
                       bloom_columns=("url",))
    encode_with_resume(spark, pages, out, cfg, run_id="i1")
    delete_where(spark, out, equals={"lang": "de"})
    rewrite_clustered(spark, out, ["url"], cfg=cfg)
    expire_snapshots(spark, out, older_than_seq=3)
    with pytest.raises(ValueError, match="expired"):
        read_changes(spark, out, 1, 3)


def test_streaming_upsert_sink_idempotent_batches(spark, tmp_path):
    """The foreachBatch CDC-apply callable: two batches land, a REPLAY
    of batch 1 (Spark's retry contract) changes nothing."""
    out = str(tmp_path / "store")
    pages = webpages(spark, 200, partitions=2).cache()
    pages.count()
    cfg = EncodeConfig(num_partitions=2, chunk_rows=128,
                       bloom_columns=("url",))
    encode_with_resume(spark, pages, out, cfg, run_id="seed")
    urls = sorted(r["url"] for r in pages.select("url").collect())

    sink = upsert_sink(spark, out, key="url", cfg=cfg)
    batch1 = pages.filter(F.col("url").isin(urls[:5])).select(
        "url", "warc_ts", "html", F.lit("V1").alias("text"), "lang"
    )
    batch2 = pages.filter(F.col("url").isin(urls[3:8])).select(
        "url", "warc_ts", "html", F.lit("V2").alias("text"), "lang"
    )
    sink(batch1, 0)
    sink(batch2, 1)
    sink(batch2, 1)  # retry replay: same epoch + run_id, no duplicates

    rows = {
        r["url"]: r["text"]
        for r in scan_encoded(spark, out, ["url", "text"]).collect()
    }
    assert len(rows) == 200  # keys unique: no duplicate survived
    for u in urls[:3]:
        assert rows[u] == "V1"
    for u in urls[3:8]:
        assert rows[u] == "V2"
    orig = {r["url"]: r["text"] for r in pages.collect()}
    for u in urls[8:12]:
        assert rows[u] == orig[u]
    pages.unpersist()


def test_streaming_upsert_sink_eq_mode(spark, tmp_path):
    """mode='eq' CDC-apply: same MERGE semantics with no per-batch key
    scan — overlapping batches, a replay, and key uniqueness all hold
    through the equality-delete path."""
    out = str(tmp_path / "store")
    pages = webpages(spark, 200, partitions=2).cache()
    pages.count()
    cfg = EncodeConfig(num_partitions=2, chunk_rows=128,
                       bloom_columns=("url",))
    encode_with_resume(spark, pages, out, cfg, run_id="seed")
    urls = sorted(r["url"] for r in pages.select("url").collect())

    sink = upsert_sink(spark, out, key="url", cfg=cfg, mode="eq")
    batch1 = pages.filter(F.col("url").isin(urls[:5])).select(
        "url", "warc_ts", "html", F.lit("V1").alias("text"), "lang"
    )
    batch2 = pages.filter(F.col("url").isin(urls[3:8])).select(
        "url", "warc_ts", "html", F.lit("V2").alias("text"), "lang"
    )
    sink(batch1, 0)
    sink(batch2, 1)
    sink(batch2, 1)  # retry replay: same epoch + run_id, no duplicates

    rows = {
        r["url"]: r["text"]
        for r in scan_encoded(spark, out, ["url", "text"]).collect()
    }
    assert len(rows) == 200
    for u in urls[:3]:
        assert rows[u] == "V1"
    for u in urls[3:8]:
        assert rows[u] == "V2"
    orig = {r["url"]: r["text"] for r in pages.collect()}
    for u in urls[8:12]:
        assert rows[u] == orig[u]
    with pytest.raises(ValueError, match="mode"):
        upsert_sink(spark, out, key="url", cfg=cfg, mode="nope")
    pages.unpersist()
