"""Snapshot rollback (deletes.rollback_to) — the Iceberg
rollback_to_snapshot action as a compensating replace commit.

Invariants: after rollback the CURRENT table equals the as_of=to_seq
table exactly (multiset); history between to_seq and the rollback epoch
stays time-travel readable; the changelog algebra holds across the
rollback epoch; expired targets refuse.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from choetl_spark.deletes import delete_where, rewrite_partitions, rollback_to
from choetl_spark.engine import EncodeConfig
from choetl_spark.ledger import (
    encode_with_resume,
    read_changes,
    scan_encoded,
    snapshots,
)
from choetl_spark.synth import webpages


def _rows(df):
    return sorted(
        (r["url"], r["text"]) for r in df.select("url", "text").collect()
    )


def _latest(spark, out):
    return max(r["run_seq"] for r in snapshots(spark, out).collect())


CFG = EncodeConfig(num_partitions=3, chunk_rows=128, bloom_columns=("url",))


def _ingest(spark, out, pages, run_id, id_base):
    planned = pages.withColumn(
        "part_id", (F.xxhash64("url") % 3 + 3) % 3 + id_base
    )
    encode_with_resume(spark, planned, out, CFG, run_id=run_id)


def test_rollback_pure_append_is_metadata_only(spark, tmp_path):
    out = str(tmp_path / "rb1")
    a = webpages(spark, 300, partitions=2).cache()
    b = (
        webpages(spark, 200, partitions=2)
        .withColumn("url", F.concat(F.lit("https://b.example/"), F.col("url")))
        .cache()
    )
    _ingest(spark, out, a, "i1", 0)
    seq_a = _latest(spark, out)
    _ingest(spark, out, b, "i2", 100)
    seq_b = _latest(spark, out)

    res = rollback_to(spark, out, seq_a, cfg=CFG)
    assert res["partitions_rewritten"] == 0  # metadata-only compensation
    assert res["partitions_retired"] > 0
    assert _rows(scan_encoded(spark, out, ["url", "text"])) == _rows(a)
    # history between to_seq and the rollback epoch is still readable
    assert _rows(
        scan_encoded(spark, out, ["url", "text"], as_of=seq_b)
    ) == _rows(a.unionByName(b))
    # the rollback epoch shows up in the snapshot list as a replace
    ops = {r["run_seq"]: r["operation"] for r in snapshots(spark, out).collect()}
    assert ops[res["rollback_epoch"]] == "replace"
    # ingest after rollback: new data lands on the rolled-back base
    c = (
        webpages(spark, 100, partitions=2)
        .withColumn("url", F.concat(F.lit("https://c.example/"), F.col("url")))
        .cache()
    )
    _ingest(spark, out, c, "i3", 200)
    assert _rows(scan_encoded(spark, out, ["url", "text"])) == _rows(
        a.unionByName(c)
    )
    a.unpersist(), b.unpersist(), c.unpersist()


def test_rollback_resurrects_deleted_rows(spark, tmp_path):
    out = str(tmp_path / "rb2")
    a = webpages(spark, 400, partitions=2).cache()
    _ingest(spark, out, a, "i1", 0)
    seq_a = _latest(spark, out)
    victim = a.select("lang").first()["lang"]
    delete_where(spark, out, equals={"lang": victim})
    assert _rows(scan_encoded(spark, out, ["url", "text"])) == _rows(
        a.filter(F.col("lang") != victim)
    )

    res = rollback_to(spark, out, seq_a, cfg=CFG)
    assert res["partitions_rewritten"] > 0  # tombstoned parts re-encoded
    got = scan_encoded(spark, out, ["url", "text", "lang"])
    assert _rows(got) == _rows(a)
    # the restored copy is clean data, not merge-on-read: deleted-lang
    # rows are back and exact
    assert got.filter(F.col("lang") == victim).count() == a.filter(
        F.col("lang") == victim
    ).count()
    a.unpersist()


def test_rollback_across_rewrite_resurrects_retired_parts(spark, tmp_path):
    out = str(tmp_path / "rb3")
    a = webpages(spark, 400, partitions=2).cache()
    _ingest(spark, out, a, "i1", 0)
    seq_a = _latest(spark, out)
    victim = a.select("lang").first()["lang"]
    delete_where(spark, out, equals={"lang": victim})
    seq_del = _latest(spark, out)
    # materialize tombstones: retires the original partitions
    rw = rewrite_partitions(spark, out, min_deleted_fraction=0.0, cfg=CFG)
    assert rw["partitions_rewritten"] > 0
    expect_del = _rows(a.filter(F.col("lang") != victim))
    assert _rows(scan_encoded(spark, out, ["url", "text"])) == expect_del

    # roll back to the post-delete, pre-rewrite snapshot: the retired
    # originals are re-encoded from as_of content (tombstones applied)
    res = rollback_to(spark, out, seq_del, cfg=CFG)
    assert res["partitions_rewritten"] > 0
    assert _rows(scan_encoded(spark, out, ["url", "text"])) == expect_del
    # and further back to the pre-delete snapshot: everything returns
    rollback_to(spark, out, seq_a, cfg=CFG)
    assert _rows(scan_encoded(spark, out, ["url", "text"])) == _rows(a)
    a.unpersist()


def test_rollback_changelog_algebra_and_noop(spark, tmp_path):
    out = str(tmp_path / "rb4")
    a = webpages(spark, 300, partitions=2).cache()
    b = (
        webpages(spark, 150, partitions=2)
        .withColumn("url", F.concat(F.lit("https://b.example/"), F.col("url")))
        .cache()
    )
    _ingest(spark, out, a, "i1", 0)
    seq_a = _latest(spark, out)
    _ingest(spark, out, b, "i2", 100)
    seq_b = _latest(spark, out)
    assert rollback_to(spark, out, seq_b, cfg=CFG)["rollback_epoch"] is None

    res = rollback_to(spark, out, seq_a, cfg=CFG)
    seq_rb = res["rollback_epoch"]
    # scan@seq_b + inserts − deletes == scan@seq_rb across the rollback
    pre = scan_encoded(spark, out, ["url", "text"], as_of=seq_b)
    post = scan_encoded(spark, out, ["url", "text"], as_of=seq_rb)
    ch = read_changes(spark, out, seq_b, seq_rb)
    ins = ch.filter(F.col("_change_type") == "insert").select("url", "text")
    dels = ch.filter(F.col("_change_type") == "delete").select("url", "text")
    lhs = pre.unionAll(ins).exceptAll(dels)
    assert lhs.exceptAll(post).count() == 0
    assert post.exceptAll(lhs).count() == 0
    a.unpersist(), b.unpersist()


def test_rollback_below_expiry_floor_refuses(spark, tmp_path):
    from choetl_spark.ledger import expire_snapshots

    out = str(tmp_path / "rb5")
    a = webpages(spark, 200, partitions=2).cache()
    _ingest(spark, out, a, "i1", 0)
    seq_a = _latest(spark, out)
    b = (
        webpages(spark, 100, partitions=2)
        .withColumn("url", F.concat(F.lit("https://b.example/"), F.col("url")))
        .cache()
    )
    _ingest(spark, out, b, "i2", 100)
    seq_b = _latest(spark, out)
    expire_snapshots(spark, out, older_than_seq=seq_b)
    with pytest.raises(ValueError, match="expired"):
        rollback_to(spark, out, seq_a, cfg=CFG)
    a.unpersist(), b.unpersist()
