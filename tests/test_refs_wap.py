"""Named snapshot refs (tags/branches) and write-audit-publish.

Iceberg-analog contracts pinned here:

- a tag is an immutable named pointer; a branch moves; ``scan_encoded
  (ref=...)`` reads exactly the ``as_of`` snapshot the ref names;
- ``expire_snapshots`` can never expire an epoch a ref still pins
  (retained-by-ref), and reclaims it after ``drop_ref``;
- a staged run is durable + resumable but INVISIBLE everywhere (scan,
  snapshots, changelog) until ``publish_staged`` lands its one-append
  commit; ``abort_staged`` makes the bytes reclaimable and publish
  refuses; maintenance (compact/vacuum) keeps pending stages intact.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from choetl_spark.engine import EncodeConfig
from choetl_spark.ledger import (
    compact_store,
    encode_with_resume,
    expire_snapshots,
    read_changes,
    scan_encoded,
    snapshots,
    vacuum,
)
from choetl_spark.refs import (
    abort_staged,
    create_branch,
    create_tag,
    drop_ref,
    list_refs,
    publish_staged,
    read_staged,
    resolve_ref,
    update_branch,
)
from choetl_spark.synth import webpages

CFG = EncodeConfig(num_partitions=3, chunk_rows=128, bloom_columns=("url",))


def _rows(df):
    return sorted(
        (r["url"], r["text"]) for r in df.select("url", "text").collect()
    )


def _latest(spark, out):
    return max(r["run_seq"] for r in snapshots(spark, out).collect())


def _ingest(spark, out, pages, run_id, id_base, staged=False):
    planned = pages.withColumn(
        "part_id", (F.xxhash64("url") % 3 + 3) % 3 + id_base
    )
    return encode_with_resume(
        spark, planned, out, CFG, run_id=run_id, staged=staged
    )


@pytest.fixture()
def two_batches(spark):
    a = webpages(spark, 300, partitions=2).cache()
    b = (
        webpages(spark, 200, partitions=2)
        .withColumn("url", F.concat(F.lit("https://b.example/"), F.col("url")))
        .cache()
    )
    return a, b


def test_tag_and_branch_lifecycle(spark, tmp_path, two_batches):
    out = str(tmp_path / "refs1")
    a, b = two_batches
    _ingest(spark, out, a, "i1", 0)
    seq_a = _latest(spark, out)
    _ingest(spark, out, b, "i2", 100)
    seq_b = _latest(spark, out)

    create_tag(spark, out, "v1", seq_a)
    create_branch(spark, out, "audit")  # defaults to latest
    assert resolve_ref(out, "v1") == seq_a
    assert resolve_ref(out, "audit") == seq_b

    # ref read == the as_of read it names
    via_ref = scan_encoded(spark, out, ["url", "text"], ref="v1")
    via_seq = scan_encoded(spark, out, ["url", "text"], as_of=seq_a)
    assert _rows(via_ref) == _rows(via_seq) == _rows(a)
    assert _rows(scan_encoded(spark, out, ["url", "text"], ref="audit")) == sorted(
        _rows(a) + _rows(b)
    )

    # tags are immutable; branches move; both refuse bogus epochs
    with pytest.raises(ValueError, match="immutable"):
        update_branch(spark, out, "v1", seq_b)
    update_branch(spark, out, "audit", seq_a)
    assert resolve_ref(out, "audit") == seq_a
    with pytest.raises(ValueError, match="already exists"):
        create_tag(spark, out, "v1", seq_b)
    with pytest.raises(ValueError, match="does not exist"):
        create_tag(spark, out, "future", seq_b + 5)
    with pytest.raises(ValueError, match="as_of or ref"):
        scan_encoded(spark, out, ["url"], as_of=seq_a, ref="v1")
    with pytest.raises(ValueError, match="no ref named"):
        scan_encoded(spark, out, ["url"], ref="nope")

    listed = {
        (r["name"], r["type"], r["run_seq"])
        for r in list_refs(spark, out).collect()
    }
    assert listed == {("v1", "tag", seq_a), ("audit", "branch", seq_a)}
    drop_ref(out, "audit")
    assert [r["name"] for r in list_refs(spark, out).collect()] == ["v1"]
    with pytest.raises(ValueError, match="no ref named"):
        drop_ref(out, "audit")


def test_expire_retains_tagged_snapshot(spark, tmp_path, two_batches):
    from choetl_spark.clustering import rewrite_clustered

    out = str(tmp_path / "refs2")
    a, b = two_batches
    _ingest(spark, out, a, "i1", 0)
    seq_a = _latest(spark, out)
    # a clustering rewrite retires the original partitions -> expiry has
    # something real to reclaim below the floor
    rewrite_clustered(spark, out, ["url"], cfg=CFG)
    seq_rw = _latest(spark, out)
    create_tag(spark, out, "v1", seq_a)

    res = expire_snapshots(spark, out, seq_rw)
    assert res["retained_by_ref"] is True
    assert res["min_as_of_seq"] == seq_a  # clamped to the tag, not seq_rw
    assert res["partitions_reclaimed"] == 0
    # the tagged snapshot still reads
    assert _rows(scan_encoded(spark, out, ["url", "text"], ref="v1")) == _rows(a)

    drop_ref(out, "v1")
    res2 = expire_snapshots(spark, out, seq_rw)
    assert res2["retained_by_ref"] is False
    assert res2["partitions_reclaimed"] == 3


def test_wap_stage_audit_publish(spark, tmp_path, two_batches):
    out = str(tmp_path / "wap1")
    a, b = two_batches
    _ingest(spark, out, a, "base", 0)
    seq_base = _latest(spark, out)

    res = _ingest(spark, out, b, "wap1", 100, staged=True)
    assert res["partitions_encoded_this_run"] == 3

    # invisible everywhere until published
    assert _rows(scan_encoded(spark, out, ["url", "text"])) == _rows(a)
    assert _latest(spark, out) == seq_base  # no new visible epoch
    ops = [r["operation"] for r in snapshots(spark, out).collect()]
    assert ops == ["append"]
    ch = read_changes(spark, out, 0, seq_base)
    assert ch.filter(F.col("_change_type") == "insert").count() == a.count()
    assert ch.filter(F.col("_change_type") == "delete").count() == 0

    # ...except through the audit door
    assert _rows(read_staged(spark, out, "wap1", ["url", "text"])) == _rows(b)

    # a crashed staged run resumes without re-encoding
    res2 = _ingest(spark, out, b, "wap1", 100, staged=True)
    assert res2["partitions_already_done"] == 3
    assert res2["partitions_encoded_this_run"] == 0

    pub = publish_staged(spark, out, "wap1")
    assert pub["partitions_published"] == 3
    assert pub["publish_epoch"] > seq_base
    assert _rows(scan_encoded(spark, out, ["url", "text"])) == sorted(
        _rows(a) + _rows(b)
    )
    # time travel: pre-publish epoch still reads the old table; the
    # changelog bills the staged rows to the PUBLISH epoch
    assert _rows(
        scan_encoded(spark, out, ["url", "text"], as_of=seq_base)
    ) == _rows(a)
    ch = read_changes(spark, out, seq_base, pub["publish_epoch"])
    assert ch.filter(F.col("_change_type") == "insert").count() == b.count()
    assert ch.filter(F.col("_change_type") == "delete").count() == 0

    # idempotent re-publish; the staged rows never double-read
    pub2 = publish_staged(spark, out, "wap1")
    assert pub2["already_published"] is True
    assert _rows(read_staged(spark, out, "wap1", ["url", "text"])) == []
    assert (
        scan_encoded(spark, out, ["url", "text"]).count()
        == a.count() + b.count()
    )


def test_wap_abort_reclaims_and_publish_refuses(spark, tmp_path, two_batches):
    out = str(tmp_path / "wap2")
    a, b = two_batches
    _ingest(spark, out, a, "base", 0)
    _ingest(spark, out, b, "bad", 100, staged=True)

    res = abort_staged(spark, out, "bad")
    assert res["partitions_aborted"] == 3
    with pytest.raises(ValueError, match="aborted"):
        publish_staged(spark, out, "bad")
    assert _rows(read_staged(spark, out, "bad", ["url", "text"])) == []
    assert _rows(scan_encoded(spark, out, ["url", "text"])) == _rows(a)

    # the aborted stage's chunk files are orphans now — vacuum reclaims
    vac = vacuum(spark, out)
    assert vac["files_removed"] > 0 and vac["bytes_reclaimed"] > 0
    assert _rows(scan_encoded(spark, out, ["url", "text"])) == _rows(a)

    # abort of a published run refuses
    _ingest(spark, out, b, "good", 200, staged=True)
    publish_staged(spark, out, "good")
    with pytest.raises(ValueError, match="already published"):
        abort_staged(spark, out, "good")


def test_maintenance_keeps_pending_stage(spark, tmp_path, two_batches):
    out = str(tmp_path / "wap3")
    a, b = two_batches
    _ingest(spark, out, a, "base", 0)
    _ingest(spark, out, b, "wap1", 100, staged=True)

    # compaction must carry the pending stage (and not surface it)
    comp = compact_store(spark, out)
    assert comp["files_after"] <= comp["files_before"]
    assert _rows(scan_encoded(spark, out, ["url", "text"])) == _rows(a)
    vac = vacuum(spark, out)
    assert vac["files_removed"] == 0  # nothing orphaned: stage is pending

    publish_staged(spark, out, "wap1")
    # bit-identical content survives the compaction-then-publish order
    assert _rows(scan_encoded(spark, out, ["url", "text"])) == sorted(
        _rows(a) + _rows(b)
    )


def test_staged_cannot_carry_visible_commits(spark, tmp_path, two_batches):
    out = str(tmp_path / "wap4")
    a, _ = two_batches
    planned = a.withColumn("part_id", F.lit(0))
    with pytest.raises(ValueError, match="staged"):
        encode_with_resume(
            spark, planned, out, CFG, staged=True, retire_part_ids=[7]
        )
    with pytest.raises(ValueError, match="no staged partitions"):
        _ingest(spark, out, a, "base", 0)
        publish_staged(spark, out, "never-staged")
