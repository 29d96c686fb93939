"""Driver-side ledger-metadata cache (ledger.commit_meta / the cached
read_ledger): the per-scan metadata questions must cost zero Spark jobs
on a cache hit, and any commit must invalidate the cache (signature =
ledger directory listing — the Iceberg metadata.json-pointer analog)."""

from __future__ import annotations

from choetl_spark.deletes import delete_where, read_delete_positions
from choetl_spark.engine import EncodeConfig
from choetl_spark.ledger import (
    commit_meta,
    encode_with_resume,
    read_ledger,
    scan_encoded,
)
from choetl_spark.synth import webpages


def _ingest(spark, tmp_path, n=300):
    out = str(tmp_path / "store")
    pages = webpages(spark, n, partitions=2)
    cfg = EncodeConfig(
        num_partitions=3, chunk_rows=128, chunk_bytes=1 << 20,
        bloom_columns=("url",),
    )
    encode_with_resume(spark, pages, out, cfg, run_id="ingest1")
    return out, pages


def test_commit_meta_cached_and_invalidated_by_commits(spark, tmp_path):
    out, pages = _ingest(spark, tmp_path)
    m1 = commit_meta(spark, out)
    assert m1["exists"] and m1["has_done"]
    assert m1["delete_seqs"] == [] and m1["eq_commits"] == []
    # cache hit: identical object back, no recompute
    assert commit_meta(spark, out) is m1
    # the cached ledger DataFrame is reused too
    led1 = read_ledger(spark, out)
    assert read_ledger(spark, out) is led1

    # a delete COMMIT must invalidate both caches via the signature
    target = pages.select("url").limit(1).collect()[0][0]
    delete_where(spark, out, equals={"url": target})
    m2 = commit_meta(spark, out)
    assert m2 is not m1
    assert len(m2["delete_seqs"]) == 1
    assert read_ledger(spark, out) is not led1

    # the new snapshot is what readers see
    assert scan_encoded(spark, out, ["url"]).filter(
        f"url = '{target}'"
    ).count() == 0


def test_no_delete_store_skips_tombstone_resolution(spark, tmp_path):
    out, _ = _ingest(spark, tmp_path)
    # no delete commits: readers get None (no positional decode, no
    # anti-join) — and orphan tombstone FILES without a commit row stay
    # invisible through the same early exit
    assert read_delete_positions(spark, out) is None
    import os

    os.makedirs(os.path.join(out, "_deletes"), exist_ok=True)
    assert read_delete_positions(spark, out) is None


def test_as_of_before_first_delete_returns_none(spark, tmp_path):
    out, pages = _ingest(spark, tmp_path)
    pre = commit_meta(spark, out)
    assert pre["delete_seqs"] == []
    target = pages.select("url").limit(1).collect()[0][0]
    info = delete_where(spark, out, equals={"url": target})
    # a snapshot strictly before the delete epoch sees no tombstones
    assert (
        read_delete_positions(spark, out, as_of=info["run_seq"] - 1) is None
    )
    post = read_delete_positions(spark, out)
    assert post is not None and post.count() >= 1
