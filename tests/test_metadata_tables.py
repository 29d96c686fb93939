"""Metadata tables over the encoded store (Iceberg ``.partitions`` /
``.files`` analogs): ledger-derived per-partition rollups with delete
debt, and the physical file inventory with clustering evidence — both
metadata-only reads.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from choetl_spark.clustering import rewrite_clustered
from choetl_spark.deletes import delete_matching
from choetl_spark.engine import EncodeConfig
from choetl_spark.ledger import (
    compact_store,
    encode_with_resume,
    store_files,
    store_partitions,
)
from choetl_spark.synth import webpages


def test_store_partitions_rollup_and_delete_debt(spark, tmp_path):
    out = str(tmp_path / "store")
    docs = spark.range(400).select(
        (F.col("id") % 4).alias("part_id"),
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), "id").alias("text"),
    )
    cfg = EncodeConfig(chunk_rows=64, key_col="doc_id")
    encode_with_resume(spark, docs, out, cfg, run_id="i1")

    parts = {r["part_id"]: r for r in store_partitions(spark, out).collect()}
    assert set(parts) == {0, 1, 2, 3}
    for p, r in parts.items():
        assert r["n_rows"] == 100 and r["live_rows"] == 100
        assert r["n_deleted"] == 0 and r["n_columns"] == 2
        assert r["raw_bytes"] > 0 and r["encoded_bytes"] > 0
        assert r["run_seq"] == 1

    # tombstone every doc_id % 10 == 0 -> 10 deletes per partition?
    # no: ids 0,10,20,... spread by id%4 = 0,2,0,2... -> per-part counts
    victims = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    delete_matching(spark, out, "doc_id", victims)
    want_del = {
        r["part_id"]: r["n"]
        for r in docs.filter(F.col("doc_id") % 10 == 0)
        .groupBy("part_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    parts = {r["part_id"]: r for r in store_partitions(spark, out).collect()}
    for p, r in parts.items():
        assert r["n_deleted"] == want_del.get(p, 0)
        assert r["live_rows"] == 100 - want_del.get(p, 0)
    # pre-delete epoch: no debt
    parts1 = {
        r["part_id"]: r
        for r in store_partitions(spark, out, as_of=1).collect()
    }
    assert all(r["n_deleted"] == 0 for r in parts1.values())


def test_store_partitions_tracks_clustering_rewrite(spark, tmp_path):
    out = str(tmp_path / "store")
    pages = webpages(spark, 400, partitions=4)
    cfg = EncodeConfig(num_partitions=4, chunk_rows=128,
                       bloom_columns=("url",))
    encode_with_resume(spark, pages, out, cfg, run_id="i1")
    before = {r["part_id"] for r in store_partitions(spark, out).collect()}
    rewrite_clustered(spark, out, ["url"], cfg=cfg)
    after = store_partitions(spark, out).collect()
    assert {r["part_id"] for r in after}.isdisjoint(before)
    assert sum(r["live_rows"] for r in after) == 400
    # the pre-rewrite epoch still lists the old partitions
    old = store_partitions(spark, out, as_of=1).collect()
    assert {r["part_id"] for r in old} == before


def test_store_files_inventory_and_compaction_signal(spark, tmp_path):
    out = str(tmp_path / "store")
    pages = webpages(spark, 600, partitions=4)
    cfg = EncodeConfig(num_partitions=6, chunk_rows=128,
                       bloom_columns=("url",))
    encode_with_resume(spark, pages, out, cfg, run_id="i1")

    files = store_files(spark, out).collect()
    listing = [
        f for f in os.listdir(os.path.join(out, "chunks"))
        if f.endswith(".parquet")
    ]
    assert {r["file"] for r in files} == set(listing)
    assert all(r["size_bytes"] > 0 for r in files)
    chunk_rows = spark.read.parquet(os.path.join(out, "chunks")).count()
    assert sum(r["n_chunk_rows"] for r in files) == chunk_rows
    assert all(
        r["part_id_min"] <= r["part_id_max"]
        for r in files if r["n_chunk_rows"] > 0
    )

    # compaction rewrites into fewer, range-clustered files: the
    # inventory reflects it and the totals are conserved
    compact_store(spark, out, target_file_bytes=1 << 30)
    files2 = store_files(spark, out).collect()
    assert len(files2) < len(files)
    assert sum(r["n_chunk_rows"] for r in files2) == chunk_rows
