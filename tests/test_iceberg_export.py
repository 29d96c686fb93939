"""Catalog binding (choetl_spark/iceberg_export.py): the export that
makes SURVEY §1.1's "staged table = Iceberg catalog table" mapping
literal. The sandbox ships no iceberg-spark-runtime, so the actual
``writeTo`` commit is exercised only when the jars are present
(skipped here); everything up to it — snapshot resolution, property
payload, the refusal contract — is verified runtime-free, including
that the exported chunk frame + properties are a LOSSLESS description
of the snapshot (decode it back, compare to the source store)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from choetl_spark.engine import EncodeConfig, decode_dataframe
from choetl_spark.iceberg_export import (
    LEDGER_ICEBERG_MAPPING,
    export_properties,
    export_store,
    iceberg_available,
    snapshot_frame,
)
from choetl_spark.ledger import encode_with_resume, read_manifest, scan_encoded
from choetl_spark.synth import webpages


@pytest.fixture()
def store(spark, tmp_path):
    out = str(tmp_path / "store")
    pages = webpages(spark, 400, partitions=4).cache()
    pages.count()
    cfg = EncodeConfig(num_partitions=4, chunk_rows=128, chunk_bytes=1 << 20)
    encode_with_resume(spark, pages, out, cfg, run_id="ingest1")
    yield out, pages
    pages.unpersist()


def test_export_properties_payload(spark, store):
    """Properties carry epoch, schema, manifest and delete flags — a
    reader of the catalog table alone can identify the snapshot."""
    from choetl_spark.eqdeletes import delete_by_key

    out, pages = store
    props = export_properties(spark, out)
    assert props["choetl.source-store"] == out
    assert props["choetl.snapshot-epoch"] == "1"
    assert props["format-version"] == "2"
    schema = json.loads(props["choetl.schema"])
    assert set(schema) == {"url", "warc_ts", "html", "text", "lang"}
    assert json.loads(props["choetl.manifest"]) == read_manifest(out)
    assert props["choetl.has-eq-deletes"] == "false"

    victim = pages.select("url").orderBy("url").first()["url"]
    delete_by_key(spark, out, "url", [victim])
    props2 = export_properties(spark, out)
    assert props2["choetl.snapshot-epoch"] == "2"
    assert props2["choetl.has-eq-deletes"] == "true"
    # pinning as_of freezes the payload at the pre-delete snapshot
    props1 = export_properties(spark, out, as_of=1)
    assert props1["choetl.snapshot-epoch"] == "1"


def test_snapshot_frame_chunks_is_lossless(spark, store):
    """what="chunks" exports the encoded chunk table: decoding the
    exported frame reproduces the store's rows exactly — the catalog
    copy is the store, not a derivative."""
    out, pages = store
    chunks = snapshot_frame(spark, out, what="chunks")
    dec = decode_dataframe(chunks, manifest=read_manifest(out))
    src = {tuple(r) for r in pages.select("url", "text", "lang").collect()}
    got = {tuple(r) for r in dec.select("url", "text", "lang").collect()}
    assert got == src
    # what="data" is the already-decoded consumer shape
    data = snapshot_frame(spark, out, what="data")
    assert {r["url"] for r in data.select("url").collect()} == {
        r["url"] for r in pages.select("url").collect()
    }


def test_export_refuses_loudly_without_runtime(spark, store):
    """No iceberg-spark-runtime on the classpath -> RuntimeError that
    names the fix and the documented mapping, BEFORE any write."""
    out, _pages = store
    if iceberg_available(spark):  # pragma: no cover - jar-present envs
        pytest.skip("Iceberg runtime present; covered by the gated test")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        export_store(spark, out, "lake.db.pages")
    with pytest.raises(ValueError, match="what"):
        export_store(spark, out, "lake.db.pages", what="rows")


def test_mapping_documented_and_consistent():
    """The programmatic correspondence table covers every ledger status
    the store can write (SCALE.md renders the same mapping)."""
    keys = "".join(LEDGER_ICEBERG_MAPPING)
    for status in ("done", "retired", "delete", "eqdelete", "staged"):
        assert status in keys
    scale = open("SCALE.md").read()
    assert "Iceberg" in scale and "snapshot" in scale.lower()


@pytest.mark.skipif(
    "not config.getoption('--run-iceberg', default=False)",
    reason="needs iceberg-spark-runtime jars + a configured catalog",
)
def test_export_roundtrip_with_runtime(spark, store):  # pragma: no cover
    """On a cluster with the runtime: create the table, read it back
    via the catalog, decode, compare. The gated path is the single
    ``writeTo``; everything else is covered above."""
    out, pages = store
    res = export_store(spark, out, "lake.db.pages_export", what="chunks")
    assert res["table"] == "lake.db.pages_export"
    back = spark.read.table("lake.db.pages_export")
    dec = decode_dataframe(back, manifest=read_manifest(out))
    assert dec.count() == pages.count()
