"""Column rename / drop (schema_evolution.py) — Iceberg-style
metadata-only schema evolution over the encoded store.

Contracts pinned: a rename is visible to every reader (scan, pruned
scan, aggregate pushdown, point lookup) at every epoch without touching
a chunk; further ingests keep writing the same physical key; a dropped
column refuses immediately, and a re-added column with the same name
reads NULL history — the dropped bytes never resurface; rewrites shed
dropped bytes physically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from choetl_spark.engine import EncodeConfig
from choetl_spark.ledger import (
    agg_encoded,
    encode_with_resume,
    read_manifest,
    scan_encoded,
    snapshots,
)
from choetl_spark.schema_evolution import (
    drop_column,
    list_columns,
    rename_column,
)
from choetl_spark.synth import webpages

CFG = EncodeConfig(
    num_partitions=3, chunk_rows=128, bloom_columns=("url",),
    deterministic=True,
)


def _ingest(spark, out, pages, run_id, id_base):
    planned = pages.withColumn(
        "part_id", (F.xxhash64("url") % 3 + 3) % 3 + id_base
    )
    return encode_with_resume(spark, planned, out, CFG, run_id=run_id)


def _store(spark, tmp_path, name="se"):
    out = str(tmp_path / name)
    pages = webpages(spark, 300, partitions=2).cache()
    _ingest(spark, out, pages, "i1", 0)
    return out, pages


def test_rename_is_visible_to_every_reader(spark, tmp_path):
    out, pages = _store(spark, tmp_path)
    truth = sorted(
        (r["url"], r["text"]) for r in pages.select("url", "text").collect()
    )
    probe = truth[7][0]

    rename_column(out, "url", "page_url")

    # plain scan under the new name (current snapshot)
    got = sorted(
        (r["page_url"], r["text"])
        for r in scan_encoded(spark, out, ["page_url", "text"]).collect()
    )
    assert got == truth
    # snapshot-scoped schema: epoch 1 predates the rename, so as_of=1
    # resolves the OLD name (Iceberg snapshots pin their schema)
    assert (
        scan_encoded(spark, out, ["url"], as_of=1).count()
        == pages.count()
    )
    # the old name refuses loudly on the CURRENT snapshot
    with pytest.raises(KeyError, match="url"):
        scan_encoded(spark, out, ["url"]).collect()

    # Bloom/zone-map pruned + kernel-pushdown scan under the new name
    hit = scan_encoded(
        spark, out, ["page_url", "text"], equals={"page_url": probe}
    ).collect()
    assert [(r["page_url"], r["text"]) for r in hit] == [truth[7]]

    # aggregate pushdown under the new name
    agg = agg_encoded(spark, out, {"n": ("count", "page_url")}).collect()[0]
    assert agg["n"] == pages.count()

    # point lookup under the new name
    from choetl_spark.lookup import point_lookup

    got = point_lookup(spark, out, "page_url", probe, ["text"]).collect()
    assert [r["text"] for r in got] == [truth[7][1]]


def test_rename_then_ingest_shares_physical_key(spark, tmp_path):
    out, pages = _store(spark, tmp_path)
    rename_column(out, "url", "page_url")
    more = (
        webpages(spark, 200, partitions=2)
        .withColumn("url", F.concat(F.lit("https://b.example/"), F.col("url")))
        .cache()
    )
    planned = more.withColumn(
        "part_id", (F.xxhash64("url") % 3 + 3) % 3 + 100
    ).withColumnRenamed("url", "page_url")
    encode_with_resume(spark, planned, out, CFG, run_id="i2")

    n = scan_encoded(spark, out, ["page_url"]).count()
    assert n == pages.count() + more.count()
    # still ONE physical key: the manifest maps page_url -> url for both
    # ingests (no second storage column appeared)
    man = read_manifest(out)
    assert man["page_url"]["phys"] == "url"
    assert "url" not in man
    # rename BACK onto the original key drops the alias entirely
    rename_column(out, "page_url", "url")
    assert "phys" not in read_manifest(out)["url"]
    assert scan_encoded(spark, out, ["url"]).count() == n


def test_as_of_resolves_names_against_snapshot_schema(spark, tmp_path):
    """Iceberg snapshots-pin-their-schema (round-3 verdict #6): a
    column renamed AFTER epoch N reads under its old name at as_of=N
    (and the new name refuses there); current reads keep the new name.
    Content must be identical bytes either way."""
    out, pages = _store(spark, tmp_path)  # epoch 1
    truth = sorted(r["url"] for r in pages.select("url").collect())

    rename_column(out, "url", "page_url")
    more = (
        webpages(spark, 120, partitions=2)
        .withColumn(
            "url", F.concat(F.lit("https://b.example/"), F.col("url"))
        )
        .withColumnRenamed("url", "page_url")
        .withColumn("part_id", F.lit(100))
    )
    encode_with_resume(spark, more, out, CFG, run_id="i2")  # epoch 2

    # current snapshot: new name, both ingests
    assert (
        scan_encoded(spark, out, ["page_url"]).count()
        == pages.count() + 120
    )
    # as_of=1: old name, exactly the old bytes
    got = sorted(
        r["url"]
        for r in scan_encoded(spark, out, ["url"], as_of=1).collect()
    )
    assert got == truth
    # the post-rename name does not exist at epoch 1
    with pytest.raises(KeyError, match="page_url"):
        scan_encoded(spark, out, ["page_url"], as_of=1).collect()
    # as_of=2 (after the rename's through_seq): current schema applies
    assert (
        scan_encoded(spark, out, ["page_url"], as_of=2).count()
        == pages.count() + 120
    )


def test_as_of_snapshot_schema_reaches_every_reader(spark, tmp_path):
    """The snapshot-scoped schema is honored by EVERY as_of reader,
    not just scan_encoded: point lookup, aggregate pushdown, and the
    Python data source all resolve the OLD name at the pre-rename
    epoch."""
    from choetl_spark.datasource import register
    from choetl_spark.lookup import point_lookup

    out, pages = _store(spark, tmp_path)  # epoch 1
    probe = pages.select("url").limit(1).collect()[0][0]
    want_text = pages.filter(F.col("url") == probe).collect()[0]["text"]
    n = pages.count()

    rename_column(out, "url", "page_url")

    got = point_lookup(spark, out, "url", probe, ["text"], as_of=1)
    assert [r["text"] for r in got.collect()] == [want_text]
    agg = agg_encoded(
        spark, out, {"n": ("count", "url")}, as_of=1
    ).collect()[0]
    assert agg["n"] == n
    register(spark)
    ds = (
        spark.read.format("choetl").option("as_of", 1).load(out)
    )
    assert "url" in ds.columns and "page_url" not in ds.columns
    assert ds.count() == n
    # current-snapshot datasource read speaks the new name
    ds_now = spark.read.format("choetl").load(out)
    assert "page_url" in ds_now.columns


def test_as_of_reads_dropped_column(spark, tmp_path):
    """A column dropped after epoch N is still readable at as_of=N —
    the snapshot's schema includes it (Iceberg contract); the current
    snapshot keeps refusing it."""
    out, pages = _store(spark, tmp_path)  # epoch 1
    truth = sorted(
        (r["url"], r["lang"])
        for r in pages.select("url", "lang").collect()
    )
    drop_column(out, "lang")
    with pytest.raises(KeyError, match="lang"):
        scan_encoded(spark, out, ["lang"]).collect()
    got = sorted(
        (r["url"], r["lang"])
        for r in scan_encoded(
            spark, out, ["url", "lang"], as_of=1
        ).collect()
    )
    assert got == truth


def test_rollback_and_changelog_after_rename_stay_in_current_schema(
    spark, tmp_path
):
    """Iceberg semantics: rollback_to restores DATA, not schema — after
    a rename, rolling back to a pre-rename snapshot must re-encode
    under the CURRENT name (a naive snapshot-schema read here would
    decode old names against the new manifest and corrupt the
    restore); read_changes likewise speaks the current schema at every
    epoch so its insert/delete halves union."""
    from choetl_spark.deletes import delete_where, rollback_to
    from choetl_spark.ledger import read_changes

    out, pages = _store(spark, tmp_path)  # epoch 1
    truth = sorted(
        (r["url"], r["text"])
        for r in pages.select("url", "text").collect()
    )
    delete_where(spark, out, equals={"lang": "de"})  # epoch 2
    rename_column(out, "url", "page_url")

    rollback_to(spark, out, 1, cfg=CFG)  # undo the delete, post-rename
    got = sorted(
        (r["page_url"], r["text"])
        for r in scan_encoded(
            spark, out, ["page_url", "text"]
        ).collect()
    )
    assert got == truth  # full pre-delete content, CURRENT names

    ch = read_changes(spark, out, from_seq=1, columns=["page_url"])
    assert "page_url" in ch.columns
    # the rollback rewrote tombstoned partitions under fresh ids, so
    # the changelog emits both halves — and they must cancel exactly
    # (the scan(from) + inserts - deletes == scan(to) contract)
    ins = sorted(
        r["page_url"]
        for r in ch.filter(F.col("_change_type") == "insert").collect()
    )
    dels = sorted(
        r["page_url"]
        for r in ch.filter(F.col("_change_type") == "delete").collect()
    )
    assert ins == dels and len(ins) > 0


def test_expire_snapshots_prunes_unreachable_schema_log(spark, tmp_path):
    """Schema-log snapshots below the expiry floor serve no readable
    epoch (as_of under the floor refuses) — expire_snapshots prunes
    them; entries at/above the floor survive and keep resolving."""
    from choetl_spark.ledger import expire_snapshots

    out, pages = _store(spark, tmp_path)  # epoch 1
    rename_column(out, "url", "u2")  # log entry through_seq=1
    more = pages.withColumnRenamed("url", "u2").withColumn(
        "part_id", F.lit(50)
    )
    encode_with_resume(spark, more, out, CFG, run_id="i2")  # epoch 2
    rename_column(out, "u2", "u3")  # log entry through_seq=2
    assert len(read_manifest(out)["_schema_log"]) == 2

    expire_snapshots(spark, out, older_than_seq=2)
    log = read_manifest(out)["_schema_log"]
    assert [s["through_seq"] for s in log] == [2]
    # the surviving entry still resolves epoch 2's schema
    assert scan_encoded(spark, out, ["u2"], as_of=2).count() > 0
    with pytest.raises(ValueError, match="expired"):
        scan_encoded(spark, out, ["url"], as_of=1).collect()


def test_rename_validations(spark, tmp_path):
    out, _ = _store(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        rename_column(out, "url", "text")
    with pytest.raises(ValueError, match="no column"):
        rename_column(out, "nope", "x")
    rename_column(out, "url", "page_url")
    # 'url' is still text's... no: 'url' is page_url's physical key —
    # renaming ANOTHER column onto it must refuse (remap ambiguity)
    with pytest.raises(ValueError, match="physical key"):
        rename_column(out, "lang", "url")
    with pytest.raises(ValueError, match="reserved"):
        rename_column(out, "lang", "_secret")


def test_drop_refuses_and_readd_gets_null_history(spark, tmp_path):
    out, pages = _store(spark, tmp_path)
    drop_column(out, "lang")
    with pytest.raises(KeyError, match="lang"):
        scan_encoded(spark, out, ["lang"]).collect()
    # other columns unaffected
    assert scan_encoded(spark, out, ["url"]).count() == pages.count()
    cols = {c["name"]: c for c in list_columns(out)}
    assert cols["lang"]["dropped"] is True

    # re-add 'lang' in a later ingest: NULL in old partitions, real
    # values in new ones — the dropped bytes never resurface
    more = (
        webpages(spark, 200, partitions=2)
        .withColumn("url", F.concat(F.lit("https://b.example/"), F.col("url")))
        .cache()
    )
    _ingest(spark, out, more, "i2", 100)
    got = scan_encoded(spark, out, ["url", "lang"])
    old = got.filter(~F.col("url").startswith("https://b.example/"))
    new = got.filter(F.col("url").startswith("https://b.example/"))
    assert old.count() == pages.count()
    assert old.filter(F.col("lang").isNotNull()).count() == 0
    assert new.filter(F.col("lang").isNull()).count() == 0
    # the re-added column lives under a FRESH physical key
    assert read_manifest(out)["lang"]["phys"] == "lang#2"

    with pytest.raises(ValueError, match="no column"):
        drop_column(out, "lang2")


def test_rewrite_sheds_dropped_bytes_and_keeps_renames(spark, tmp_path):
    from choetl_spark.clustering import rewrite_clustered
    from choetl_spark.ledger import expire_snapshots, read_encoded

    out, pages = _store(spark, tmp_path)
    truth = sorted(
        (r["url"], r["text"]) for r in pages.select("url", "text").collect()
    )
    drop_column(out, "html")
    rename_column(out, "url", "page_url")

    rewrite_clustered(spark, out, ["page_url"], cfg=CFG)
    latest = max(r["run_seq"] for r in snapshots(spark, out).collect())
    expire_snapshots(spark, out, latest)

    got = sorted(
        (r["page_url"], r["text"])
        for r in scan_encoded(spark, out, ["page_url", "text"]).collect()
    )
    assert got == truth
    # dropped column's chunks are physically gone after rewrite+expiry
    phys_left = {
        r["column"]
        for r in read_encoded(spark, out, raw_columns=True)
        .select("column")
        .distinct()
        .collect()
    }
    assert "html" not in phys_left
    # the rewrite re-encoded under the rename's physical key ('url'),
    # so the alias still resolves
    assert read_manifest(out)["page_url"]["phys"] == "url"


def test_drop_last_column_refuses(spark, tmp_path):
    out, _ = _store(spark, tmp_path)
    for c in ["html", "text", "warc_ts", "lang"]:
        drop_column(out, c)
    with pytest.raises(ValueError, match="last column"):
        drop_column(out, "url")


# ---------------------------------------------------------------------------
# type widening (Iceberg type promotion: int -> wider int, float32 -> float64)
# ---------------------------------------------------------------------------


def _kv_ingest(spark, out, rows, ddl, run_id, part_base):
    df = spark.createDataFrame(rows, ddl).withColumn(
        "part_id", (F.col("k") % 2 + part_base).cast("long")
    )
    cfg = EncodeConfig(key_col="k", chunk_rows=64, deterministic=True)
    return encode_with_resume(spark, df, out, cfg, run_id=run_id)


def test_type_widening_int_and_float(spark, tmp_path):
    out = str(tmp_path / "widen")
    _kv_ingest(
        spark, out,
        [(i, i * 10, float(i)) for i in range(100)],
        "k long, v int, r float", "narrow", 0,
    )
    assert read_manifest(out)["v"]["dtype"] == "int32"
    big = 3_000_000_000  # > int32 range
    _kv_ingest(
        spark, out,
        [(100 + i, big + i, float(i) / 3) for i in range(100)],
        "k long, v long, r double", "wide", 10,
    )
    man = read_manifest(out)
    assert man["v"]["dtype"] == "int64"
    assert man["r"]["dtype"] == "float64"
    got = scan_encoded(spark, out, ["k", "v", "r"])
    assert dict(got.dtypes)["v"] == "bigint"
    assert dict(got.dtypes)["r"] == "double"
    rows = {r["k"]: (r["v"], r["r"]) for r in got.collect()}
    assert len(rows) == 200
    assert rows[7] == (70, pytest.approx(7.0))
    assert rows[150] == (big + 50, pytest.approx(50 / 3, rel=1e-6))
    # predicate over the widened column still prunes/filters correctly
    hit = scan_encoded(spark, out, ["k"], equals={"v": big + 50}).collect()
    assert [r["k"] for r in hit] == [150]
    hit = scan_encoded(spark, out, ["k"], equals={"v": 70}).collect()
    assert [r["k"] for r in hit] == [7]


def test_type_widening_narrower_later_run_keeps_wide(spark, tmp_path):
    out = str(tmp_path / "narrowlater")
    _kv_ingest(
        spark, out, [(i, 2**40 + i) for i in range(50)],
        "k long, v long", "wide", 0,
    )
    _kv_ingest(
        spark, out, [(50 + i, i) for i in range(50)],
        "k long, v int", "narrow", 10,
    )
    assert read_manifest(out)["v"]["dtype"] == "int64"
    got = {r["k"]: r["v"] for r in scan_encoded(spark, out, ["k", "v"]).collect()}
    assert got[3] == 2**40 + 3 and got[60] == 10


def test_type_widening_rejects_unsafe_changes(spark, tmp_path):
    out = str(tmp_path / "unsafe")
    _kv_ingest(
        spark, out, [(i, float(i)) for i in range(20)],
        "k long, v double", "f64", 0,
    )
    with pytest.raises(ValueError, match="safe widening"):
        _kv_ingest(
            spark, out, [(100 + i, i) for i in range(20)],
            "k long, v long", "i64", 10,
        )
    with pytest.raises(ValueError, match="safe widening"):
        _kv_ingest(
            spark, out, [(200 + i, str(i)) for i in range(20)],
            "k long, v string", "str", 20,
        )
