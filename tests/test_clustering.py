"""Clustering rewrite (choetl_spark/clustering.py — the Iceberg
rewrite_data_files sort/zorder action).

Invariants: the rewrite changes LAYOUT only (latest scan bit-identical,
tombstones materialized, time travel to pre-rewrite epochs intact), and
it changes layout USEFULLY — after sort-clustering on url, a url-range
zone-map prune keeps strictly fewer chunk-metadata rows than before;
after z-ordering on (warc_ts, url), range prunes on BOTH dimensions
are effective.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from choetl_spark.clustering import rewrite_clustered, zorder_column
from choetl_spark.deletes import delete_where
from choetl_spark.engine import (
    EncodeConfig,
    prune_partitions_by_stats,
)
from choetl_spark.ledger import (
    encode_with_resume,
    read_encoded,
    scan_encoded,
)
from choetl_spark.synth import webpages


def _pairs(df):
    return {(r["url"], r["text"]) for r in df.select("url", "text").collect()}


@pytest.fixture(scope="module")
def cstore(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cluster") / "store")
    pages = webpages(spark, 1200, partitions=4).cache()
    pages.count()
    cfg = EncodeConfig(
        num_partitions=6, chunk_rows=64, chunk_bytes=1 << 20,
        bloom_columns=("url",),
    )
    encode_with_resume(spark, pages, out, cfg, run_id="ingest1")
    yield out, pages, cfg
    pages.unpersist()


def test_sort_clustering_tightens_zone_maps(spark, cstore):
    out, pages, cfg = cstore
    want = _pairs(pages)
    urls = sorted(r["url"] for r in pages.select("url").collect())
    lo, hi = urls[100], urls[160]

    def url_chunks():
        enc = read_encoded(spark, out).filter(F.col("column") == "url")
        return (
            enc.count(),
            prune_partitions_by_stats(enc, "url", lo, hi).count(),
        )

    total_before, kept_before = url_chunks()
    # host-hashed layout: every partition spans ~the whole url domain,
    # so the zone maps keep (almost) everything
    assert kept_before > 0.5 * total_before

    res = rewrite_clustered(spark, out, ["url"], cfg=cfg)
    assert res["partitions_rewritten"] == 6

    # layout only: latest content identical, range scan exact
    assert _pairs(scan_encoded(spark, out, ["url", "text"])) == want
    got = {
        r["url"]
        for r in scan_encoded(
            spark, out, ["url"], ranges={"url": (lo, hi)}
        ).collect()
    }
    assert got == set(urls[100:161])
    # ... and the prune is now sharp: the range covers ~5% of rows, so
    # the clustered zone maps drop most chunk rows
    total_after, kept_after = url_chunks()
    assert kept_after < 0.35 * total_after
    assert kept_after / total_after < kept_before / total_before
    # time travel: the pre-rewrite epoch still reads (retired copies)
    assert _pairs(scan_encoded(spark, out, ["url", "text"], as_of=1)) == want


def test_clustering_materializes_tombstones(spark, tmp_path):
    out = str(tmp_path / "store")
    pages = webpages(spark, 500, partitions=4).cache()
    pages.count()
    cfg = EncodeConfig(num_partitions=4, chunk_rows=128,
                       bloom_columns=("url",))
    encode_with_resume(spark, pages, out, cfg, run_id="i1")
    delete_where(spark, out, equals={"lang": "de"})
    kept = _pairs(pages.filter(F.col("lang") != "de"))

    rewrite_clustered(spark, out, ["url"], cfg=cfg)
    assert _pairs(scan_encoded(spark, out, ["url", "text"])) == kept
    # pre-delete epoch unaffected (tombstones stay: time travel to the
    # post-delete/pre-rewrite epoch still needs them)
    assert _pairs(
        scan_encoded(spark, out, ["url", "text"], as_of=1)
    ) == _pairs(pages)
    assert _pairs(scan_encoded(spark, out, ["url", "text"], as_of=2)) == kept
    # expiring history at the rewrite epoch reclaims the dead tombstones
    # -> the scan plan loses the positional anti-join (merge-on-read tax
    # gone for the clustered store)
    from choetl_spark.ledger import expire_snapshots
    from choetl_spark.plans import explain_str

    expire_snapshots(spark, out, older_than_seq=3)
    assert _pairs(scan_encoded(spark, out, ["url", "text"])) == kept
    plan = explain_str(scan_encoded(spark, out, ["url", "text"]), "simple")
    assert "_row_pos" not in plan
    pages.unpersist()


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    out = str(tmp_path / "store")
    pages = webpages(spark, 1600, partitions=4).cache()
    pages.count()
    cfg = EncodeConfig(num_partitions=16, chunk_rows=64,
                       bloom_columns=("url",))
    encode_with_resume(spark, pages, out, cfg, run_id="i1")
    want = _pairs(pages)

    urls = sorted(r["url"] for r in pages.select("url").collect())
    tss = sorted(r["warc_ts"] for r in pages.select("warc_ts").collect())

    def kept_fraction(col, lo, hi):
        enc = read_encoded(spark, out).filter(F.col("column") == col)
        return (
            prune_partitions_by_stats(enc, col, lo, hi).count()
            / enc.count()
        )

    # linear sort on warc_ts: its own zone maps get sharp, but
    # consecutive timestamps cycle through every host, so url zone
    # maps span the whole domain — the single-axis limitation
    rewrite_clustered(spark, out, ["warc_ts"], cfg=cfg)
    f_ts_lin = kept_fraction("warc_ts", tss[0], tss[159])
    f_url_lin = kept_fraction("url", urls[0], urls[159])
    assert f_ts_lin < 0.25 and f_url_lin > 0.9, (f_ts_lin, f_url_lin)

    # z-order on (warc_ts, url) — re-clustering the clustered store —
    # trades a little warc_ts sharpness for url pruning on the SAME
    # layout: both axes now prune
    res = rewrite_clustered(
        spark, out, ["warc_ts", "url"], cfg=cfg, zorder=True
    )
    assert res["zorder"] and res["partitions_after"] == 16
    assert _pairs(scan_encoded(spark, out, ["url", "text"])) == want
    f_ts = kept_fraction("warc_ts", tss[0], tss[159])
    f_url = kept_fraction("url", urls[0], urls[159])
    assert f_ts < 0.5 and f_url < 0.85, (f_ts, f_url)
    assert f_url < f_url_lin
    # and both selective scans stay exact
    got = {
        r["url"]
        for r in scan_encoded(
            spark, out, ["url"], ranges={"url": (urls[0], urls[159])}
        ).collect()
    }
    assert got == set(urls[:160])
    got_ts = scan_encoded(
        spark, out, ["url"], ranges={"warc_ts": (tss[0], tss[159])}
    ).count()
    assert got_ts == 160
    pages.unpersist()


def test_zorder_column_unit():
    """Morton-key unit pin: interleave of small known buckets."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3)], "a long, b long"
    )
    z = df.select(
        zorder_column([F.col("a"), F.col("b")], bits=2).alias("z")
    ).collect()
    # bit i of a -> 2i+1, bit i of b -> 2i
    assert [r["z"] for r in z] == [0, 2, 1, 15]


def test_rewrite_clustered_validations(spark, cstore):
    out, _, cfg = cstore
    with pytest.raises(ValueError, match="zorder takes 2-4"):
        rewrite_clustered(spark, out, ["url"], cfg=cfg, zorder=True)
    with pytest.raises(KeyError, match="not in encoded store"):
        rewrite_clustered(spark, out, ["nope"], cfg=cfg)
