"""Approx-NDV sketches: HLL math, encode-time capture, metadata-only
store estimates (the Iceberg Puffin ANALYZE analog)."""

import numpy as np
import pyarrow as pa
import pytest

from pyspark.sql import SparkSession, functions as F

from choetl_spark.engine import EncodeConfig
from choetl_spark.ledger import encode_with_resume
from choetl_spark.ndv import (
    approx_ndv,
    hll_build,
    hll_estimate,
    hll_merge,
    hll_regs,
)
from choetl_spark.synth import webpages


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("ndv-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s


def test_hll_accuracy_within_rated_error():
    # p=12 -> sigma ~1.04/sqrt(4096) = 1.6%; assert 3 sigma
    for n in (100, 5_000, 50_000, 250_000):
        arr = pa.array([f"https://example.com/{i}" for i in range(n)])
        est = hll_estimate(hll_regs(hll_build(arr)))
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_merge_equals_build_on_union():
    a = pa.array([f"k{i}" for i in range(20_000)])
    b = pa.array([f"k{i}" for i in range(10_000, 30_000)])
    merged = hll_merge(hll_regs(hll_build(a)), hll_regs(hll_build(b)))
    assert np.array_equal(
        merged, hll_regs(hll_build(pa.concat_arrays([a, b])))
    )
    # idempotent (retry-safe): merging the same sketch changes nothing
    assert np.array_equal(merged, hll_merge(merged, hll_regs(hll_build(a))))


def test_hll_value_semantics_match_sql_distinct():
    # -0.0 == 0.0, all NaNs are one value, nulls don't count
    fl = pa.array([0.0, -0.0, 1.5, float("nan"), float("nan"), None])
    assert round(hll_estimate(hll_regs(hll_build(fl)))) == 3
    assert hll_build(pa.array([None] * 7, type=pa.string())) is None
    ts = pa.array(np.arange(5_000) * 1_000_000, type=pa.timestamp("us"))
    est = hll_estimate(hll_regs(hll_build(ts)))
    assert abs(est - 5_000) / 5_000 < 0.05
    with pytest.raises(ValueError, match="different p"):
        hll_merge(np.zeros(4096, np.uint8), np.zeros(2048, np.uint8))


def test_store_approx_ndv_matches_exact(spark, tmp_path):
    out = str(tmp_path / "ndvstore")
    pages = webpages(spark, 4_000, partitions=4)
    encode_with_resume(
        spark,
        pages,
        out,
        EncodeConfig(
            num_partitions=4,
            chunk_rows=512,  # many chunks -> real merging across chunks
            ndv_columns=("url", "lang", "warc_ts"),
        ),
        run_id="n1",
    )
    got = approx_ndv(spark, out, ["url", "lang", "warc_ts"])
    exact = pages.agg(
        F.countDistinct("url").alias("url"),
        F.countDistinct("lang").alias("lang"),
        F.countDistinct("warc_ts").alias("warc_ts"),
    ).collect()[0]
    for c in ("url", "lang", "warc_ts"):
        assert abs(got[c] - exact[c]) / max(exact[c], 1) < 0.05, (
            c,
            got[c],
            exact[c],
        )
    # low-cardinality column is near-exact (linear counting regime)
    assert got["lang"] == exact["lang"]


def test_store_approx_ndv_as_of_and_growth(spark, tmp_path):
    out = str(tmp_path / "ndvgrow")
    first = webpages(spark, 1_000, partitions=2).withColumn(
        "part_id", (F.xxhash64("url") % 2 + 2) % 2
    )
    encode_with_resume(
        spark, first, out,
        EncodeConfig(num_partitions=2, ndv_columns=("url",)),
        run_id="g1",
    )
    from choetl_spark.ledger import snapshots

    epoch1 = max(r["run_seq"] for r in snapshots(spark, out).collect())
    ndv1 = approx_ndv(spark, out, "url")["url"]
    # second ingest: 1000 NEW urls in a fresh part-id range (the
    # epoch-namespacing scheme appends use)
    second = (
        webpages(spark, 1_000, partitions=2)
        .withColumn(
            "url", F.concat(F.lit("https://other.example/"), F.col("url"))
        )
        .withColumn("part_id", (F.xxhash64("url") % 2 + 2) % 2 + 2)
    )
    encode_with_resume(
        spark, second, out,
        EncodeConfig(num_partitions=2, ndv_columns=("url",)),
        run_id="g2",
    )
    ndv2 = approx_ndv(spark, out, "url")["url"]
    assert abs(ndv1 - 1_000) / 1_000 < 0.05
    assert abs(ndv2 - 2_000) / 2_000 < 0.05
    # time travel reads the old sketch set only
    assert approx_ndv(spark, out, "url", as_of=epoch1)["url"] == ndv1


def test_store_without_sketches_refuses(spark, tmp_path):
    out = str(tmp_path / "nondv")
    pages = webpages(spark, 300, partitions=2)
    encode_with_resume(
        spark, pages, out, EncodeConfig(num_partitions=2), run_id="x1"
    )
    with pytest.raises(ValueError, match="without NDV sketches"):
        approx_ndv(spark, out, ["url"])
    # unknown column estimates as 0 rather than crashing the job
    assert approx_ndv(spark, out, [])== {}
