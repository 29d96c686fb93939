"""Quantile digests: per-chunk math, merge error bound, encode-time
capture, and metadata-only store percentiles (the other half of the
ANALYZE stats next to approx-NDV)."""

import numpy as np
import pyarrow as pa
import pytest

from pyspark.sql import SparkSession, functions as F

from choetl_spark.engine import EncodeConfig
from choetl_spark.ledger import encode_with_resume
from choetl_spark.quantiles import (
    approx_quantile,
    qdigest_build,
    qdigest_merge_compress,
    qdigest_quantile,
)
from choetl_spark.synth import webpages


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("quantile-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s


def _rank_err(vals: np.ndarray, est: float, q: float) -> float:
    return abs(np.searchsorted(np.sort(vals), est) / len(vals) - q)


def test_qdigest_single_chunk_exactish():
    rng = np.random.default_rng(7)
    v = rng.lognormal(0, 2, size=5_000)
    d = qdigest_build(pa.array(v))
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        (est,) = qdigest_quantile(d, [q])
        assert _rank_err(v, est, q) < 0.02, q


def test_qdigest_merge_rank_error_bound():
    """Two-level merge (chunks -> task digest -> final) stays inside
    ~1 % rank error on a skewed distribution split across many
    differently-sized chunks."""
    rng = np.random.default_rng(11)
    all_vals = []
    task_digests = []
    for t in range(8):
        chunk_digests = []
        for c in range(rng.integers(3, 9)):
            n = int(rng.integers(200, 3_000))
            v = rng.lognormal(1.0, 1.5, size=n) * (t + 1)
            all_vals.append(v)
            chunk_digests.append(qdigest_build(pa.array(v)))
        task_digests.append(qdigest_merge_compress(chunk_digests))
    final = qdigest_merge_compress(task_digests)
    v = np.concatenate(all_vals)
    for q in (0.05, 0.5, 0.9, 0.99):
        (est,) = qdigest_quantile(final, [q])
        assert _rank_err(v, est, q) < 0.012, q


def test_qdigest_types_and_nulls():
    assert qdigest_build(pa.array([None] * 5, type=pa.float64())) is None
    ts = pa.array(
        np.arange(1_000) * 60_000_000, type=pa.timestamp("us")
    )
    d = qdigest_build(ts)
    (med,) = qdigest_quantile(d, [0.5])
    assert abs(med - 499.5 * 60_000_000) < 2 * 60_000_000
    bools = pa.array([True] * 30 + [False] * 70)
    (q80,) = qdigest_quantile(qdigest_build(bools), [0.8])
    assert 0.0 <= q80 <= 1.0
    with pytest.raises(TypeError):
        qdigest_build(pa.array(["a", "b"]))


def test_store_approx_quantile_matches_exact(spark, tmp_path):
    out = str(tmp_path / "qstore")
    pages = webpages(spark, 4_000, partitions=4)
    pages = pages.withColumn("n_bytes", F.length("html").cast("long"))
    encode_with_resume(
        spark,
        pages,
        out,
        EncodeConfig(
            num_partitions=4,
            chunk_rows=512,  # many chunks -> real cross-chunk merging
            quantile_columns=("n_bytes", "warc_ts"),
        ),
        run_id="q1",
    )
    probs = [0.1, 0.5, 0.9]
    got = approx_quantile(spark, out, ["n_bytes", "warc_ts"], probs)
    vals = np.array(
        [r["n_bytes"] for r in pages.select("n_bytes").collect()],
        dtype=np.float64,
    )
    for q, est in zip(probs, got["n_bytes"]):
        assert _rank_err(vals, est, q) < 0.02, (q, est)
    # timestamps come back as epoch micros in digest encoding
    ts_med = got["warc_ts"][1]
    exact_med = pages.agg(
        F.expr("percentile(cast(warc_ts as long), 0.5)")
    ).collect()[0][0]
    span = pages.agg(
        F.expr("max(cast(warc_ts as long)) - min(cast(warc_ts as long))")
    ).collect()[0][0]
    assert abs(ts_med - float(exact_med) * 1e6) <= 0.02 * float(span) * 1e6


def test_store_without_digests_refuses(spark, tmp_path):
    out = str(tmp_path / "qstore_none")
    pages = webpages(spark, 500, partitions=2)
    encode_with_resume(
        spark, pages, out,
        EncodeConfig(num_partitions=2, chunk_rows=256),
        run_id="q2",
    )
    with pytest.raises(ValueError, match="without quantile digests"):
        approx_quantile(spark, out, ["warc_ts"], [0.5])
