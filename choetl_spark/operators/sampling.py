"""Deterministic sampling / mixing operators for training-data
pipelines: per-source mixture downsampling, hash-based train/val/test
splits, and per-domain page quotas. A mixture rebuild over 100 TB must
be REPRODUCIBLE (same rows in, same rows out, on any cluster layout and
after any resume) — so none of these use ``rand()``; every decision is
a pure function of the row's id through an integer hash expressible
identically in Spark and DuckDB (the oracle recomputes it op-for-op).

The hash is a bounded Knuth multiplicative hash::

    bucket(id) = pmod(pmod(id, 1000003) * 2654435761 + seed, 1000003)

``1000003`` is prime (so the multiplicative step permutes the residues)
and small enough that the product stays far inside int64 in BOTH
engines — DuckDB raises on BIGINT overflow while Spark wraps silently,
so an unbounded ``id * K`` hash would diverge cross-engine exactly when
it overflows. ``pmod`` (floor-mod, always non-negative) rather than
``%``, because Spark/DuckDB ``%`` follows the dividend's sign: ids are
often signed 64-bit hashes (``xxhash64(url)``), and a truncating inner
mod would put every negative id in a negative bucket — below every
threshold, i.e. kept at ANY rate. The SQL mirror is
``((id % M + M) % M * K + seed) % M`` (inner pmod makes the outer
operand non-negative, so plain ``%`` suffices there). Buckets are
compared against ``rate * 1000003``; the realized rate converges on the
requested one at corpus scale (error O(1/1000003) from threshold
rounding).

Scale shapes (100 TB):
  - :func:`sample_mixture` / :func:`with_split` — pure codegen'd maps,
    zero shuffle; the mixture-rate dict rides the plan as literals.
  - :func:`cap_per_domain` — one shuffle on the domain key, with
    Catalyst's rank-limit pushdown (WindowGroupLimit) bounding each
    task's contribution to ``k`` rows per domain BEFORE the exchange,
    so at most ``k × n_partitions`` rows per domain cross the wire
    instead of every page of a mega-domain (the skew killer for
    host-level quotas).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_MOD = 1000003  # prime; (id % _MOD) * _KNUTH fits comfortably in int64
_KNUTH = 2654435761


def _bucket(id_col: Column, seed: int) -> Column:
    """Deterministic bucket in [0, _MOD) for ANY int64 id (negative
    included) — see module docstring for the cross-engine contract."""
    return F.pmod(
        F.pmod(id_col, F.lit(_MOD)) * F.lit(_KNUTH) + F.lit(int(seed)),
        F.lit(_MOD),
    )


def sample_mixture(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-source downsampling — the "mixture" step that
    turns raw curated pools into a training mix (e.g. keep 100% of
    wiki, 30% of web, 5% of logs). A row survives iff its id-hash
    bucket falls under its source's rate; sources absent from ``rates``
    get ``default_rate``. Pure map, zero shuffle, reproducible: the
    same (id, seed) keeps or drops the row on every run, cluster, and
    resume — and re-running with a RAISED rate keeps a superset of the
    previous sample (buckets are fixed; only the threshold moves),
    which is what an iterative mixture search needs."""
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(
            f"default_rate must be in [0,1], got {default_rate}"
        )
    thresh = F.lit(float(default_rate) * _MOD)
    for src, rate in sorted(rates.items()):
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {src!r} must be in [0,1], got {rate}")
        thresh = F.when(
            F.col(source_col) == src, F.lit(float(rate) * _MOD)
        ).otherwise(thresh)
    return df.filter(_bucket(F.col(id_col), seed) < thresh)


def with_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_frac: float = 0.01,
    test_frac: float = 0.0,
    seed: int = 17,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by id hash: the first
    ``val_frac`` of bucket space is ``'val'``, the next ``test_frac``
    is ``'test'``, the rest ``'train'``. Membership is a pure function
    of (id, seed) — a document never migrates between splits when the
    corpus grows or the job reruns, the property random splits lose."""
    if val_frac + test_frac > 1.0:
        raise ValueError("val_frac + test_frac must be <= 1")
    b = _bucket(F.col(id_col), seed)
    split = (
        F.when(b < F.lit(val_frac * _MOD), F.lit("val"))
        .when(b < F.lit((val_frac + test_frac) * _MOD), F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn(out_col, split)


def cap_per_domain(
    df: DataFrame,
    k: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    order_col: str | None = None,
) -> DataFrame:
    """Per-registered-domain page quota: keep at most ``k`` pages per
    domain, preferring high ``order_col`` (e.g. a quality score), ties
    broken by ``id_col`` ascending so the result is deterministic.

    One declarative window — Catalyst's rank-limit pushdown
    (``WindowGroupLimit``, SPARK-37099) turns the
    ``row_number() <= k`` filter into a map-side partial top-k BEFORE
    the exchange, so a mega-domain ships at most ``k`` rows per input
    partition instead of every page melting one reducer (the plan
    guard pins the ``Partial`` group-limit below the single shuffle;
    hand-rolling a two-phase prefilter here measured strictly worse —
    it adds a second exchange).

    Adds ``registered_domain`` (only — pre-existing scheme/host/port/
    path/query metadata columns on the input are left untouched);
    drops the rank column."""
    from choetl_spark.operators.weburl import _parts

    order = (
        [F.col(order_col).desc(), F.col(id_col).asc()]
        if order_col is not None
        else [F.col(id_col).asc()]
    )
    parts = df.withColumn(
        "registered_domain", _parts(F.col(url_col))["registered_domain"]
    )
    final = Window.partitionBy("registered_domain").orderBy(*order)
    return (
        parts.withColumn("_r", F.row_number().over(final))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )
