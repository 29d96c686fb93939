"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (pure JVM-side
higher-order functions — no Python in the hot path), and a random-
hyperplane LSH-bucketed variant as the scale path (candidates only from
matching buckets, exact re-rank inside)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_sim_col(a, b):
    """Cosine similarity between two array<float> columns, JVM-side."""
    return _dot(a, b) / (
        F.greatest(_norm(a) * _norm(b), F.lit(1e-12))
    )


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine vs a fixed query vector.

    Plan shape: a single scan + TakeOrderedAndProject — the per-partition
    top-k is computed map-side, only k rows per partition reach the
    driver-side merge. Scales linearly in rows, no shuffle of the data.
    """
    q = F.array(*[F.lit(float(v)).cast("double") for v in query_vec])
    sim = cosine_sim_col(F.col(vec_col).cast("array<double>"), q)
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_bucket_col(vec_col, planes: np.ndarray):
    """Bucket id = sign-bit string of <v, plane_i>, computed JVM-side."""
    bits = []
    for p in planes:
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(_dot(vec_col, plane) >= 0, F.lit("1")).otherwise(F.lit("0"))
        )
    return F.concat(*bits)


def cosine_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    probe_hamming: int = 1,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: random-hyperplane LSH prefilter + exact re-rank.

    Only rows whose bucket is within ``probe_hamming`` bits of the query
    bucket are scored — at scale this is a partition-pruned scan when the
    table is written bucketed/partitioned by the LSH bucket column.
    """
    planes = _hyperplanes(len(query_vec), n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qbits = "".join("1" if float(p @ qv) >= 0 else "0" for p in planes)
    from itertools import combinations

    def flip(bits: str, positions: tuple[int, ...]) -> str:
        out = list(bits)
        for i in positions:
            out[i] = "0" if out[i] == "1" else "1"
        return "".join(out)

    candidates = {qbits}
    for h in range(1, probe_hamming + 1):
        for pos in combinations(range(n_planes), h):
            candidates.add(flip(qbits, pos))
    vec_d = F.col(vec_col).cast("array<double>")
    bucketed = df.withColumn("_bucket", lsh_bucket_col(vec_d, planes))
    q = F.array(*[F.lit(float(v)).cast("double") for v in query_vec])
    sim = cosine_sim_col(vec_d, q)
    return (
        bucketed.filter(F.col("_bucket").isin(*candidates))
        .select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def knn_join_brute(
    left: DataFrame,
    right: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """k nearest right-rows per left-row (broadcast right, window top-k).

    Right side must be broadcast-sized (an IVF/LSH bucketing replaces
    this at full scale); the cross product never shuffles the left side.
    """
    from pyspark.sql import Window

    l = left.select(
        F.col(id_col).alias("left_id"), F.col(vec_col).alias("_lv")
    )
    r = right.select(
        F.col(id_col).alias("right_id"), F.col(vec_col).alias("_rv")
    )
    sim = cosine_sim_col(
        F.col("_lv").cast("array<double>"), F.col("_rv").cast("array<double>")
    )
    scored = l.join(F.broadcast(r), F.col("left_id") != F.col("right_id")).select(
        "left_id", "right_id", F.round(sim, 6).alias("cosine")
    )
    w = Window.partitionBy("left_id").orderBy(
        F.desc("cosine"), F.col("right_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + probed exact re-rank
# ---------------------------------------------------------------------------


def ivf_train_centroids(
    df: DataFrame,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 10000,
    n_iters: int = 10,
    seed: int = 42,
    total_rows: int | None = None,
) -> np.ndarray:
    """Train the coarse quantizer on a bounded driver-side sample.

    At 10^12 rows the sample stays bounded, the k-means is a few numpy
    matmuls on the driver, and the result broadcasts — the classic IVF
    recipe. Deterministic: fixed seed, fixed iteration count. The sample
    is an unbiased ``df.sample`` (a ``limit`` would take the first
    partitions only — on host/time-sorted input the quantizer would
    train on one corner of the space). Pass ``total_rows`` when known to
    skip the sizing ``count()`` (cheap on parquet/Iceberg — row-group
    metadata only — but a scan on computed inputs)."""
    n_total = total_rows if total_rows is not None else df.count()
    if n_total == 0:
        raise ValueError("ivf_train_centroids: empty input")
    frac = min(1.0, sample_rows * 1.25 / n_total)
    sample = np.array(
        [
            r[0]
            for r in df.select(vec_col)
            .sample(fraction=frac, seed=seed)
            .limit(sample_rows)
            .collect()
        ],
        dtype=np.float64,
    )
    if len(sample) == 0:  # tiny input + sampling variance: take it all
        sample = np.array(
            [r[0] for r in df.select(vec_col).limit(sample_rows).collect()],
            dtype=np.float64,
        )
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    sample = sample / np.maximum(norms, 1e-12)
    # clamp so rng.choice(replace=False) cannot fail on small tables
    n_clusters = min(n_clusters, len(sample))
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=n_clusters, replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(sample @ cent.T, axis=1)  # cosine on unit vecs
        for c in range(n_clusters):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def ivf_anchor_centroids(
    dim: int, n_clusters: int = 8, seed: int = 42
) -> np.ndarray:
    """Fixed seeded anchor centroids (unit-normalized gaussian vectors).

    A data-independent coarse quantizer: same IVF machinery
    (:func:`with_ivf_cluster` assignment + probed re-rank), but the
    anchors are a pure function of (dim, n_clusters, seed) — so an
    external system (e.g. the driver's DuckDB oracle) can reproduce the
    cluster assignment exactly from literals. Prefer
    :func:`ivf_train_centroids` when recall matters and no external
    replication is needed."""
    rng = np.random.default_rng(seed)
    cent = rng.standard_normal((n_clusters, dim)).astype(np.float64)
    return cent / np.maximum(
        np.linalg.norm(cent, axis=1, keepdims=True), 1e-12
    )


def with_ivf_cluster(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "ivf_cluster",
) -> DataFrame:
    """Assign each row to its nearest centroid — one vectorized Arrow
    batch matmul per task, no per-row Python. At scale, write the table
    partitioned/bucketed by this column so probes prune partitions."""
    from pyspark.sql.functions import pandas_udf

    cent = centroids  # closure-captured; broadcast by Spark with the task

    @pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        # argmax over centroid dot products is invariant to row scaling
        # (centroids are unit-normalized), so rows are deliberately NOT
        # normalized: one fewer FP pass, and the arithmetic matches an
        # external raw-dot replication (the driver's DuckDB oracle)
        mat = np.array(vs.tolist(), dtype=np.float64)
        return pd.Series(np.argmax(mat @ cent.T, axis=1).astype(np.int32))

    return df.withColumn(out_col, assign(F.col(vec_col)))


def cosine_topk_ivf(
    df: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k via IVF: score only rows in the ``n_probe`` clusters
    nearest the query, exact cosine re-rank inside."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qn = qv / max(np.linalg.norm(qv), 1e-12)
    probes = np.argsort(-(centroids @ qn))[:n_probe].tolist()
    clustered = with_ivf_cluster(df, centroids, vec_col)
    q = F.array(*[F.lit(float(v)).cast("double") for v in query_vec])
    sim = cosine_sim_col(F.col(vec_col).cast("array<double>"), q)
    return (
        clustered.filter(F.col("ivf_cluster").isin(probes))
        .select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )
