"""Deduplication operators for large-scale training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram Jaccard near-dup — each designed
for the 100 TB shape: candidate generation via hash-bucket joins (never a
full cross join), vectorized signature computation (Arrow-batched numpy,
no per-row Python), verification only on bucket-collision pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact duplicate group.

    hash-groupBy shape: one shuffle on the dedup key; min-id chosen with a
    window (AQE handles skewed duplicate groups)."""
    w = Window.partitionBy(*cols).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_exact_normalized(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Exact dedup on md5 of whitespace/case-normalized text."""
    norm = F.md5(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    )
    return dedup_exact(df.withColumn("_fp", norm), ["_fp"], id_col).drop("_fp")


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(n_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    return a, b


def _rolling_hashes(text: str, k: int) -> np.ndarray:
    """In-order k-byte rolling hashes of a text, vectorized:
    hash[i] = sum_j a[i+j] * P^(k-1-j) mod 2^64."""
    raw = text.encode("utf-8", "ignore")
    if len(raw) < k:
        raw = raw + b" " * (k - len(raw))
    a = np.frombuffer(raw, dtype=np.uint8)
    P = 1099511628211
    powers = np.array(
        [pow(P, k - 1 - j, 1 << 64) for j in range(k)], dtype=np.uint64
    )
    windows = np.lib.stride_tricks.sliding_window_view(a, k).astype(np.uint64)
    return (windows * powers).sum(axis=1, dtype=np.uint64)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-byte shingle hashes of a text, vectorized."""
    return np.unique(_rolling_hashes(text, k))


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """id + minhash signature (array<long>) via Arrow-batched pandas UDF."""
    a_params, b_params = _minhash_params(n_hashes, seed)

    def compute(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sigs = []
            for text in pdf[text_col].astype(str):
                sh = _shingle_hashes(text, shingle_k).astype(np.int64)
                sh = (sh % _MERSENNE).astype(np.int64)
                # (a*x + b) mod p for all hash fns x all shingles
                vals = (
                    sh[None, :].astype(np.uint64)
                    * a_params[:, None].astype(np.uint64)
                    + b_params[:, None].astype(np.uint64)
                ) % np.uint64(_MERSENNE)
                sigs.append(vals.min(axis=1).astype(np.int64))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "signature": [s.tolist() for s in sigs]}
            )

    out_schema = f"{id_col} long, signature array<long>"
    return df.select(id_col, text_col).mapInPandas(compute, out_schema)


def minhash_lsh_pairs(
    sigs: DataFrame,
    id_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """Candidate pairs via banding, verified by signature-level Jaccard.

    Scale shape: explode to (band_id, band_hash) → shuffle groups only
    bucket collisions; the quadratic blowup is bounded per bucket, never
    global. Returns (id_a, id_b, sim) with id_a < id_b and sim >= threshold.
    """
    rows_per_band = n_hashes // bands
    banded = sigs.select(
        F.col(id_col),
        F.col("signature"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(
                        F.col("signature"),
                        b * rows_per_band + 1,
                        rows_per_band,
                    ).cast("string")
                ),
            )
        ).alias("band", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda e: e,
            )
        )
        / F.lit(n_hashes)
    ).alias("sim")
    return (
        pairs.select("id_a", "id_b", sim)
        .filter(F.col("sim") >= threshold)
    )


def dedup_minhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """Drop near-duplicates, keeping the lowest id of each near-dup group.

    Group resolution: min-id propagation over the candidate-pair graph
    (iterated to a fixpoint — near-dup components are tiny, so 3-4
    broadcast-sized iterations; the classic large-star/small-star trick
    at extreme scale would slot in here unchanged).
    """
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k)
    pairs = minhash_lsh_pairs(sigs, id_col, n_hashes, bands, threshold)
    # iterative min-id propagation: lineage MUST be truncated per round
    # (localCheckpoint) or the logical plan grows 3^k and kills the driver
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
        .withColumn("root", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(5):
        via = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), F.col("root"))
            .union(
                edges.join(labels, edges.dst == labels.node).select(
                    F.col("src").alias("node"), F.col("root")
                )
            )
            .union(labels.select("node", "root"))
        )
        new_labels = (
            via.groupBy("node").agg(F.min("root").alias("root")).localCheckpoint()
        )
        changed = (
            new_labels.join(labels, "node")
            .filter(new_labels.root != labels.root)
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    losers = labels.filter(F.col("node") != F.col("root")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, shingle_k: int = 4
) -> DataFrame:
    """64-bit SimHash per doc over character-shingle hashes, vectorized
    (bit voting across all shingles in one 2D numpy op per doc)."""

    def compute(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(64, dtype=np.uint64)
        for pdf in it:
            out = np.zeros(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf[text_col].astype(str)):
                hs = _shingle_hashes(text.lower(), shingle_k)
                if len(hs) == 0:
                    continue
                bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
                votes = (2 * bits - 1).sum(axis=0)
                sh = ((votes > 0).astype(np.uint64) << shifts).sum(
                    dtype=np.uint64
                )
                out[i] = int(sh.astype(np.int64))  # wrap to signed
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return df.select(id_col, text_col).mapInPandas(
        compute, f"{id_col} long, simhash long"
    )


def simhash_near_pairs(
    sigs: DataFrame, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Candidates via 4x16-bit band buckets, verified by popcount.

    With <= 3 differing bits, at least one 16-bit quarter is identical
    (pigeonhole), so banding finds all true pairs."""
    banded = sigs.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for i in range(4)
                ]
            )
        ).alias("band", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return pairs.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# n-gram jaccard (verification-grade similarity on candidate pairs)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard for given (id_a, id_b) candidate pairs."""
    grams = df.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.size(F.split(F.col(text_col), r"\s+")) - n, F.lit(0)
                    ),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(F.split(F.col(text_col), r"\s+"), i + 1, n)
                ),
            )
        ).alias("grams"),
    )
    ga = grams.select(F.col(id_col).alias("id_a"), F.col("grams").alias("g_a"))
    gb = grams.select(F.col(id_col).alias("id_b"), F.col("grams").alias("g_b"))
    joined = pairs.join(ga, "id_a").join(gb, "id_b")
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.size(F.array_union("g_a", "g_b"))
    return joined.select(
        "id_a",
        "id_b",
        F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_lsh: bool = False,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold, id_a < id_b.

    Default is the exact broadcast pair join (right side broadcast, left
    never shuffles) — correct and fine when one side fits in memory. With
    ``use_lsh`` the self-join runs per LSH bucket (random-hyperplane
    sign bits), bounding the quadratic term per bucket — the 100 TB
    shape; it can miss pairs whose vectors straddle a hyperplane.
    """
    from choetl_spark.operators.similarity import cosine_sim_col, lsh_bucket_col, _hyperplanes

    vec_d = F.col(vec_col).cast("array<double>")
    base = df.select(F.col(id_col), vec_d.alias("_v"))
    if use_lsh:
        planes = _hyperplanes(
            len(df.select(vec_col).first()[0]), n_planes, seed
        )
        base = base.withColumn("_bucket", lsh_bucket_col(F.col("_v"), planes))
        a = base.alias("a")
        b = base.alias("b")
        cond = (F.col("a._bucket") == F.col("b._bucket")) & (
            F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        )
        joined = a.join(b, cond)
    else:
        a = base.alias("a")
        b = base.alias("b")
        joined = a.join(
            F.broadcast(b), F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        )
    sim = cosine_sim_col(F.col("a._v"), F.col("b._v"))
    return (
        joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(sim, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def dedup_embedding_cosine(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    **pair_kw,
) -> DataFrame:
    """Drop rows near-duplicate (by cosine) of a lower-id row."""
    pairs = embedding_neardup_pairs(
        df, threshold, vec_col=vec_col, id_col=id_col, **pair_kw
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")
