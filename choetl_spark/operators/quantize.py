"""Embedding quantization: symmetric per-vector int8 (or int4/int16)
quantization of ``array<float>`` embedding columns, plus similarity
search directly over the quantized vectors.

Why this exists at 100 TB: a 10^12-row corpus with 768-dim float32
embeddings is ~3 PB of vector data; every near-dup pass, ANN probe, and
clustering step shuffles slices of it. Symmetric int8 cuts that 4x
(int4 8x) with ~1e-2 cosine error — the standard first rung of the
vector-storage ladder (IVF/PQ being the next). Everything here is
JVM-side higher-order functions (``transform``/``zip_with``/
``aggregate`` — whole-stage codegen, no Python in the hot path), and
deliberately SQL-expressible so the driver oracle can recompute the
quantizer bit-for-bit in DuckDB.

Scale shapes:
  - :func:`with_quantized_embedding` — pure map, zero shuffle; compose
    with the encode engine (int arrays flatten to bitpack/foref chunks)
    or write as parquet int8.
  - :func:`cosine_topk_quantized` — scan + TakeOrderedAndProject, no
    shuffle of vector data; the integer dot product runs on 4x fewer
    bytes than the float path of ``cosine_topk``.
  - Scales cancel in cosine, so ranking needs only the int vectors;
    the per-vector ``qscale`` column exists to dequantize (dot
    products, centroids) and rides along as one double.

Reference analog: ChoETL's converter pipeline (value -> typed cell via
pluggable converters, `/root/reference/src/ChoETL/Common/Converters`
surface) — here the "converter" is a vector codec chosen for the
downstream query, not a scalar format.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "with_quantized_embedding",
    "with_dequantized_embedding",
    "cosine_topk_quantized",
    "quantize_vec",
]

# guards the all-zero vector: scale stays positive, quantized form is
# exactly zero, dequantize returns exact zeros
_EPS = 1e-30


def quantize_vec(vec_col, bits: int = 8) -> tuple[Column, Column]:
    """(qvec, qscale) expressions for a symmetric ``bits``-bit
    quantization of ``vec_col``: qscale = max|x| / (2^(bits-1) - 1),
    qvec[i] = round(x[i] / qscale) — integers in [-(2^(bits-1)-1),
    2^(bits-1)-1]."""
    if not 2 <= bits <= 16:
        raise ValueError(f"bits must be in [2, 16], got {bits}")
    vmax = float(2 ** (bits - 1) - 1)
    v = F.transform(vec_col, lambda x: x.cast("double"))
    scale = (
        F.greatest(F.array_max(F.transform(v, F.abs)), F.lit(_EPS))
        / F.lit(vmax)
    )
    # narrowest integer type that holds the symmetric range: tinyint
    # for <=8 bits, smallint for <=16 — so the store's veclist codec
    # writes 1 (or 2) bytes per value instead of 4
    itype = "tinyint" if bits <= 8 else "smallint"
    qvec = F.transform(v, lambda x: F.round(x / scale).cast(itype))
    return qvec, scale


def with_quantized_embedding(
    df: DataFrame,
    vec_col: str = "embedding",
    bits: int = 8,
    qvec_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Add ``qvec`` (array<int>, values within the ``bits``-bit
    symmetric range) and ``qscale`` (double) columns. Pure map."""
    qvec, scale = quantize_vec(F.col(vec_col), bits)
    return df.withColumn(scale_col, scale).withColumn(qvec_col, qvec)


def with_dequantized_embedding(
    df: DataFrame,
    qvec_col: str = "qvec",
    scale_col: str = "qscale",
    out_col: str = "embedding_dq",
) -> DataFrame:
    """Reconstruct ``x ~= qvec[i] * qscale`` (max abs error qscale/2)."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(qvec_col), lambda q: q.cast("double") * F.col(scale_col)
        ),
    )


def _int_dot(a, b) -> Column:
    """Exact integer dot product of two int arrays (long accumulator:
    int16 x int16 x 2^15 dims still fits with 2^19 headroom)."""
    return F.aggregate(
        # cast BEFORE multiplying: tinyint*tinyint stays tinyint in
        # Spark and 127*127 would wrap
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_topk_quantized(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Top-``k`` by cosine computed over ``bits``-bit quantized vectors
    (both sides quantized — the ranking a quantized store can answer
    without touching float data). Returns ``(id_col, cosine_q)`` with
    the score rounded to 4 decimals, ordered score desc / id asc.

    Zero-norm rows (all-zero quantized vector) are dropped, matching
    :func:`~choetl_spark.operators.similarity.cosine_topk`'s convention
    that cosine is undefined there.
    """
    qq, _ = quantize_vec(F.array(*[F.lit(float(x)) for x in query_vec]), bits)
    qv, _ = quantize_vec(F.col(vec_col), bits)
    d = df.select(F.col(id_col), qv.alias("_q")).withColumn("_qq", qq)
    dot = _int_dot(F.col("_q"), F.col("_qq"))
    n_a = _int_dot(F.col("_q"), F.col("_q"))
    n_b = _int_dot(F.col("_qq"), F.col("_qq"))
    scored = (
        d.withColumn(
            "_den", F.sqrt(n_a.cast("double")) * F.sqrt(n_b.cast("double"))
        )
        .filter(F.col("_den") > 0)
        .select(
            id_col,
            F.round(dot.cast("double") / F.col("_den"), 4).alias("cosine_q"),
        )
    )
    return scored.orderBy(F.desc("cosine_q"), F.asc(id_col)).limit(k)
