"""DSIR-style data selection: hashed-n-gram importance weighting.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023 —
public paper): estimate how target-like each raw document is with two
bag-of-hashed-n-grams unigram models and weight by the log-likelihood
ratio::

    log w(x) = (1/|grams(x)|) * sum_{g in grams(x)}
                   log( p_target[bucket(g)] / p_raw[bucket(g)] )

Pretraining pipelines use this to up-select web text that resembles a
trusted target corpus (wiki/books) without training a classifier. The
reference has nothing comparable (it is a format ETL library); this is
part of the beyond-the-reference training-data surface the engine
ships.

Spark shapes (100 TB):
  - gram extraction is `split` + higher-order `transform` (whole-stage
    codegen), exploded once;
  - the two bucket-count models are map-side-combined groupBys over a
    FIXED bucket space (`buckets` rows each — metadata-sized, default
    4096);
  - the model joins back as a BROADCAST (bucket, log_ratio) table, so
    raw grams never shuffle for the lookup; the per-document weight is
    one partial-aggregated groupBy on the id (O(docs) shuffle rows,
    grams pre-reduced within their input partitions);
  - selection is a deterministic TakeOrdered top-k (the paper's Gumbel
    resampling adds noise for diversity; the deterministic variant
    keeps the driver oracle exact — inject your own noise column before
    `select_top_k` when sampling diversity matters).

Cross-engine hash (mirrored op-for-op by the DuckDB oracle): bucket(g)
= pmod(int(md5(g)[:8 hex], 16), buckets). md5 is byte-stable in both
engines and the 32-bit slice stays far inside int64, so no
overflow-wrap divergence (same discipline as the Knuth hash in
sampling.py). Log-ratios are rounded to 6 decimals INSIDE the model so
the per-document sum adds identical terms in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_WS = r"\s+"


def _grams(text_col: str, n_max: int):
    """Array of word n-grams (1..n_max) of the lowercased text —
    whole-stage codegen, no UDF."""
    words = F.split(F.lower(F.trim(F.col(text_col))), _WS)

    def joiner(n):
        # single-parameter lambda: a second (even defaulted) parameter
        # makes F.transform pass the element INDEX into it
        return lambda i: F.concat_ws(
            " ",
            *[
                F.element_at(words, i + F.lit(j + 1))  # 1-based
                for j in range(n)
            ],
        )

    out = words
    for n in range(2, n_max + 1):
        # n-grams start at 0..size-n (size-n+1 of them); the greatest()
        # keeps the sequence bounds legal when size < n — that branch's
        # value is discarded by the when()
        grams_n = F.transform(
            F.sequence(
                F.lit(0), F.greatest(F.size(words) - n, F.lit(0))
            ),
            joiner(n),
        )
        out = F.concat(
            out,
            F.when(F.size(words) >= n, grams_n).otherwise(
                F.array().cast("array<string>")
            ),
        )
    return out


def _bucket(col):
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hashed_gram_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    n_max: int = 2,
) -> DataFrame:
    """(id, bucket) — one row per word n-gram occurrence (1..n_max),
    hashed into a fixed bucket space."""
    return (
        df.select(
            F.col(id_col),
            F.explode(_grams(text_col, n_max)).alias("gram"),
        )
        # split('') yields one empty token: not a gram (keeps the model
        # clean and makes empty/whitespace-only docs gram-free)
        .filter(F.col("gram") != "")
        .select(
            id_col,
            F.pmod(_bucket(F.col("gram")), F.lit(buckets)).alias("bucket"),
        )
    )


def dsir_model(
    target_df: DataFrame,
    raw_df: DataFrame,
    text_col: str = "text",
    buckets: int = 4096,
    n_max: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """The (bucket, log_ratio) model table: log of the add-one-smoothed
    hashed-n-gram probability ratio between the target and raw corpora.
    ``buckets`` rows — metadata-sized, broadcast by
    :func:`dsir_weights`. log_ratio is rounded to 6 decimals so
    downstream sums add bit-identical terms across engines."""
    spark = target_df.sparkSession
    base = spark.range(buckets).select(F.col("id").alias("bucket"))

    def counts(df, name):
        return (
            hashed_gram_buckets(df, text_col, id_col, buckets, n_max)
            .groupBy("bucket")
            .agg(F.count("*").alias(name))
        )

    t = counts(target_df, "n_t")
    r = counts(raw_df, "n_r")
    joined = (
        base.join(t, "bucket", "left").join(r, "bucket", "left").select(
            "bucket",
            F.coalesce("n_t", F.lit(0)).alias("n_t"),
            F.coalesce("n_r", F.lit(0)).alias("n_r"),
        )
    )
    # add-one smoothing over the fixed bucket space; totals ride along
    # as window-free scalar subaggregates via a cross-joined 1-row frame
    totals = joined.agg(
        F.sum("n_t").alias("tot_t"), F.sum("n_r").alias("tot_r")
    )
    return (
        joined.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.col("n_t") + F.lit(1.0))
                    / (F.col("tot_t") + F.lit(float(buckets)))
                )
                - F.log(
                    (F.col("n_r") + F.lit(1.0))
                    / (F.col("tot_r") + F.lit(float(buckets)))
                ),
                6,
            ).alias("log_ratio"),
        )
    )


def dsir_weights(
    raw_df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    n_max: int = 2,
    out_col: str = "log_weight",
) -> DataFrame:
    """raw rows + per-document length-normalized log importance weight
    (rounded to 4 decimals). Documents with no grams get weight 0."""
    grams = hashed_gram_buckets(raw_df, text_col, id_col, buckets, n_max)
    per_doc = (
        grams.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum("log_ratio") / F.count("*"), 4
            ).alias(out_col)
        )
    )
    return raw_df.join(per_doc, id_col, "left").withColumn(
        out_col, F.coalesce(out_col, F.lit(0.0))
    )


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    n_max: int = 2,
) -> DataFrame:
    """Top-``k`` most-target-like raw documents by DSIR log weight
    (deterministic tie-break on id — TakeOrdered, zero extra
    shuffle)."""
    model = dsir_model(
        target_df, raw_df, text_col, buckets, n_max, id_col
    )
    w = dsir_weights(raw_df, model, text_col, id_col, buckets, n_max)
    return w.orderBy(F.desc("log_weight"), F.col(id_col)).limit(k)
