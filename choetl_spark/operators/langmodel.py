"""N-gram language-model perplexity scoring — the KenLM-style quality
signal curation pipelines use to rank/filter web text against a
reference corpus (CCNet, Gopher, RedPajama all gate on LM perplexity).

This is a bigram model with add-one smoothing, deliberately simple so
the whole pipeline stays in built-in DataFrame ops (and the DuckDB
oracle can recompute it exactly — the same discipline as the other
curation operators; a production deployment would swap the counts
table for one trained on its own reference corpus, the plumbing is
identical):

    P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)
    doc score  = mean over the doc's bigrams of ln P
    ppl        = exp(-score)

Spark-first shapes (100 TB):
  - :func:`train_bigram_lm` — two map-side-combined aggregations (the
    bigram count and the unigram count); the heavy-tailed head
    collapses before each exchange. The result is a TABLE, not a
    driver-side dict — the model can be arbitrarily large and is
    joined, never collected. ``min_count`` prunes the hapax tail
    (most of the vocab by type count, irrelevant by token count).
  - :func:`score_lm` — explode the doc's bigrams, ONE equi-join each
    against the bigram/unigram count tables (AQE broadcasts when the
    pruned model fits, shuffled-hash otherwise), then a per-doc
    aggregation. No UDFs anywhere.

Low-perplexity = fluent/common text; high = gibberish, boilerplate
soup, or wrong-language — cut both tails, as CCNet does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from choetl_spark.operators.search import tokenize_col

__all__ = ["train_bigram_lm", "score_lm", "with_lm_perplexity"]


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = df.select(
        F.col(id_col).alias("_doc"), tokenize_col(text_col).alias("_t")
    )
    grams = toks.select(
        "_doc",
        F.explode(
            F.when(
                F.size("_t") >= 2,
                F.zip_with(
                    F.slice("_t", 1, F.size("_t") - 1),
                    F.slice("_t", 2, F.size("_t") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("g"),
    )
    return grams.select("_doc", "g.w1", "g.w2")


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> dict:
    """Count tables for the bigram LM: ``{"bigrams": (w1, w2, c12),
    "unigrams": (w1, c1), "vocab_size": int}``. ``vocab_size`` counts
    DISTINCT unigram types BEFORE min_count pruning (the smoothing
    denominator must not shrink when the tail is pruned, or pruned
    models would score differently from full ones on unseen pairs)."""
    bi = _doc_bigrams(df, text_col, id_col)
    toks = df.select(
        F.explode(tokenize_col(text_col)).alias("w1")
    )
    uni = toks.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab_size = uni.count()
    bigrams = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    if min_count > 1:
        bigrams = bigrams.filter(F.col("c12") >= min_count)
        uni = uni.filter(F.col("c1") >= min_count)
    return {"bigrams": bigrams, "unigrams": uni, "vocab_size": int(vocab_size)}


def score_lm(
    df: DataFrame,
    lm: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document ``(id_col, n_bigrams, avg_logp, ppl)`` under the
    trained model. Docs with fewer than 2 tokens carry NULL
    avg_logp/ppl (no evidence either way — filter or keep explicitly
    downstream). Unseen words/pairs smooth via add-one: a missing
    bigram contributes ln(1 / (c1 + V)), a missing unigram
    ln(1 / V)."""
    v = float(lm["vocab_size"])
    bi = _doc_bigrams(df, text_col, id_col)
    scored = (
        bi.join(lm["bigrams"], ["w1", "w2"], "left")
        .join(lm["unigrams"], ["w1"], "left")
        .withColumn(
            "_logp",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1.0))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(v))
            ),
        )
        .groupBy("_doc")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg("_logp").alias("avg_logp"),
        )
    )
    ids = df.select(F.col(id_col).alias("_doc")).distinct()
    return (
        ids.join(scored, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "avg_logp",
            F.exp(-F.col("avg_logp")).alias("ppl"),
        )
    )


def with_lm_perplexity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """Self-trained convenience wrapper: train the bigram LM on ``df``
    itself and score every document against it (the corpus-internal
    fluency ranking; cross-corpus filtering passes an external model
    to :func:`score_lm`)."""
    return score_lm(
        df, train_bigram_lm(df, text_col, id_col, min_count),
        text_col, id_col,
    )
