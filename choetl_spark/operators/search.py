"""Full-text relevance search over a document corpus: an inverted
term index (postings) plus BM25 ranked retrieval — the retrieval
primitive a training-data pipeline uses for quality-targeted sampling
("find documents like this benchmark prompt"), contamination triage,
and corpus exploration.

Spark-first shapes (100 TB):
  - :func:`build_postings` — ONE shuffle: explode tokens, then a
    (doc_id, term) groupBy whose map-side partial count collapses
    repeated terms inside a document before the exchange. Document
    length rides along (it is computed before the explode, so the
    postings row already carries it — no second join against the
    corpus). Persist the postings table through the encode engine and
    the per-query cost below never touches raw text again.
  - :func:`bm25_topk` — the query's term list is a tiny literal
    IN-list: the postings scan filters on it FIRST (partition-prunable
    when postings are written bucketed/sorted by term — the zone-map
    case), so the scored row volume is O(matching postings), not
    O(corpus). Corpus constants (N, avgdl) come from a 1-row aggregate
    that broadcasts via crossJoin; per-term document frequencies are a
    groupBy over the already-filtered postings. The final ranking is a
    TakeOrderedAndProject (top-k heap per partition), never a full
    sort.

Tokenization contract: ``lower`` + split on ``\\s+`` after trim — the
same whitespace contract as :func:`~choetl_spark.operators.corpus.
decontaminate` / ``top_ngrams`` so gram spaces line up across the
curation operators, and simple enough that the DuckDB oracle mirrors
it exactly (``regexp_split_to_array(trim(lower(text)), '\\s+')``).

Reference analog: ChoETL exposes LINQ ``Where``/``OrderBy`` over
record streams (e.g. `/root/reference/src/ChoETL/File/CSV/
ChoCSVReader.cs:1`-range enumerable surface) — relevance-ranked
retrieval is the query-side capability a columnar corpus store needs
that row-streaming ETL answers with full scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["build_postings", "bm25_topk", "tokenize_col"]


def tokenize_col(text_col: str):
    """Lowercased whitespace tokens of ``text_col`` (the shared
    curation-suite contract; empty/whitespace-only text yields an
    empty array, mirrored by the oracle's trim)."""
    t = F.trim(F.lower(F.col(text_col)))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def build_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted index rows ``(term, doc_id, tf, dl)``.

    ``tf`` is the within-document term count, ``dl`` the document's
    token count. One shuffle (the (doc_id, term) count); map-side
    combine absorbs within-partition repeats. At store scale, write
    this through the encode engine clustered by ``term`` so query-time
    IN-list filters prune chunks via the string zone maps.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokenize_col(text_col).alias("_toks")
    ).withColumn("dl", F.size("_toks"))
    exploded = toks.select(
        "doc_id", "dl", F.explode("_toks").alias("term")
    )
    return exploded.groupBy("term", "doc_id", "dl").agg(
        F.count("*").alias("tf")
    )


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents for ``query`` under BM25 (Robertson/Sparck
    Jones idf with the +1 floor, so idf stays positive even for terms
    in more than half the corpus).

    Returns ``(doc_id, score)`` ordered by score desc, doc_id asc
    (deterministic tiebreak). Pass a persisted ``postings`` DataFrame
    (from :func:`build_postings`) to skip re-tokenizing the corpus —
    the production path; without it the index is built inline.

    score(d) = sum over query terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))
    """
    if postings is None:
        postings = build_postings(df, text_col, id_col)
    terms = sorted(
        {t for t in str(query).lower().strip().split() if t}
    )
    if not terms:
        return postings.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    # corpus constants: a 1-row aggregate; crossJoin broadcasts it.
    # dl rides on every posting, so distinct doc_id/dl pairs recover the
    # corpus-length stats without a second scan of the raw text. Docs
    # with zero tokens score 0 for every query and cannot enter the
    # top-k, so excluding them from N/avgdl is the standard convention
    # (they are not in the postings at all).
    corpus = postings.select("doc_id", "dl").distinct().agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    hits = postings.filter(F.col("term").isin(terms))
    dfreq = hits.groupBy("term").agg(
        F.countDistinct("doc_id").alias("dfreq")
    )
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
                / (F.col("dfreq") + F.lit(0.5))
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl") / F.col("avgdl")
                )
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("w").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
