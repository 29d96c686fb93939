"""Distributed BPE tokenizer training + application.

The byte-pair-encoding trainer every LLM data pipeline eventually runs
over its corpus, expressed Spark-first:

  - the corpus collapses to a WORD-FREQUENCY table first (one
    map-side-combined shuffle) — exactly the pre-tokenization HF/
    SentencePiece trainers use, and the reason this scales: all later
    work is O(distinct words), not O(corpus). At 10^12 docs the
    distinct-word table is millions–billions of SMALL rows; it stays
    distributed throughout (never collected).
  - each merge round is one aggregation over that table (adjacent
    symbol pairs weighted by word count, map-side combined) plus one
    codegen'd string `replace` pass to apply the winning merge. The
    driver loop holds only the K merge pairs themselves.

Merge-application semantics (shared with the DuckDB oracle BY
CONSTRUCTION): symbols are space-joined with sentinel padding, and a
merge (l, r) is ``replace(" l r " -> " lr ")`` applied
``_REPLACE_PASSES`` times. Plain left-to-right non-overlapping
`replace` consumes the boundary space, so one pass merges every OTHER
occurrence in a run of consecutive matches; each extra pass halves the
remainder, so 4 passes are exact for up to ~15 back-to-back
occurrences of the same pair inside one word — beyond any natural-
language word. (True BPE is a single leftmost-first sweep; on words
where 4 sweeps differ from 1 — pathological character runs — this is
a documented deviation. Both the Spark side and the SQL oracle use
the identical rule, and `Spark replace`/DuckDB `replace` share
left-to-right non-overlapping semantics, so the cross-engine check is
exact.)

No end-of-word marker (merges never cross word boundaries because
application is per word; a '</w>' sentinel is a one-line change).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from choetl_spark.operators.search import tokenize_col

__all__ = [
    "bpe_train",
    "with_bpe_tokens",
    "with_bpe_tokens_fast",
    "bpe_apply_col",
]

_REPLACE_PASSES = 4


def _char_syms(word) -> Column:
    """' a b c ' — characters space-joined with sentinel padding."""
    return F.concat(F.lit(" "), F.regexp_replace(word, "(.)", "$1 "))


def _apply_merge(sym, left: str, right: str) -> Column:
    pat = F.lit(f" {left} {right} ")
    rep = F.lit(f" {left}{right} ")
    out = sym
    for _ in range(_REPLACE_PASSES):
        out = F.replace(out, pat, rep)
    return out


def _adjacent_pairs(syms) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs (empty for 1-symbol
    words)."""
    return F.when(
        F.size(syms) >= 2,
        F.zip_with(
            F.slice(syms, 1, F.size(syms) - 1),
            F.slice(syms, 2, F.size(syms) - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    min_word_freq: int = 1,
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges on the corpus; returns the ordered
    merge list ``[(left, right), ...]``. Ties break (count desc, left
    asc, right asc) so training is deterministic.

    Each round costs one pair-count aggregation + one string-replace
    map over the distinct-word table; the table is localCheckpointed
    every 8 rounds to keep the replace-chain lineage bounded."""
    words = (
        df.select(F.explode(tokenize_col(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    if min_word_freq > 1:
        words = words.filter(F.col("cnt") >= min_word_freq)
    syms = words.select(_char_syms(F.col("w")).alias("sym"), "cnt")
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        pairs = (
            syms.select(
                F.explode(
                    _adjacent_pairs(F.split(F.trim(F.col("sym")), " "))
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not pairs:
            break  # every word is a single symbol — vocabulary saturated
        left, right = pairs[0]["l"], pairs[0]["r"]
        merges.append((left, right))
        syms = syms.select(
            _apply_merge(F.col("sym"), left, right).alias("sym"), "cnt"
        )
        if (i + 1) % 8 == 0:
            syms = syms.localCheckpoint()
    return merges


def bpe_apply_col(word, merges: list[tuple[str, str]]) -> Column:
    """Column expression: one word -> its BPE symbol array under the
    ordered ``merges``. Pure codegen'd string ops (fine for the tens-
    of-merges scale; a production 50k-merge vocabulary applies via a
    vectorized pandas UDF instead — the expression tree is the
    bottleneck, not the algorithm)."""
    sym = _char_syms(word)
    for left, right in merges:
        sym = _apply_merge(sym, left, right)
    return F.split(F.trim(sym), " ")


def with_bpe_tokens(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Add ``out_col`` (array<string> of BPE tokens over the whole doc,
    word-wise application, word order preserved) and ``n_bpe_tokens``.
    Pure map, zero shuffle."""
    toks = F.flatten(
        F.transform(
            tokenize_col(text_col), lambda w: bpe_apply_col(w, merges)
        )
    )
    return df.withColumn(out_col, toks).withColumn(
        "n_bpe_tokens", F.size(out_col)
    )


def _apply_merges_py(word: str, ranks: dict) -> list[str]:
    """Reference BPE application (the HF algorithm): repeatedly merge
    the best-ranked adjacent pair. O(len * merges-applied); used by the
    vectorized kernel below, per DISTINCT word per batch."""
    syms = list(word)
    while len(syms) >= 2:
        best_i, best_rank = -1, None
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_i, best_rank = i, rk
        if best_rank is None:
            break
        l, r = syms[best_i], syms[best_i + 1]
        # merge ALL occurrences of the chosen pair left-to-right
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def with_bpe_tokens_fast(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Production-scale BPE application: a ``mapInPandas`` kernel with
    the merge table broadcast as rank lookups and a per-batch
    DISTINCT-WORD cache (web text is Zipfian — a few thousand distinct
    words cover most tokens, so each batch tokenizes each distinct word
    once). Use this for real vocabularies (10k–100k merges) where
    :func:`with_bpe_tokens`'s codegen'd expression chain would blow up
    the plan; semantics match (rank-priority merging equals
    apply-in-training-order for merge tables produced by
    :func:`bpe_train` — pinned by test; the argument: a pair (l, r)
    can only become adjacent once the merges that PRODUCED l and r
    have applied, and those always rank earlier in a self-consistent
    trained table)."""
    spark = df.sparkSession
    b_ranks = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)}
    )
    out_cols = [*df.columns, out_col, "n_bpe_tokens"]
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    ddl = f"{fields}, `{out_col}` array<string>, `n_bpe_tokens` int"

    def kernel(batches):
        ranks = b_ranks.value
        cache: dict[str, list[str]] = {}

        def tok(text) -> list[str]:
            if text is None:
                return []
            toks: list[str] = []
            for w in str(text).lower().strip().split():
                hit = cache.get(w)
                if hit is None:
                    hit = cache[w] = _apply_merges_py(w, ranks)
                toks.extend(hit)
            return toks

        for pdf in batches:
            tokens = [tok(t) for t in pdf[text_col]]
            pdf = pdf.copy()
            pdf[out_col] = tokens
            pdf["n_bpe_tokens"] = [len(t) for t in tokens]
            yield pdf[out_cols]

    return df.mapInPandas(kernel, ddl)
