"""Corpus-level curation operators a training-data pipeline runs between
dedup and packaging: line-level boilerplate removal (RefinedWeb-style),
benchmark decontamination by n-gram overlap, and token-budget shard
packing. All composed from built-in DataFrame ops (codegen'd splits,
higher-order functions, hash joins, per-writer windows) — no UDFs — and
deliberately SQL-expressible so each has a DuckDB oracle.

Scale shapes (100 TB):
  - :func:`dedup_lines` — two shuffles: a line-key aggregation (partial
    combine first, so the exchange carries distinct lines per partition,
    not raw rows) and the per-doc rebuild groupBy. The boilerplate join
    is a plain equi-join; AQE broadcasts it when the boilerplate set is
    small (the common case — boilerplate is by definition high-frequency
    and low-cardinality).
  - :func:`decontaminate` — the eval-gram side is explicitly broadcast:
    benchmark suites are millions of grams at most, never corpus-scale.
    The doc side is a pure map (gram generation) + map-side semi-join.
  - :func:`pack_shards` — windows partitioned by a writer key, so the
    cumulative sums run per-writer in parallel; no global ordering, no
    single-task exchange (the with_seq_no lesson).
  - :func:`top_ngrams` — one exchange on the gram key, AFTER a map-side
    partial count collapses the heavy-tailed head (the top grams are by
    definition high-frequency, so most of the volume combines before
    the shuffle); the global top-k is a TakeOrderedAndProject, never a
    full sort.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window, functions as F


def _word_grams(words, n: int):
    """``n``-word shingles of a staged words-array column; empty array
    (not a descending-sequence artifact) for docs shorter than ``n``."""
    length = F.size(words)
    return F.when(length < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), length - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_docs: int = 5,
    sep: str = "\n",
) -> DataFrame:
    """Line-level boilerplate removal (the RefinedWeb / CCNet move,
    Penedo et al. 2023, public paper): a line occurring in more than
    ``max_docs`` distinct documents is boilerplate (nav menus, cookie
    banners, copyright footers) and is dropped from EVERY document; the
    survivors are re-joined in original order.

    Returns ``(id_col, text_clean, n_lines, n_removed)`` — one row per
    input document (documents whose every line was boilerplate come back
    with ``text_clean = ''``).

    Exact split/rebuild semantics (``split`` on the LITERAL ``sep`` —
    regex metachars are escaped before the split so any separator round
    trips — join with ``sep``) so the rebuild is byte-identical when
    nothing is removed. Duplicate lines inside one document count once
    toward the document frequency but are each kept/removed together.
    Blank / whitespace-only lines are never counted as boilerplate —
    every multi-paragraph corpus shares ``''`` between paragraphs, and
    stripping it corpus-wide would silently merge paragraphs (the
    RefinedWeb implementations exclude empty lines for the same
    reason)."""
    sep_re = re.escape(sep)
    lines = df.select(
        id_col, F.posexplode(F.split(F.col(text_col), sep_re))
    ).toDF(id_col, "pos", "line")
    boiler = (
        lines.filter(F.trim("line") != "")
        .groupBy("line")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") > max_docs)
        .select("line")
    )
    kept = lines.join(boiler, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    n_lines = F.size(F.split(F.col(text_col), sep_re))
    return (
        df.select(id_col, text_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            n_lines.alias("n_lines"),
            (n_lines - F.coalesce("_n_kept", F.lit(0)))
            .cast("int")
            .alias("n_removed"),
        )
    )


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination by ``n``-word-gram overlap (the
    GPT-3/PaLM appendix procedure, public): a training document sharing
    any length-``n`` word shingle with the evaluation set is flagged.

    Returns the input plus ``n_matched`` (distinct overlapping grams)
    and ``contaminated``. The eval grams are distinct'd then broadcast —
    eval suites are tiny next to the corpus; at a scale where they are
    not, drop the hint and let AQE/shuffle-hash take over.

    The corpus side is deliberately NOT distinct'd before the join —
    that would shuffle every 8-gram of every training document just to
    pre-dedup ahead of a tiny broadcast. Instead the raw gram stream
    map-side-joins the broadcast eval set and only the survivors (a
    benchmark-sized set) are shuffled for the per-doc
    ``countDistinct`` — so the corpus never hits an exchange.

    Tokenization is ``split(trim(text), '\\s+')`` — mirrored exactly by
    the oracle's ``regexp_split_to_array``."""
    words = lambda c: F.split(F.trim(F.col(c)), r"\s+")  # noqa: E731
    doc_grams = df.select(id_col, words(text_col).alias("_w")).select(
        id_col, F.explode(_word_grams(F.col("_w"), n)).alias("gram")
    )
    eval_grams = (
        eval_df.select(words(eval_text_col).alias("_w"))
        .select(F.explode(_word_grams(F.col("_w"), n)).alias("gram"))
        .distinct()
    )
    matched = (
        doc_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.countDistinct("gram").alias("_n"))
    )
    return (
        df.join(matched, id_col, "left")
        .withColumn("n_matched", F.coalesce("_n", F.lit(0)).cast("int"))
        .withColumn("contaminated", F.col("n_matched") > 0)
        .drop("_n")
    )


def pack_shards(
    df: DataFrame,
    weight_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_writers: int = 32,
) -> DataFrame:
    """Token-budget shard packing: assign each document to an output
    shard so shards hold ~``budget`` total ``weight_col``. Boundary
    semantics (cumulative-sum packing, NOT strict next-fit): a shard is
    the run of documents whose running pre-sum falls in the same
    ``budget`` bucket, so a document straddling a bucket boundary STAYS
    in its shard, which overflows by less than that document's weight —
    the writer-friendly behavior (bounded overflow, never an
    over-budget open) at one windowed pass. Per-writer shard ids are
    then made dense with a ``dense_rank`` so a single overweight
    document cannot leave gaps in the shard numbering (downstream
    writers iterate shard ids contiguously).

    The stream is first split across ``n_writers`` independent writers
    (``id % n_writers`` here for oracle determinism; at 100 TB use
    ``pmod(xxhash64(id), W)`` with W sized so each writer's stream fits
    a task) and packed per-writer with a windowed cumulative sum — the
    windows are partitioned, so this is embarrassingly parallel with no
    global sort or single-task exchange (the dense-rank window shares
    the same partitioning, so it adds a sort but no second shuffle).

    Returns ``(id_col, weight_col, writer, shard)``; ``shard`` numbers
    are per-writer (global shard id = ``writer * max_shards + shard``)."""
    writer = (F.col(id_col) % n_writers).cast("int")
    w = (
        Window.partitionBy("writer")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(
        F.sum(F.col(weight_col)).over(w), F.lit(0)
    )
    dense = Window.partitionBy("writer").orderBy("_shard_raw")
    return (
        df.select(id_col, weight_col)
        .withColumn("writer", writer)
        .withColumn("_shard_raw", F.floor(cum_before / F.lit(budget)))
        .withColumn(
            "shard", (F.dense_rank().over(dense) - 1).cast("int")
        )
        .drop("_shard_raw")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    overlap: int = 0,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window prep step between curation and packing: chunk i
    covers whitespace tokens [i*stride, i*stride + max_tokens) with
    stride = max_tokens - overlap, so consecutive chunks share
    ``overlap`` tokens and every token lands in at least one chunk.
    A tail window that would consist ENTIRELY of already-emitted
    overlap tokens is dropped (it duplicates training text), so start
    offsets run only while start <= n_tokens - overlap - 1.

    Emits ``(id, *carry_cols, chunk_idx, chunk_text, n_tokens)``;
    documents with no tokens emit nothing. ``carry_cols`` ride along
    so callers never need a join back to the source (chunking stays
    one zero-shuffle pass). Pure codegen (split + sequence +
    posexplode + slice + array_join) — the explode multiplies rows by
    ceil(n_tokens/stride), a bounded, data-proportional expansion with
    no shuffle at all; pack the result with :func:`pack_shards`.
    """
    if not (0 <= overlap < max_tokens):
        raise ValueError(
            f"need 0 <= overlap < max_tokens, got {overlap}/{max_tokens}"
        )
    carry = list(carry_cols or [])
    stride = max_tokens - overlap
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != ""
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("_toks") - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    out = (
        df.select(F.col(id_col), *carry, toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(
            id_col,
            *carry,
            "_toks",
            F.posexplode(starts).alias("chunk_idx", "_start"),
        )
        .select(
            id_col,
            *carry,
            "chunk_idx",
            F.slice(
                F.col("_toks"), F.col("_start") + 1, max_tokens
            ).alias("_ctoks"),
        )
        .select(
            id_col,
            *carry,
            "chunk_idx",
            F.array_join("_ctoks", " ").alias("chunk_text"),
            F.size("_ctoks").alias("n_tokens"),
        )
    )
    return out


def top_ngrams(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: int = 100,
    min_count: int = 1,
) -> DataFrame:
    """Global top-``k`` word ``n``-grams by corpus frequency — the
    vocabulary census a tokenizer-training (BPE/WordPiece) or
    boilerplate-analysis pass starts from.

    Tokenization is ``split(trim(text), '\\s+')``, the same contract as
    :func:`decontaminate`, so gram spaces line up across operators (and
    the DuckDB oracle mirrors it with ``regexp_split_to_array``).

    Returns ``(gram, cnt)`` ordered by count descending, gram ascending
    (deterministic tiebreak). ``min_count`` prunes the long tail before
    the ordering when only the head matters.

    Reference analog: the per-column scan-stats census of
    `/root/reference/src/ChoETL/ChoRecordReader.cs:141-287` (sample ->
    vote -> commit), aimed at corpus vocabulary instead of field types.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = df.select(F.explode(_word_grams(words, n)).alias("gram"))
    counted = grams.groupBy("gram").agg(F.count("*").alias("cnt"))
    if min_count > 1:
        counted = counted.filter(F.col("cnt") >= min_count)
    return counted.orderBy(F.desc("cnt"), F.asc("gram")).limit(k)


def dedup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    min_docs: int = 2,
    use_hash_keys: bool = True,
) -> DataFrame:
    """Exact-substring span dedup: remove every word span of length
    >= ``k`` that occurs verbatim in >= ``min_docs`` DISTINCT documents
    (the word-level form of the suffix-array substring dedup of Lee et
    al., "Deduplicating Training Data Makes Language Models Better",
    ACL 2022 — public paper). Where that work removes all-but-one copy,
    this removes the span from EVERY document (the conservative variant:
    a span shared across documents is boilerplate/licence/quote noise;
    keeping one canonical copy needs a global owner election that buys
    little at corpus scale). Documented divergence.

    Mechanics: ``k``-word shingles with start positions; shingles seen
    in >= ``min_docs`` docs mark their ``k`` words as duplicated;
    overlapping/adjacent marked ranges merge into maximal spans
    (island detection: one per-doc window over start positions — spans
    never span documents, so the window parallelizes per doc); the
    survivor words rebuild the text.

    Tokenization is a split on the LITERAL single space (not ``\\s+``)
    so an untouched document round-trips byte-identical: newlines and
    runs of spaces survive inside/between tokens.

    Returns one row per input doc:
    ``(id_col, n_words, n_dup_spans, words_removed, text_clean)``.

    Scale shape (100 TB): the gram aggregation is the only corpus-wide
    shuffle, and with ``use_hash_keys=True`` (default) it carries
    ``xxhash64(gram)`` — 8 bytes instead of a k-word string (a 2^-64
    collision can over-remove one span; at web scale that trade is
    standard). The island merge shuffles only the (doc, pos) hit list,
    which is duplicate-mass-proportional, never corpus-proportional.
    The rebuild is a pure map with an O(words x spans/doc) filter —
    spans/doc is small after merging. ``use_hash_keys=False`` keeps the
    raw gram string end-to-end (SQL-replayable; the oracle path).

    Reference analog: the compare/diff merge-walk discipline of
    `/root/reference/src/ChoETL/Common/ExtensionMethods/ChoEnumerableEx.cs:105-187`
    (keyed match -> classify -> act), keyed here on content shingles.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2 (got {k})")
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words)
    # 1-based start positions (slice() is 1-based); docs shorter than k
    # produce no shingles and come back untouched
    shingles = F.when(
        n_words < k, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_words - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, k)),
        )
    )
    grams = df.select(
        F.col(id_col).alias("_id"), F.posexplode(shingles)
    ).select(
        "_id",
        (F.col("pos") + 1).alias("pos"),
        (
            F.xxhash64("col") if use_hash_keys else F.col("col")
        ).alias("gkey"),
    )
    dup_keys = (
        grams.groupBy("gkey")
        .agg(F.count_distinct("_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gkey")
    )
    starts = grams.join(dup_keys, "gkey", "left_semi").select("_id", "pos")
    w = Window.partitionBy("_id").orderBy("pos")
    # consecutive k-wide intervals merge when the gap <= k (overlap or
    # exact adjacency); islands = cumulative count of merge boundaries
    bounded = starts.withColumn(
        "_new",
        F.when(
            F.lag("pos").over(w).isNull()
            | ((F.col("pos") - F.lag("pos").over(w)) > k),
            1,
        ).otherwise(0),
    ).withColumn("_island", F.sum("_new").over(w))
    spans = bounded.groupBy("_id", "_island").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + (k - 1)).alias("e"),
    )
    per_doc = spans.groupBy("_id").agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("_spans"),
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("words_removed"),
    )
    joined = df.join(per_doc, df[id_col] == per_doc["_id"], "left")
    kept_words = F.filter(
        words,
        lambda _, i: ~F.exists(
            F.col("_spans"),
            lambda sp: (i + 1 >= sp["s"]) & (i + 1 <= sp["e"]),
        ),
    )
    return joined.select(
        id_col,
        n_words.alias("n_words"),
        F.coalesce("n_dup_spans", F.lit(0)).cast("int").alias("n_dup_spans"),
        F.coalesce("words_removed", F.lit(0))
        .cast("int")
        .alias("words_removed"),
        F.when(F.col("_spans").isNull(), F.col(text_col))
        .otherwise(F.concat_ws(" ", kept_words))
        .alias("text_clean"),
    )
