"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen) — deliberately SQL-expressible so every one has a
DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# marker words per language for the n-gram/stopword heuristic; the point
# is determinism and plan shape, not linguistic accuracy (the synthetic
# corpus is English-ish regardless of label).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in"],
    "de": ["der", "die", "und", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "de", "que", "y", "los"],
}

_WORD_RE = r"[A-Za-z0-9']+"


def _count_word(col, w: str):
    # count occurrences of a word with boundaries; identical semantics in
    # Spark regexp_count and DuckDB len(regexp_extract_all(...))
    return F.regexp_count(col, F.lit(rf"\b{w}\b"))


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish word-piece count (regex tokens)."""
    return df.withColumn(
        "ws_tokens",
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")),
    ).withColumn(
        "re_tokens",
        F.regexp_count(F.col(text_col), F.lit(_WORD_RE)),
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punct/stopword-ratio quality score in [0, 1]."""
    n_chars = F.length(F.col(text_col))
    n_words = F.regexp_count(F.col(text_col), F.lit(_WORD_RE))
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]"))
    n_stop = sum(
        _count_word(F.col(text_col), w) for w in LANG_MARKERS["en"]
    )
    mean_word_len = n_chars / F.greatest(n_words, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * 0.2
        + F.when((mean_word_len >= 3) & (mean_word_len <= 10), F.lit(1.0))
        .otherwise(F.lit(0.0))
        * 0.1
    )
    return df.withColumn("quality", F.round(score, 4))


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID; deterministic argmax (ties → lang asc)."""
    scores = {
        lang: sum(_count_word(F.lower(F.col(text_col)), w) for w in words)
        for lang, words in LANG_MARKERS.items()
    }
    # argmax with deterministic tie-break on language code
    best = None
    for lang in sorted(scores):
        cand = F.struct(
            scores[lang].alias("score"), F.lit(lang).alias("lang")
        )
        best = cand if best is None else F.when(
            (cand["score"] > best["score"]), cand
        ).otherwise(best)
    return df.withColumn("lang_pred", best["lang"])


def with_html_text(
    df: DataFrame, html_col: str = "html", out_col: str = "extracted"
) -> DataFrame:
    """Extract visible text from an HTML payload — THE canonical
    web-corpus operation (the input table's ``text`` column is exactly
    this, per url). Boilerplate regex pipeline, all JVM codegen:

      1. drop <script>/<style> subtrees (non-greedy, dotall)
      2. strip every remaining tag
      3. decode the five core entities (&amp; last, so &amp;lt; does
         not double-decode)
      4. collapse whitespace, trim

    Patterns stay in the Java-regex ∩ RE2 subset so the DuckDB oracle
    mirrors the chain byte-for-byte. A production crawler would swap in
    trafilatura/jusText here; this is the dependency-free scale shape.
    ``html_col`` may be binary (cast to string as utf-8)."""
    col = F.col(html_col).cast("string")
    col = F.regexp_replace(col, r"(?is)<script[^>]*>.*?</script>", " ")
    col = F.regexp_replace(col, r"(?is)<style[^>]*>.*?</style>", " ")
    col = F.regexp_replace(col, r"(?s)<[^>]+>", " ")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
        ("&#39;", "'"), ("&amp;", "&"),
    ):
        col = F.regexp_replace(col, ent, ch)
    col = F.trim(F.regexp_replace(col, r"\s+", " "))
    return df.withColumn(out_col, col)


# block-level HTML elements — a boundary between content-classification
# units. Inline markup (<a>, <b>, <span>, ...) stays inside its block so
# link density is measurable per block.
_BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th"
    r"|section|article|aside|header|footer|nav|main|figure|figcaption"
    r"|blockquote|pre|form|fieldset|hr|br)\b[^>]*>"
)
_A_INNER_RE = r"(?is)<a\b[^>]*>(.*?)</a>"


def _clean_block(b):
    """Visible text of one block: strip tags, decode the five core
    entities, collapse whitespace — the with_html_text chain scoped to
    a block (same Java ∩ RE2 subset, same DuckDB mirror)."""
    t = F.regexp_replace(b, r"(?s)<[^>]+>", " ")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
        ("&#39;", "'"), ("&amp;", "&"),
    ):
        t = F.regexp_replace(t, ent, ch)
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def with_content_blocks(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "content_text",
    min_words: int = 8,
    max_link_density: float = 0.35,
) -> DataFrame:
    """Main-content extraction by block classification — the
    boilerpipe/jusText recipe (Kohlschütter et al. WSDM 2010; Pomikálek
    2011) that separates article text from navigation/footer chrome,
    the step after raw visible-text extraction in every web-corpus
    pipeline. Dependency-free scale shape, ALL codegen, zero shuffle:

      1. drop <script>/<style> subtrees
      2. split the page into blocks at block-level tag boundaries
      3. per block (higher-order ``transform``): visible text, word
         count, and LINK DENSITY (chars inside <a>...</a> / block chars)
      4. keep blocks with ``>= min_words`` words and link density
         ``<= max_link_density`` — short and link-heavy blocks are
         chrome by construction
      5. ``out_col`` = kept blocks joined with newlines; plus
         ``n_blocks`` / ``n_content_blocks`` counts for quality audits

    Patterns stay in the Java-regex ∩ RE2 subset and the block algebra
    in list lambdas, so a DuckDB oracle mirrors the whole chain.
    ``html_col`` may be binary (cast as utf-8)."""
    html = F.col(html_col).cast("string")
    html = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    html = F.regexp_replace(html, r"(?is)<style[^>]*>.*?</style>", " ")
    blocks = F.split(F.regexp_replace(html, _BLOCK_TAG_RE, "\x00"), "\x00")

    def _metrics(b):
        text = _clean_block(b)
        link_chars = F.aggregate(
            F.transform(
                F.regexp_extract_all(b, F.lit(_A_INNER_RE), F.lit(1)),
                lambda a: F.length(_clean_block(a)),
            ),
            F.lit(0),
            lambda acc, n: acc + n,
        )
        return F.struct(text.alias("text"), link_chars.alias("link_chars"))

    scored = F.transform(blocks, _metrics)
    scored = F.filter(scored, lambda s: s["text"] != "")
    kept = F.filter(
        scored,
        lambda s: (F.size(F.split(s["text"], " ")) >= F.lit(min_words))
        & (
            s["link_chars"]
            <= F.lit(max_link_density) * F.greatest(
                F.length(s["text"]), F.lit(1)
            )
        ),
    )
    return (
        df.withColumn("_blocks", scored)
        .withColumn("_kept", kept)
        .select(
            "*",
            F.concat_ws(
                "\n", F.transform(F.col("_kept"), lambda s: s["text"])
            ).alias(out_col),
            F.size("_blocks").alias("n_blocks"),
            F.size("_kept").alias("n_content_blocks"),
        )
        .drop("_blocks", "_kept")
    )


# PII patterns, deliberately restricted to the regex subset with
# identical semantics in Java regex (Spark) and RE2 (DuckDB): character
# classes, bounded repetition, \b word boundaries — no backreferences,
# no lookaround. Order matters: emails before the bare-domain-ish word
# rule would ever fire, phones before plain digit runs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d{1,3}[-. ]\d{3}[-. ]\d{3,4}(?:[-. ]\d{3,4})?", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CARD>"),
]


def with_pii_redacted(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Redact common PII shapes (emails, phone numbers, IPv4 addresses,
    card-style digit groups) — the scrub step every training-data
    pipeline runs before packaging text. A chain of JVM-side
    ``regexp_replace`` calls (whole-stage codegen, no UDF); patterns are
    restricted to the Java-regex ∩ RE2 subset so the DuckDB oracle can
    mirror them byte-for-byte. Adds ``out_col`` plus a ``pii_hits``
    count of total redactions."""
    col = F.col(text_col)
    hits = F.lit(0)
    for _, pat, _tok in PII_PATTERNS:
        hits = hits + F.regexp_count(F.col(text_col), F.lit(pat))
    for _, pat, tok in PII_PATTERNS:
        col = F.regexp_replace(col, pat, tok)
    return df.withColumn(out_col, col).withColumn(
        "pii_hits", hits.cast("int")
    )


def with_repetition_stats(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, public paper):
    the fraction of duplicated words and duplicated word-2-grams per
    document — the filters web-text pipelines use to drop boilerplate
    and looping generations. All JVM higher-order functions (split /
    transform / array_distinct), whole-stage codegen, no UDF; rounded to
    6 places so the DuckDB oracle compares exactly."""
    # words/grams are STAGED as real columns before use: referencing the
    # split() expression from inside the transform lambda would make
    # codegen re-evaluate the whole split per element (no common
    # subexpression elimination inside higher-order functions) —
    # O(words^2 x text_len) per row, measured as a hang on 400-word
    # pages. As attributes each is computed once per row.
    staged = df.withColumn(
        "_w", F.split(F.trim(F.col(text_col)), r"\s+")
    )
    words = F.col("_w")
    n_words = F.size(words)
    staged = staged.withColumn(
        "_g",
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_words - 1, F.lit(1))),
            # try_element_at: the single-word edge case indexes one past
            # the end (ANSI mode makes plain element_at throw);
            # concat_ws skips the NULL, matching DuckDB out-of-range
            lambda i: F.concat_ws(
                " ",
                F.try_element_at(words, i),
                F.try_element_at(words, i + 1),
            ),
        ),
    )
    grams = F.col("_g")
    dup_word = F.lit(1.0) - F.size(F.array_distinct(words)) / F.greatest(
        n_words, F.lit(1)
    )
    dup_2gram = F.lit(1.0) - F.size(
        F.array_distinct(grams)
    ) / F.greatest(F.size(grams), F.lit(1))
    return (
        staged.withColumn("dup_word_frac", F.round(dup_word, 6))
        .withColumn("dup_2gram_frac", F.round(dup_2gram, 6))
        .drop("_w", "_g")
    )


def fingerprint_expr(text_col: str):
    """md5-of-normalized-text Column expression — the ONE definition of
    "duplicate" shared by batch (:func:`with_fingerprint`), incremental
    (``dedup_against``), and streaming (``dedup_stream``) dedup."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return F.md5(norm)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of case/whitespace-normalized text."""
    return df.withColumn("fingerprint", fingerprint_expr(text_col))


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 8,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003, public algorithm): k-gram rolling hashes, min per
    sliding window, distinct mins as the fingerprint set. Vectorized
    (one numpy pass per doc batch, no per-row Python beyond the
    Arrow-batch loop); non-SQL-expressible — rows-only oracle."""
    from collections.abc import Iterator

    import numpy as np
    import pyarrow as pa

    def kernel(raw: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from choetl_spark.operators.dedup import (
            _batch_window_hashes,
            _iter_batch_slices,
            _unique_per_doc,
        )

        batches = (
            piece for b in raw for piece in _iter_batch_slices(b)
        )
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            h, wseg = _batch_window_hashes(batch.column(1), k)
            n_win = np.diff(wseg)
            # global sliding-window min over the flattened hash stream
            # (window-1 shifted np.minimum passes), then select each
            # doc's valid positions; docs shorter than the window keep
            # all their hashes (scalar-reference semantics)
            m = len(h) - window + 1
            if m > 0:
                gmin = h[:m].copy()
                for j in range(1, window):
                    np.minimum(gmin, h[j : j + m], out=gmin)
            valid = np.where(n_win >= window, n_win - window + 1, n_win)
            vseg = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(valid, out=vseg[1:])
            total = int(vseg[-1])
            intra = np.arange(total, dtype=np.int64) - np.repeat(
                vseg[:-1], valid
            )
            pos = np.repeat(wseg[:-1], valid) + intra
            vals = h[pos]
            long_mask = np.repeat(n_win >= window, valid)
            if m > 0:
                vals[long_mask] = gmin[pos[long_mask]]
            uniq, seg = _unique_per_doc(vals, vseg)
            offsets = pa.array(seg.astype(np.int32), type=pa.int32())
            fp_arr = pa.ListArray.from_arrays(
                offsets, pa.array(uniq.astype(np.int64), type=pa.int64())
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(0).cast(pa.int64()), fp_arr],
                names=[id_col, "fingerprints"],
            )

    return df.select(id_col, text_col).mapInArrow(
        kernel, f"{id_col} long, fingerprints array<long>"
    )


def with_text_normalized(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    strip_control: bool = False,
    out_col: str = "text_norm",
) -> DataFrame:
    """Unicode normalization (NFC/NFD/NFKC/NFKD) + optional control-char
    strip — the canonicalization pass a web corpus needs before hashing,
    dedup, or tokenization (the same bytes can arrive precomposed or as
    combining sequences depending on the producing site's stack; NFC is
    the W3C/WHATWG-recommended storage form).

    Spark has no normalization builtin, so the normalize step is an
    Arrow-batched pandas UDF over pandas' vectorized ``str.normalize``
    (stdlib ``unicodedata`` under the hood — the one case the repo's
    no-Python-in-hot-path rule allows: no JVM expression exists).
    ``strip_control`` removes C0/C1 control chars except tab/LF/CR via a
    JVM ``regexp_replace`` (codegen), applied AFTER normalization.

    Already-NFC ASCII text round-trips byte-identical (normalization is
    idempotent and identity on ASCII), so this is safe to run
    unconditionally in a curation pipeline.

    Scale shape: pure map, zero shuffle; one JVM->Python Arrow transfer
    of only ``text_col``'s bytes (project before calling if the row is
    wide).

    Reference analog: the per-field converter chain of
    `/root/reference/src/ChoETL/ChoRecordFieldConfiguration.cs:85-95`
    (value in -> canonical value out), vectorized.
    """
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")
    _form = form

    @pandas_udf("string")
    def _norm(s):
        # str.normalize is pandas' cython-mapped unicodedata.normalize;
        # fall back through object dtype for columns with nulls
        return s.str.normalize(_form)

    out = df.withColumn(out_col, _norm(F.col(text_col)))
    if strip_control:
        out = out.withColumn(
            out_col,
            F.regexp_replace(
                F.col(out_col), r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]", ""
            ),
        )
    return out
