"""Per-chunk column statistics for codec selection and chunk skipping.

This is the re-aiming of ChoETL's sample-vote-commit type inference
(reference src/ChoETL/ChoRecordReader.cs:141-287: buffer MaxScanRows,
trial-parse each value, widen across rows, commit) at codec choice: for
each column chunk we compute NDV, mean run length, byte entropy, ASCII
fraction, and min/max, and the selector turns those into an estimated
encoded size per candidate codec.

min/max additionally ride along in the encoded-chunk table so readers can
skip chunks (the analog of Parquet row-group stats the reference relies
on implicitly via Parquet.Net).
"""

from __future__ import annotations

import math
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa

from choetl_spark.codecs.base import data_nbytes, int_view, is_int_like

_SAMPLE_ROWS = 4096
_SAMPLE_BYTES = 1 << 16


@dataclass
class ChunkStats:
    n: int
    n_nulls: int
    data_bytes: int
    ndv: int = 0
    mean_run_len: float = 1.0
    min_val: int | None = None
    max_val: int | None = None
    delta_width: int | None = None
    # string zone map (64-char bounds; a truncated bound is flagged so
    # the pruner treats it as unbounded above — a prefix UNDER-estimates
    # — and aggregate pushdown refuses to call it exact)
    min_str: str | None = None
    max_str: str | None = None
    max_str_trunc: bool = False
    min_str_trunc: bool = False
    # exact per-chunk sums for aggregate pushdown (agg_encoded): ints
    # (incl. the int views of timestamp/date/bool) as a decimal STRING —
    # a chunk of large int64s can overflow int64 when summed — floats as
    # a plain double
    sum_val: str | None = None
    sum_f: float | None = None
    avg_len: float = 0.0
    byte_entropy: float = 8.0
    ascii_frac: float = 0.0
    space_frac: float = 0.0
    tok_ndv: int = 0
    avg_tok_len: float = 0.0

    def to_dict(self) -> dict:
        return asdict(self)


def compute_stats(arr: pa.Array, level: str = "full") -> ChunkStats:
    """``level="cheap"`` (the speed profile) skips the string-column
    entropy/token-census work and shrinks the NDV sample: the speed
    selector only needs NDV (dict-vs-plain) and lengths, so the byte
    histogram and tokenizer would be pure overhead."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    st = ChunkStats(n=n, n_nulls=arr.null_count, data_bytes=data_nbytes(arr))
    if n == 0:
        return st
    t = arr.type
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        # vector columns: no zone maps / NDV / entropy — the selector
        # has exactly one codec for them (veclist) and the pruners
        # treat missing bounds as unbounded
        return st
    if is_int_like(t):
        # min/max over the FULL chunk (C kernel, null-aware), computed
        # BEFORE any sample-emptiness early-out: these ride into the
        # encoded table's stats column and drive
        # prune_partitions_by_stats — a prefix-sample bound (or a chunk
        # whose sampled prefix is all null) would silently drop
        # partitions whose real extremes sit past the sample
        mm_src = arr
        if pa.types.is_timestamp(t):
            mm_src = arr.cast(pa.int64())
        elif pa.types.is_date32(t):
            mm_src = arr.cast(pa.int32())
        elif pa.types.is_boolean(t):
            mm_src = arr.cast(pa.int8())
        mm = pa.compute.min_max(mm_src)
        lo, hi = mm["min"], mm["max"]
        st.min_val = int(lo.as_py()) if lo.is_valid else None
        st.max_val = int(hi.as_py()) if hi.is_valid else None
        # exact chunk sum for aggregate pushdown. An int64 accumulator
        # can WRAP on large values (timestamp micros x 64k rows exceeds
        # 2^63), so sum the 32-bit halves separately (floor-shift makes
        # the split exact for negatives too) and recombine as a Python
        # int — exact at any magnitude, still two vectorized passes
        if st.n_nulls < n:
            v = np.asarray(
                pa.compute.fill_null(mm_src.cast(pa.int64()), 0)
            )
            hi_sum = int((v >> 32).sum(dtype=np.int64))
            lo_sum = int((v & 0xFFFFFFFF).sum(dtype=np.int64))
            st.sum_val = str((hi_sum << 32) + lo_sum)
    elif pa.types.is_floating(t):
        s = pa.compute.sum(arr)
        st.sum_f = float(s.as_py()) if s.is_valid else None
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        # string zone map over the FULL chunk (same pre-sample discipline
        # as the int min/max above: prune_partitions_by_stats must see
        # real extremes). min truncates safely (a prefix only lowers the
        # bound); truncated bounds are flagged (unbounded-above for the
        # pruner, inexact for aggregate pushdown).
        mm = pa.compute.min_max(arr)
        lo, hi = mm["min"], mm["max"]
        if lo.is_valid:
            full_lo = lo.as_py()
            st.min_str = full_lo[:64]
            st.min_str_trunc = len(full_lo) > 64
        if hi.is_valid:
            full = hi.as_py()
            st.max_str = full[:64]
            st.max_str_trunc = len(full) > 64
    if level == "pinned":
        # codec choice is already pinned for this column (engine
        # trial-cache): only the fields that ride into the encoded
        # table's stats column (min/max zone maps, sums, null counts —
        # all computed above) are needed; the selector-only sampling
        # below (NDV, run lengths, entropy, token census) is skipped.
        return st
    sample_rows = _SAMPLE_ROWS if level == "full" else 512
    sample = arr.slice(0, min(n, sample_rows))
    sample = sample.drop_null() if sample.null_count else sample
    ns = len(sample)
    if ns == 0:
        return st

    def extrapolate_ndv(sample_ndv: int) -> int:
        # a saturated sample (nearly all-distinct) means NDV grows with n;
        # a plateaued sample means NDV is absolute. Linear extrapolation
        # between the two regimes.
        if sample_ndv >= 0.9 * ns:
            return int(sample_ndv / max(ns, 1) * max(n - st.n_nulls, ns))
        return sample_ndv

    if is_int_like(t):
        v = int_view(sample)
        st.ndv = extrapolate_ndv(int(len(np.unique(v))))
        st.mean_run_len = _mean_run_len_int(v)
        if len(v) > 1:
            # zigzag width of successive differences on the sample — the
            # delta-codec size driver (locally sorted/clustered columns:
            # crawl timestamps, assigned ids). Sample-based like NDV; the
            # encoder packs at the TRUE width, so a lucky prefix can only
            # mis-rank, never corrupt.
            from choetl_spark.codecs.base import bit_width
            from choetl_spark.codecs.core import _zigzag

            with np.errstate(over="ignore"):
                zz = _zigzag(np.diff(v))
            st.delta_width = bit_width(int(zz.max() - zz.min()))
    elif pa.types.is_floating(t):
        v = np.asarray(sample)
        bits = v.view(np.int64 if v.dtype == np.float64 else np.int32)
        st.ndv = extrapolate_ndv(int(len(np.unique(bits))))
        st.mean_run_len = _mean_run_len_int(bits.astype(np.int64))
    else:  # string / binary
        lengths = np.asarray(pa.compute.binary_length(sample).cast(pa.int64()))
        st.avg_len = float(lengths.mean()) if ns else 0.0
        st.ndv = extrapolate_ndv(int(len(pa.compute.unique(sample))))
        if level != "full":
            return st
        st.mean_run_len = _mean_run_len_str(sample)
        blob = _sample_blob(sample, st.avg_len)
        if blob:
            b = np.frombuffer(blob, dtype=np.uint8)
            hist = np.bincount(b, minlength=256).astype(np.float64)
            p = hist[hist > 0] / len(b)
            st.byte_entropy = float(-(p * np.log2(p)).sum())
            st.ascii_frac = float((b < 0x80).mean())
            st.space_frac = float(hist[0x20] / len(b))
            if st.space_frac > 0.02 and st.ascii_frac > 0.99:
                # token census on the sample (worddict candidate): unique
                # tokens via the same uint64-key trick as the fsst sampler
                toks = blob.split(b" ")
                uniq = len(set(toks))
                est_total_toks = st.data_bytes * st.space_frac + max(
                    n - st.n_nulls, 1
                )
                sample_frac = len(toks) / max(est_total_toks, 1)
                if uniq >= 0.5 * len(toks) and sample_frac < 1.0:
                    # saturated sample: vocab likely grows with data
                    st.tok_ndv = min(
                        int(uniq / max(sample_frac, 1e-9)),
                        int(est_total_toks),
                    )
                else:
                    st.tok_ndv = uniq
                st.avg_tok_len = len(blob) / max(len(toks), 1) - 1
    return st


def _mean_run_len_int(v: np.ndarray) -> float:
    if len(v) <= 1:
        return float(len(v))
    changes = int(np.count_nonzero(v[1:] != v[:-1])) + 1
    return len(v) / changes


def _mean_run_len_str(sample: pa.Array) -> float:
    n = len(sample)
    if n <= 1:
        return float(n)
    a = sample.slice(0, n - 1)
    b = sample.slice(1, n - 1)
    eq = pa.compute.equal(a, b)
    n_eq = int(pa.compute.sum(eq.cast(pa.int8())).as_py() or 0)
    changes = (n - 1 - n_eq) + 1
    return n / changes


def _sample_blob(sample: pa.Array, avg_len: float) -> bytes:
    from choetl_spark.codecs.core import _var_data_bytes

    # bound the extraction itself: only as many rows as plausibly reach
    # the byte cap get copied (the full sample of a blob-heavy column
    # would copy tens of MB just to keep 64 KB)
    n_rows = max(int(_SAMPLE_BYTES / max(avg_len, 1.0)) + 1, 16)
    if n_rows < len(sample):
        sample = sample.slice(0, n_rows)
    blob = _var_data_bytes(sample)
    return blob[:_SAMPLE_BYTES]
