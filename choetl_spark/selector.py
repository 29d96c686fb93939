"""Stats-driven codec auto-selector.

Candidate codecs per dtype family, estimated encoded size per candidate
from :class:`~choetl_spark.stats.ChunkStats`, cheapest wins (ties broken
toward decode speed). A per-column override map — the analog of ChoETL's
pluggable FieldTypeAssessor (reference
src/ChoETL/Common/ChoFieldTypeAssessor.cs:17-36) — short-circuits the
model.

Estimates are deliberately coarse: the zstd entropy pass in the registry
(measured, kept only if smaller) backstops any over-optimistic pick.
"""

from __future__ import annotations

import math

import pyarrow as pa

from choetl_spark.codecs.base import bit_width, is_int_like
from choetl_spark.stats import ChunkStats, compute_stats

# decode-speed preference for tie-breaking (lower = faster decode)
_DECODE_COST = {
    "plain": 0,
    "bitpack": 1,
    "foref": 1,
    "delta": 2,  # unzigzag + cumsum on top of the unpack
    "rle": 2,
    "dict": 3,
    "worddict": 3,
    "fsst": 4,
    "alp": 2,  # unpack + one float divide + exception patch
}


def estimate_sizes(arr: pa.Array, st: ChunkStats) -> dict[str, float]:
    """Estimated encoded bytes per applicable codec."""
    t = arr.type
    n = max(st.n, 1)
    est: dict[str, float] = {"plain": float(st.data_bytes)}
    ndv = max(st.ndv, 1)
    n_runs = n / max(st.mean_run_len, 1.0)
    if is_int_like(t):
        if st.min_val is not None:
            if st.min_val >= 0:
                w = bit_width(st.max_val)
                est["bitpack"] = n * w / 8 + 16
            span_w = bit_width(st.max_val - st.min_val)
            est["foref"] = n * span_w / 8 + 24
            if st.delta_width is not None:
                # sample-derived width; the true pack width can exceed it
                # on a lucky prefix, so demand a strict win over foref
                # (the +8 constant keeps exact ties on foref's side)
                est["delta"] = n * st.delta_width / 8 + 32
            val_w = bit_width(max(st.max_val - st.min_val, 1))
            est["rle"] = n_runs * (val_w + bit_width(int(n))) / 8 + 32
        if ndv < n / 2:
            idx_w = max(bit_width(ndv - 1), 1)
            est["dict"] = n * idx_w / 8 + ndv * 8 + 32
    elif pa.types.is_floating(t):
        if st.mean_run_len > 2.0:
            est["rle"] = n_runs * (8 + bit_width(int(n)) / 8) + 32
        if ndv < n / 4:
            idx_w = max(bit_width(ndv - 1), 1)
            est["dict"] = n * idx_w / 8 + ndv * 8 + 32
        if n >= 64:
            # ALP (Afroozeh & Boncz VLDB'23): decimal columns become
            # tightly-packed ints. Probe a head sample for the best
            # exponent + conforming fraction; estimate = packed width
            # from the sampled int span + verbatim exceptions. The
            # sample makes this a measured estimate, same discipline
            # as the fsst/worddict trials.
            from choetl_spark.codecs.alp import (
                _exact_mask,
                _f64,
                alp_sample_exponent,
            )

            v64, f32 = _f64(arr)
            e, frac = alp_sample_exponent(v64, f32)
            item = 4 if f32 else 8
            if frac >= 0.5:
                import numpy as _np

                head = v64[:512]
                m = _exact_mask(head, e, f32)
                if m.any():
                    d = _np.round(
                        head[m] * _np.float64(10.0**e)
                    ).astype(_np.int64)
                    span = int(d.max() - d.min()) if len(d) else 0
                    w = bit_width(max(span, 1))
                else:
                    w = 64
                # EVERY row pays a packed slot (exceptions included);
                # exceptions add position + verbatim bits on top
                est["alp"] = (
                    n * w / 8 + n * (1 - frac) * (item + 4) + 48
                )
    else:  # string / binary
        avg = max(st.avg_len, 1.0)
        if ndv < n / 2:
            idx_w = max(bit_width(ndv - 1), 1)
            # distinct values stored once (fsst-able themselves, est plain)
            est["dict"] = n * idx_w / 8 + ndv * (avg + 4) + 64
        if st.ascii_frac > 0.88 and st.byte_entropy < 6.5 and avg >= 4:
            # fsst: symbols cover ~entropy/8 of bytes; heuristic ratio
            ratio = max(0.35, min(0.8, st.byte_entropy / 8.0))
            est["fsst"] = st.data_bytes * ratio + 1200
        if st.tok_ndv > 1 and st.space_frac > 0.05:
            # worddict: n_tokens * idx_bits + vocab (child-fsst'd) + row lens
            n_toks = st.data_bytes * st.space_frac + n
            idx_bits = max(math.log2(st.tok_ndv), 1.0)
            vocab_bytes = st.tok_ndv * max(st.avg_tok_len, 1.0) * 0.7
            est["worddict"] = n_toks * idx_bits / 8 + vocab_bytes + n * 2 + 96
    return est


# optimize_for profiles: fsst symbol-table size is the main speed/ratio
# lever (encode+decode cost are linear in table size). Measured on the
# synthetic web text (11 MB blob, one core):
#   fsst127+zstd ratio 0.241 @  6 MB/s | fsst48+zstd 0.248 @ 13 MB/s
#   fsst16+zstd  ratio 0.253 @ 25 MB/s | plain+zstd  0.260 @ 231 MB/s
_PROFILE_FSST_SYMBOLS = {"ratio": 127, "balanced": 48, "speed": 16}

# measured micro-trial (string codecs only): the size estimates cannot
# model the zstd entropy backstop, which often makes plain+zstd land
# within a few percent of a 10-15x-slower symbol-table codec (e.g. urls:
# fsst+zstd 0.0911 vs plain+zstd 0.0932 — a 2% footprint win at 1/15th
# the speed). So when the estimate picks fsst/worddict, both pipelines
# run zstd-inclusive on a deterministic head sample and the expensive
# codec must beat plain+zstd by the profile's margin to keep the pick.
#
# The balanced margin (0.72) is a COST-BENEFIT gate, not a tie-breaker:
# a symbol-table codec costs ~2-2.5x the plain+zstd encode, so balanced
# keeps it only when it buys >=28% footprint. Measured on the synthetic
# web table (93 MB chunks, one core):
#   text: worddict+z 0.149 vs plain+z 0.260 (0.57x) at 2.0x cost
#         -> ~22 MB saved per extra CPU-second  -> keep
#   html: worddict+z 0.196 vs plain+z 0.257 (0.76x) at 2.5x cost
#         -> ~8 MB saved per extra CPU-second   -> plain+zstd
# The gate moved the balanced profile from 83 MB/s to ~127 MB/s per core
# while keeping ~80% of its footprint advantage over the speed profile.
# The ratio profile keeps every measured win (margin 1.0).
_TRIAL_ROWS = 256
_TRIAL_MARGIN = {"balanced": 0.72, "ratio": 1.0}


def zstd_level_for(codec: str, optimize_for: str) -> int:
    """zstd level per payload kind (measured, not per profile): on RAW
    web text level 1 is no faster than 3 (~238 MB/s both) and ~9% bigger,
    so plain/fsst payloads always use 3; the worddict byte-aligned index
    stream compresses 2.7x faster at level 1 for ~10% more bytes, the
    right trade everywhere except the ratio profile."""
    if codec == "worddict" and optimize_for != "ratio":
        return 1
    return 3


def _sample_trial(
    arr: pa.Array, name: str, opts: dict, optimize_for: str
) -> str:
    from choetl_spark.codecs import encode_array  # registry, avoids cycle

    sample = arr.slice(0, min(len(arr), _TRIAL_ROWS))
    try:
        cand, _ = encode_array(
            sample, codec=name, zstd="auto",
            zstd_level=zstd_level_for(name, optimize_for), **opts
        )
        plain, _ = encode_array(sample, codec="plain", zstd="auto")
    except (ValueError, TypeError):  # pragma: no cover - defensive
        return name
    if name == "alp":
        # alp decode is cheap (one divide + patch, cost tier 2); the
        # trial only needs to catch a mis-estimated chunk (random tail
        # behind a decimal head) where alp LOSES to plain outright —
        # not to demand the symbol-table codecs' 28% win
        margin = 0.98
    else:
        margin = _TRIAL_MARGIN.get(optimize_for, 0.88)
    return name if len(cand) < len(plain) * margin else "plain"


def choose_codec(
    arr: pa.Array,
    st: ChunkStats | None = None,
    override: str | None = None,
    optimize_for: str = "balanced",
    trial_cache: dict | None = None,
) -> tuple[str, dict]:
    """Return (codec_name, codec_opts) for an array chunk.

    ``trial_cache`` (one dict per column per task) memoizes the measured
    sample-trial outcome so only the first chunk of a column pays the
    trial encode; subsequent chunks whose estimate picks the same codec
    reuse the verdict."""
    if override:
        return override, {}
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        # vector columns have exactly one native layout (lengths +
        # shuffled value planes); the zstd backstop still measures
        return "veclist", {}
    if st is None:
        st = compute_stats(arr)
    est = estimate_sizes(arr, st)
    if optimize_for == "speed" and not is_int_like(arr.type):
        # speed profile: string columns skip the tokenizer/symbol-table
        # codecs (the zstd entropy pass still runs, measured ~3-4x the
        # worddict encode rate at ~1.25x the footprint); dict stays — low
        # NDV makes it cheap AND small
        est.pop("fsst", None)
        est.pop("worddict", None)
    best = min(est.items(), key=lambda kv: (kv[1], _DECODE_COST[kv[0]]))
    name = best[0]
    opts: dict = {}
    n_syms = _PROFILE_FSST_SYMBOLS.get(optimize_for, 48)
    if name == "fsst":
        opts["max_symbols"] = n_syms
    if name in ("fsst", "worddict", "alp") and len(arr) >= 1024:
        # measured backstop check (see _sample_trial); head slice keeps
        # the choice deterministic for a given chunk
        key = (name, n_syms)
        if trial_cache is not None and key in trial_cache:
            name = trial_cache[key]
        else:
            verdict = _sample_trial(arr, name, opts, optimize_for)
            if trial_cache is not None:
                trial_cache[key] = verdict
            name = verdict
        if name == "plain":
            opts = {}
    if name == "dict":
        t = arr.type
        if (
            pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_binary(t)
            or pa.types.is_large_binary(t)
        ):
            # dictionary values: fsst them when text-like, else plain
            opts["values_codec"] = (
                "fsst"
                if st.ascii_frac > 0.88 and st.avg_len >= 4 and st.ndv >= 16
                else "plain"
            )
    return name, opts
