"""ALP — adaptive lossless floating-point compression (Afroozeh &
Boncz, "ALP: Adaptive Lossless floating-Point compression", VLDB 2023;
the FastLanes float codec, also adopted by DuckDB/Vortex).

The observation: real-world doubles are overwhelmingly DECIMALS — a
price 19.99, a rate 0.0452, a rounded measurement — i.e. some integer
divided by a power of ten. Such values round-trip EXACTLY through

    d = round(v * 10**e);   v == d / 10**e   (same float64 ops)

for the right ``e``, so the column becomes an INTEGER column (tight
frame-of-reference bit-packing, this module) instead of 8 random-
looking bytes zstd can't touch. Values that don't conform at the
chunk's chosen exponent — true reals, NaN/Inf, -0.0 (bit-distinct
from +0.0 but == it) — are EXCEPTIONS: stored verbatim (position +
raw bits) and patched over the decoded vector.

This is the simplified single-exponent form (the paper's (e, f) pair
adds a second division; one exponent already captures the
fixed-decimal shape that dominates). Everything is vectorized numpy;
exactness is verified per value AT ENCODE TIME with byte-identical
semantics to the decode expression, so the round-trip is bit-exact by
construction — the engine's contract.

Chunk layout: ``packed ints (frame-of-reference, bit-packed) ||
exception positions (uint32 LE) || exception bits (raw 4/8-byte LE)``
with offsets derivable from meta. float32 runs the same pipeline in
float64 and verifies exactness on the float32 bit pattern.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from choetl_spark.codecs.base import (
    bit_width,
    pack_uints,
    type_to_str,
    unpack_uints,
)

__all__ = ["encode_alp", "decode_alp", "alp_sample_exponent"]

_MAX_E = 14  # 10**14 is exact in float64; beyond it scaling is lossy
_SAFE = float(1 << 62)  # |scaled| bound so int64 conversion is safe


def _f64(arr: pa.Array) -> tuple[np.ndarray, bool]:
    """(values as float64, is_float32) — nulls must be pre-filled."""
    if pa.types.is_float32(arr.type):
        return np.asarray(arr.to_numpy(zero_copy_only=False), np.float64), True
    return np.ascontiguousarray(
        arr.to_numpy(zero_copy_only=False)
    ).astype(np.float64, copy=False), False


def _exact_mask(v64: np.ndarray, e: int, f32: bool) -> np.ndarray:
    """True where round(v*10^e)/10^e reproduces v BIT-identically
    (the same expressions decode uses)."""
    scale = np.float64(10.0**e)
    with np.errstate(invalid="ignore", over="ignore"):
        d = np.round(v64 * scale)
        ok = np.isfinite(d) & (np.abs(d) < _SAFE)
        # replicate decode EXACTLY, including the int64 hop — it is
        # what turns -0.0 into +0.0 and must classify it an exception
        back = np.where(ok, d, 0.0).astype(np.int64).astype(
            np.float64
        ) / scale
    if f32:
        same = back.astype(np.float32).view(np.uint32) == v64.astype(
            np.float32
        ).view(np.uint32)
    else:
        same = back.view(np.uint64) == v64.view(np.uint64)
    return ok & same


def alp_sample_exponent(
    v64: np.ndarray, f32: bool, sample: int = 512
) -> tuple[int, float]:
    """(best exponent, exact fraction) on an evenly-STRIDED sample —
    a head slice would miss a decimal-prefix/random-tail chunk (the
    same hazard the delta estimator documents), so the probe spans
    the whole chunk. Deterministic for a given chunk."""
    if len(v64) == 0:
        return 0, 1.0
    stride = max(1, len(v64) // sample)
    probe = v64[::stride][:sample]
    best_e, best_n = 0, -1
    for e in range(_MAX_E + 1):
        n_ok = int(_exact_mask(probe, e, f32).sum())
        if n_ok > best_n:
            best_e, best_n = e, n_ok
        if n_ok == len(probe):
            break
    return best_e, best_n / len(probe)


def encode_alp(arr: pa.Array, exponent: int | None = None) -> tuple[bytes, dict]:
    v64, f32 = _f64(arr)
    if exponent is None:
        exponent, _ = alp_sample_exponent(v64, f32)
    exact = _exact_mask(v64, exponent, f32)
    scale = np.float64(10.0**exponent)
    with np.errstate(invalid="ignore", over="ignore"):
        d = np.round(v64 * scale)
    # exception slots get an IN-RANGE placeholder (the first exact
    # value), not 0 — a 0 would drag the frame-of-reference min to 0
    # and inflate the packed width several-fold on high-offset columns
    fill = float(d[exact][0]) if exact.any() else 0.0
    ints = np.where(exact, d, fill).astype(np.int64)
    ref = int(ints.min()) if len(ints) else 0
    deltas = (ints - np.int64(ref)).astype(np.uint64)
    w = bit_width(int(deltas.max())) if len(deltas) else 0
    packed = pack_uints(deltas, w)
    exc_pos = np.flatnonzero(~exact).astype(np.uint32)
    if f32:
        raw = np.asarray(arr.to_numpy(zero_copy_only=False), np.float32)
        exc_bits = raw[exc_pos].tobytes()
    else:
        exc_bits = v64[exc_pos].tobytes()
    payload = packed + exc_pos.tobytes() + exc_bits
    meta = {
        "codec": "alp",
        "dtype": type_to_str(arr.type),
        "n": len(arr),
        "e": int(exponent),
        "ref": ref,
        "width": w,
        "n_exc": int(len(exc_pos)),
        "packed_len": len(packed),
    }
    return payload, meta


def decode_alp(payload: bytes, meta: dict) -> pa.Array:
    n, w = meta["n"], meta["width"]
    plen = meta["packed_len"]
    n_exc = meta["n_exc"]
    f32 = meta["dtype"] == "float32"
    deltas = unpack_uints(payload[:plen], n, w)
    ints = deltas.astype(np.int64) + np.int64(meta["ref"])
    scale = np.float64(10.0 ** meta["e"])
    vals = ints.astype(np.float64) / scale
    if f32:
        out = vals.astype(np.float32)
        item = 4
    else:
        out = vals
        item = 8
    if n_exc:
        pos = np.frombuffer(
            payload[plen : plen + 4 * n_exc], dtype=np.uint32
        )
        bits = np.frombuffer(
            payload[plen + 4 * n_exc : plen + 4 * n_exc + item * n_exc],
            dtype=np.float32 if f32 else np.float64,
        )
        out = out.copy()
        out[pos] = bits
    return pa.array(out, pa.float32() if f32 else pa.float64())
