"""FSST-style string compression (pure NumPy/bytes, vectorized).

A from-scratch variant of FSST (Boncz, Neumann, Leis — "FSST: Fast Random
Access String Compression", VLDB 2020, see PAPERS.md): a per-chunk symbol
table of frequent substrings, each encoded as a single code byte.

Differences from the paper, chosen for pure-Python throughput:

- Output alphabet split: code bytes are 0x80..0xFE (127 symbols); input
  bytes >= 0x80 are escaped as (0xFF, byte). Symbols are restricted to
  pure-ASCII (< 0x80) substrings of length 2..8. This makes the encoder a
  sequence of C-speed ``bytes.replace`` passes — a replaced region
  contains bytes >= 0x80 which can never match a later (pure-ASCII)
  symbol, so passes are order-safe.
- Symbol mining: frequency count of 2/3/4/6/8-grams over a bounded
  sample, greedy pick by saved bytes ((len-1) * count), applied
  longest-first.

For ASCII-dominated text (urls, extracted web text) this yields FSST-like
ratios; for high-bit-heavy input the escape overhead makes it lose, which
the selector's ``ascii_frac`` stat screens out up front.

Decode is fully vectorized: a per-byte output-length LUT + cumsum gives
output offsets, then one scatter per code value (<= 127 * 8 numpy ops).

The whole blob of a chunk is encoded as one byte stream with the source
string offsets stored (frame-of-reference packed) in the meta, so symbol
matches may legally cross string boundaries; splitting happens after the
lossless blob decode.
"""

from __future__ import annotations

import base64


import numpy as np
import pyarrow as pa

from choetl_spark.codecs.base import (
    bit_width,
    pack_uints,
    str_to_type,
    type_to_str,
    unpack_uints,
)
from choetl_spark.codecs.core import _strings_from_blob, _var_data_bytes

_CODE_BASE = 0x80
_MAX_SYMBOLS = 0x7F  # 0x80..0xFE
_ESCAPE = 0xFF
_SAMPLE_BYTES = 1 << 16
_GRAM_LENS = (8, 6, 4, 3, 2)


def build_symbol_table(blob: bytes, max_symbols: int = _MAX_SYMBOLS) -> list[bytes]:
    """Mine frequent pure-ASCII substrings from a sample of ``blob``.

    Counting is fully vectorized: for each gram length the sample's
    sliding windows are viewed as fixed-width void scalars and counted
    with one ``np.unique`` — no Python-level loop over positions."""
    sample = blob[:_SAMPLE_BYTES]
    if not sample:
        return []
    a = np.frombuffer(sample, dtype=np.uint8).astype(np.uint64)
    scored: list[tuple[int, bytes]] = []
    top_k = max(max_symbols * 3, 96)
    for glen in _GRAM_LENS:
        if len(a) < glen:
            continue
        step = 1 if glen <= 3 else 2  # stride longer grams to bound work
        # pack each window LOSSLESSLY into a uint64 key (byte j -> bits
        # 8j..8j+7); unique on ints is radix-fast vs memcmp on voids
        m = len(a) - glen + 1
        key = np.zeros(m, dtype=np.uint64)
        ascii_ok = np.ones(m, dtype=bool)
        for j in range(glen):
            byte_j = a[j : j + m]
            key |= byte_j << np.uint64(8 * j)
            ascii_ok &= byte_j < 0x80
        key = key[::step][ascii_ok[::step]]
        if len(key) == 0:
            continue
        grams, cnts = np.unique(key, return_counts=True)
        if len(cnts) > top_k:  # python loop below must stay tiny
            sel = np.argpartition(cnts, -top_k)[-top_k:]
            grams, cnts = grams[sel], cnts[sel]
        keep = cnts >= 3
        grams, cnts = grams[keep], cnts[keep]
        gram_bytes = grams.astype("<u8").tobytes()
        for i, cnt in enumerate(cnts.tolist()):
            g = gram_bytes[i * 8 : i * 8 + glen]
            scored.append(((glen - 1) * cnt * step, g))
    scored.sort(key=lambda t: (-t[0], t[1]))
    picked = [g for _, g in scored[:max_symbols]]
    # apply longest-first so long matches win before their prefixes
    picked.sort(key=lambda s: (-len(s), s))
    return picked


def _escape_high_bytes(blob: bytes) -> bytes:
    a = np.frombuffer(blob, dtype=np.uint8)
    mask = a >= 0x80
    n_esc = int(mask.sum())
    if n_esc == 0:
        return blob
    n = len(a)
    out = np.empty(n + n_esc, dtype=np.uint8)
    # position of each original byte in output: index + escapes before it
    esc_before = np.cumsum(mask) - mask  # escapes strictly before position
    pos = np.arange(n, dtype=np.int64) + esc_before
    out[pos + mask] = a  # escaped bytes shift one right for the marker
    out[pos[mask]] = _ESCAPE
    return out.tobytes()


_SEGMENT = 256 << 10  # run all passes on L2-resident segments: the
# replace passes then stream from cache, not DRAM — ~3x total DRAM
# traffic instead of ~(n_symbols)x, which is what lets 32 concurrent
# workers scale instead of fighting for memory bandwidth. A symbol match
# spanning a segment boundary is merely missed (tiny ratio loss); decode
# is unaffected because a concatenation of valid streams is valid.


def compress_blob(blob: bytes, symbols: list[bytes]) -> bytes:
    codes = [bytes([_CODE_BASE + i]) for i in range(len(symbols))]
    out = []
    for s in range(0, len(blob), _SEGMENT) or [0]:
        data = _escape_high_bytes(blob[s : s + _SEGMENT])
        for sym, code in zip(symbols, codes):
            data = data.replace(sym, code)
        out.append(data)
    return b"".join(out)


def decompress_blob(data: bytes, symbols: list[bytes]) -> bytes:
    if not data:
        return b""
    a = np.frombuffer(data, dtype=np.uint8)
    n = len(a)
    sym_lens = np.zeros(256, dtype=np.int64)
    for i, sym in enumerate(symbols):
        sym_lens[_CODE_BASE + i] = len(sym)
    if data.find(b"\xff") < 0:
        # fast path (pure-ASCII source): no escapes, every >=0x80 is a code
        is_code = a >= _CODE_BASE
        is_marker = np.zeros(n, dtype=bool)
        lens = np.ones(n, dtype=np.int64)
        lens[is_code] = sym_lens[a[is_code]]
    else:
        # --- pair escapes: within each run of 0xFF, even offsets are markers
        is_ff = a == _ESCAPE
        idx = np.arange(n, dtype=np.int64)
        run_start = np.where(
            is_ff & ~np.concatenate(([False], is_ff[:-1])), idx, -1
        )
        run_start = np.maximum.accumulate(run_start)
        in_run_off = idx - run_start
        is_marker = is_ff & (in_run_off % 2 == 0)
        is_escaped_lit = np.zeros(n, dtype=bool)
        marker_pos = np.flatnonzero(is_marker)
        marker_pos = marker_pos[marker_pos + 1 < n]  # guard truncated tail
        is_escaped_lit[marker_pos + 1] = True
        # --- output length per input byte
        lens = np.ones(n, dtype=np.int64)  # default: literal ASCII byte
        is_code = (a >= _CODE_BASE) & ~is_ff & ~is_escaped_lit
        lens[is_code] = sym_lens[a[is_code]]
        lens[is_marker] = 0
        lens[is_escaped_lit] = 1
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    out = np.empty(out_off[-1], dtype=np.uint8)
    # literals (plain ASCII + escaped)
    lit_mask = (~is_code) & (~is_marker)
    lit_pos = np.flatnonzero(lit_mask)
    out[out_off[lit_pos]] = a[lit_pos]
    # symbols: bucket code positions by code value with ONE stable argsort,
    # then a slice + <=8 scatters per code (instead of a scan per code)
    code_pos = np.flatnonzero(is_code)
    if len(code_pos):
        codes = (a[code_pos] - _CODE_BASE).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        counts = np.bincount(codes, minlength=len(symbols))
        starts = np.cumsum(counts) - counts
        for i, sym in enumerate(symbols):
            cnt = counts[i]
            if cnt == 0:
                continue
            base = out_off[code_pos[order[starts[i] : starts[i] + cnt]]]
            for k, bv in enumerate(sym):
                out[base + k] = bv
    return out.tobytes()


def encode_fsst(arr: pa.Array, max_symbols: int = 48) -> tuple[bytes, dict]:
    """max_symbols trades ratio for speed (cost is linear in table size);
    48 is the balanced default — see selector profiles."""
    t = arr.type
    if not (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        raise TypeError("fsst operates on string/binary arrays")
    lengths = np.asarray(pa.compute.binary_length(arr).cast(pa.int64()))
    blob = _var_data_bytes(arr)
    symbols = build_symbol_table(blob, max_symbols)
    data = compress_blob(blob, symbols)
    lw = bit_width(int(lengths.max())) if len(lengths) else 0
    len_payload = pack_uints(lengths.astype(np.uint64), lw)
    meta = {
        "codec": "fsst",
        "dtype": type_to_str(t),
        "n": len(arr),
        "len_width": lw,
        "len_bytes": len(len_payload),
        "symbols_b64": [base64.b64encode(s).decode("ascii") for s in symbols],
    }
    return len_payload + data, meta


def decode_fsst(payload: bytes, meta: dict) -> pa.Array:
    t = str_to_type(meta["dtype"])
    n = meta["n"]
    lb = meta["len_bytes"]
    lengths = unpack_uints(payload[:lb], n, meta["len_width"]).astype(np.int64)
    symbols = [base64.b64decode(s) for s in meta["symbols_b64"]]
    blob = decompress_blob(payload[lb:], symbols)
    return _strings_from_blob(blob, lengths, t)
