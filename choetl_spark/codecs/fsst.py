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
from collections import Counter

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
    """Mine frequent pure-ASCII substrings from a sample of ``blob``."""
    sample = blob[:_SAMPLE_BYTES]
    if not sample:
        return []
    counts: Counter[bytes] = Counter()
    for glen in _GRAM_LENS:
        if len(sample) < glen:
            continue
        step = 1 if glen <= 3 else 2  # stride longer grams to bound work
        counts.update(
            sample[i : i + glen] for i in range(0, len(sample) - glen + 1, step)
        )
    scored: list[tuple[int, bytes]] = []
    for gram, cnt in counts.items():
        if cnt < 3:
            continue
        if any(b >= 0x80 for b in gram):
            continue  # symbols must be pure ASCII (see module doc)
        scored.append(((len(gram) - 1) * cnt, gram))
    scored.sort(key=lambda t: (-t[0], t[1]))
    picked: list[bytes] = []
    seen: set[bytes] = set()
    for _, gram in scored:
        if gram in seen:
            continue
        seen.add(gram)
        picked.append(gram)
        if len(picked) >= max_symbols:
            break
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


def compress_blob(blob: bytes, symbols: list[bytes]) -> bytes:
    data = _escape_high_bytes(blob)
    for i, sym in enumerate(symbols):
        data = data.replace(sym, bytes([_CODE_BASE + i]))
    return data


def decompress_blob(data: bytes, symbols: list[bytes]) -> bytes:
    if not data:
        return b""
    a = np.frombuffer(data, dtype=np.uint8)
    n = len(a)
    # --- pair up escapes: within each run of 0xFF, even offsets are markers
    is_ff = a == _ESCAPE
    idx = np.arange(n, dtype=np.int64)
    run_start = np.where(is_ff & ~np.concatenate(([False], is_ff[:-1])), idx, -1)
    run_start = np.maximum.accumulate(run_start)
    in_run_off = idx - run_start
    is_marker = is_ff & (in_run_off % 2 == 0)
    is_escaped_lit = np.zeros(n, dtype=bool)
    marker_pos = np.flatnonzero(is_marker)
    marker_pos = marker_pos[marker_pos + 1 < n]  # guard truncated tail
    is_escaped_lit[marker_pos + 1] = True
    # non-FF bytes directly after a marker are escaped literals too;
    # FF bytes after a marker were already odd-offset (handled above)
    # --- output length per input byte
    lens = np.ones(n, dtype=np.int64)  # default: literal ASCII byte
    sym_lens = np.zeros(256, dtype=np.int64)
    for i, sym in enumerate(symbols):
        sym_lens[_CODE_BASE + i] = len(sym)
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
    # symbols: one scatter per (code, byte-in-symbol)
    for i, sym in enumerate(symbols):
        cpos = np.flatnonzero(a == (_CODE_BASE + i))
        if len(cpos) == 0:
            continue
        cpos = cpos[is_code[cpos]]
        if len(cpos) == 0:
            continue
        base = out_off[cpos]
        for k, bv in enumerate(sym):
            out[base + k] = bv
    return out.tobytes()


def encode_fsst(arr: pa.Array) -> tuple[bytes, dict]:
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
    symbols = build_symbol_table(blob)
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
