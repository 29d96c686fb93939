"""General-purpose entropy pass over an already-encoded payload.

The lightweight codecs (dict/rle/fsst/bitpack/foref) remove structural
redundancy; a final zstd pass (via pyarrow's bundled codec) removes the
residual entropy so the total footprint stays at or below the reference
Parquet+zstd baseline (see SURVEY.md §7 "What's hard"). The pre-pass size
is kept in the meta so the lightweight-codec win stays visible in stats.
"""

from __future__ import annotations

import pyarrow as pa

_CODECS = {
    1: pa.Codec("zstd", compression_level=1),
    3: pa.Codec("zstd", compression_level=3),
}


def compress(payload: bytes, level: int = 3) -> bytes:
    codec = _CODECS.get(level) or pa.Codec("zstd", compression_level=level)
    return codec.compress(payload, asbytes=True)


def decompress(payload: bytes, raw_len: int) -> bytes:
    # decompression is level-agnostic in zstd's frame format
    return _CODECS[3].decompress(
        payload, decompressed_size=raw_len, asbytes=True
    )


def wrap(payload: bytes, meta: dict, level: int = 3) -> tuple[bytes, dict]:
    """Apply zstd if it shrinks the payload; otherwise return unchanged.

    ``level`` is the profile's speed/ratio knob: level 1 compresses the
    worddict index stream ~2.7x faster than level 3 for ~10% more bytes
    (measured on the synthetic web text) — the right end of the curve
    for throughput-biased profiles."""
    if len(payload) < 64:
        return payload, meta
    z = compress(payload, level)
    if len(z) >= len(payload):
        return payload, meta
    return z, {
        "codec": "zstd",
        "raw_len": len(payload),
        "pre_zstd_bytes": len(payload),
        "child": meta,
    }


def unwrap(payload: bytes, meta: dict) -> tuple[bytes, dict]:
    return decompress(payload, meta["raw_len"]), meta["child"]
