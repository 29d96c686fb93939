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


def assemble_parts(parts: list) -> bytearray:
    """One-copy concatenation of buffer-protocol parts (the plain
    codec's lengths header + the Arrow value-bytes view)."""
    total = sum(len(p) for p in parts)
    out = bytearray(total)
    pos = 0
    for p in parts:
        if len(p):
            out[pos:pos + len(p)] = p
        pos += len(p)
    return out


def wrap_parts(parts: list, meta: dict, level: int = 3) -> tuple[bytes, dict]:
    """zstd over a MULTI-PART payload without assembling it first.

    Each part (a memoryview straight over the Arrow data buffer — see
    ``encode_plain_parts``) is compressed as its own zstd frame and the
    frames are concatenated. zstd's one-shot decompressor consumes
    concatenated frames as one stream, so ``unwrap``/``decompress`` and
    the on-disk format are IDENTICAL to the single-payload path — only
    the blob-sized assembly memcpy (~1.1 CPU-s/GB on the plain+zstd hot
    path) disappears. Falls back to plain assembly when zstd does not
    shrink the bytes (same contract as :func:`wrap`)."""
    total = sum(len(p) for p in parts)
    if total < 64:
        return bytes(assemble_parts(parts)), meta
    codec = _CODECS.get(level) or pa.Codec("zstd", compression_level=level)
    z = b"".join(
        codec.compress(p, asbytes=True) for p in parts if len(p)
    )
    if len(z) >= total:
        return bytes(assemble_parts(parts)), meta
    return z, {
        "codec": "zstd",
        "raw_len": total,
        "pre_zstd_bytes": total,
        "child": meta,
    }
