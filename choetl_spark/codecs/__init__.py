"""Codec registry: top-level encode/decode with null handling + zstd pass.

    payload, meta = encode_array(arr, codec="auto" | name, zstd="auto")
    arr = decode_array(payload, meta)

``meta`` is a JSON-safe dict; the registry handles the null bitmap and
the optional zstd entropy pass so individual codecs stay null-free and
composable.
"""

from __future__ import annotations

import pyarrow as pa

from choetl_spark.codecs import zstd as _zstd
from choetl_spark.codecs.base import apply_nulls, split_nulls
from choetl_spark.codecs.core import (
    decode_bitpack,
    decode_delta,
    decode_dict,
    decode_foref,
    decode_plain,
    decode_rle,
    encode_bitpack,
    encode_delta,
    encode_dict,
    encode_foref,
    encode_plain,
    encode_rle,
)
from choetl_spark.codecs.core import encode_plain_parts
from choetl_spark.codecs.alp import decode_alp, encode_alp
from choetl_spark.codecs.fsst import decode_fsst, encode_fsst
from choetl_spark.codecs.veclist import (
    decode_veclist,
    encode_veclist,
    encode_veclist_parts,
)
from choetl_spark.codecs.worddict import (
    decode_worddict,
    encode_worddict,
    encode_worddict_parts,
)

_ENCODERS = {
    "plain": encode_plain,
    "bitpack": encode_bitpack,
    "delta": encode_delta,
    "foref": encode_foref,
    "rle": encode_rle,
    "dict": encode_dict,
    "fsst": encode_fsst,
    "worddict": encode_worddict,
    "veclist": encode_veclist,
    "alp": encode_alp,
}

_PART_ENCODERS = {
    # codecs whose payload can reach the zstd pass as PARTS (see
    # zstd.wrap_parts); everything else assembles as before
    "plain": encode_plain_parts,
    "worddict": encode_worddict_parts,
    "veclist": encode_veclist_parts,
}

_DECODERS = {
    "plain": decode_plain,
    "bitpack": decode_bitpack,
    "delta": decode_delta,
    "foref": decode_foref,
    "rle": decode_rle,
    "dict": decode_dict,
    "fsst": decode_fsst,
    "worddict": decode_worddict,
    "veclist": decode_veclist,
    "alp": decode_alp,
}


def encode_array(
    arr: pa.Array,
    codec: str = "auto",
    zstd: str = "off",
    zstd_level: int = 3,
    **opts,
) -> tuple[bytes, dict]:
    """Encode a pa.Array. codec="auto" delegates to the selector."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if codec == "auto":
        from choetl_spark.selector import choose_codec

        codec, opts = choose_codec(arr)
    null_meta, filled = split_nulls(arr)
    if codec in _PART_ENCODERS and zstd in ("auto", "on"):
        # hot path: hand zstd the payload PARTS (e.g. plain's lengths
        # header + the zero-copy Arrow value-bytes view) so the
        # payload-sized assembly memcpy never happens; on-disk format
        # is identical (concatenated zstd frames decompress as one)
        parts, meta = _PART_ENCODERS[codec](filled, **opts)
        if null_meta["n_nulls"]:
            meta["nulls"] = null_meta
        return _zstd.wrap_parts(parts, meta, level=zstd_level)
    payload, meta = _ENCODERS[codec](filled, **opts)
    if null_meta["n_nulls"]:
        meta["nulls"] = null_meta
    if zstd in ("auto", "on"):
        payload, meta = _zstd.wrap(payload, meta, level=zstd_level)
    return payload, meta


def decode_array(payload: bytes, meta: dict) -> pa.Array:
    if meta["codec"] == "zstd":
        payload, meta = _zstd.unwrap(payload, meta)
    arr = _DECODERS[meta["codec"]](payload, meta)
    if "nulls" in meta:
        arr = apply_nulls(arr, meta["nulls"])
    return arr
