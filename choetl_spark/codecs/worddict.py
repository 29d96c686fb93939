"""Token-dictionary codec for word-separated text ("worddict").

A codec the reference does not have (its Parquet dictionary encoding is
whole-value only, delegated to Parquet.Net — reference
src/ChoETL.Parquet/ChoParquetRecordWriter.cs:191-212): natural-language
text rarely repeats whole values, but repeats *words* heavily (Zipf), so
we split each value on the single byte 0x20, dictionary-encode the token
stream, bit-pack the indices, and encode the (small) vocabulary with a
child codec (FSST by default — the vocabulary is exactly the dense ASCII
blob FSST is good at).

Encode is all C-speed Arrow kernels (``split_pattern`` →
``dictionary_encode``) plus the block-vectorized bit-packer; decode is
``take`` + ``binary_join``. Reconstruction is exact for any input: split
on a single space preserves empty tokens between consecutive spaces, and
``binary_join`` with the same separator inverts it byte-identically.

Values containing no separator at all degrade to whole-value dictionary
coding; the selector's ``space_frac`` stat screens those out up front.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from choetl_spark.codecs.base import (
    bit_width,
    pack_uints,
    str_to_type,
    type_to_str,
    unpack_uints,
)

_SEP = " "


def _split_tokens(arr: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """(flat token array, tokens-per-row) == flattened
    ``split_pattern(arr, " ")``.

    Measured note: a numpy-on-raw-buffers splitter (boolean-compress the
    separator bytes out of the values buffer, scatter the merged
    boundary stream — no sort needed since each row's separators lie
    between its offsets) was prototyped and is byte-identical, but lands
    at ~1.0s/165MB vs 0.78s for Arrow's C++ kernel: the boolean gather
    and flatnonzero alone cost more than memchr-based splitting. Arrow's
    kernel stays.
    """
    toks = pc.split_pattern(arr, _SEP)  # works for string AND binary
    return (
        pc.list_flatten(toks),
        np.asarray(pc.list_value_length(toks).cast(pa.int64())),
    )


def encode_worddict_parts(
    arr: pa.Array, values_codec: str = "fsst", **_opts
) -> tuple[list, dict]:
    """Worddict encode as buffer-protocol PARTS (row widths, index
    stream, vocab payload) whose concatenation is the worddict payload —
    the zstd pass (``zstd.wrap_parts``) compresses them without the
    triple-concat copy, and the index stream rides as a byte view over
    the astype'd numpy array (no ``tobytes`` copy)."""
    from choetl_spark.codecs import encode_array  # registry, avoids cycle

    t = arr.type
    if not (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        raise TypeError("worddict operates on string/binary arrays")
    flat, ntoks_per_row = _split_tokens(arr)
    d = pc.dictionary_encode(flat)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    # index layout: BYTE-ALIGNED min-width uints, not bit-packed.
    # Measured (8.6M tokens, 1.1k vocab): astype(uint16) is ~10x faster
    # than the bit-packer AND the final zstd pass compresses the aligned
    # stream ~14% SMALLER (byte-aligned token ids expose repetition
    # zstd's match finder can model; packed ids smear it across byte
    # boundaries). Aligned wins both axes, so it is unconditional;
    # decode keeps reading the legacy bit-packed layout.
    idx = np.asarray(d.indices)  # int32 from arrow, no copy
    n_vocab = len(d.dictionary)
    if n_vocab <= 1 << 8:
        idx_dtype = np.uint8
    elif n_vocab <= 1 << 16:
        idx_dtype = np.uint16
    else:
        idx_dtype = np.uint32
    idx_arr = np.ascontiguousarray(idx.astype(idx_dtype))
    w = int(idx_arr.dtype.itemsize * 8)
    # vocab: the distinct tokens, child-encoded (fsst shines here)
    val_payload, val_meta = encode_array(d.dictionary, codec=values_codec)
    # tokens-per-row: bitpacked (rows with k tokens have k-1 separators)
    tw = max(bit_width(int(ntoks_per_row.max())), 1) if len(ntoks_per_row) else 0
    row_payload = pack_uints(ntoks_per_row, tw)
    meta = {
        "codec": "worddict",
        "dtype": type_to_str(t),
        "n": len(arr),
        "n_tokens": int(len(idx)),
        "idx_width": w,
        "idx_layout": "aligned",
        "idx_bytes": idx_arr.nbytes,
        "row_width": tw,
        "row_bytes": len(row_payload),
        "values": val_meta,
    }
    return [row_payload, idx_arr.data.cast("B"), val_payload], meta


def encode_worddict(
    arr: pa.Array, values_codec: str = "fsst", **_opts
) -> tuple[bytes, dict]:
    from choetl_spark.codecs.zstd import assemble_parts

    parts, meta = encode_worddict_parts(arr, values_codec=values_codec)
    return bytes(assemble_parts(parts)), meta


def decode_worddict(payload: bytes, meta: dict) -> pa.Array:
    from choetl_spark.codecs import decode_array

    n = meta["n"]
    rb = meta["row_bytes"]
    ib = meta["idx_bytes"]
    ntoks = unpack_uints(payload[:rb], n, meta["row_width"]).astype(np.int64)
    if meta.get("idx_layout") == "aligned":
        idx = np.frombuffer(
            payload[rb : rb + ib],
            dtype={8: np.uint8, 16: np.uint16, 32: np.uint32}[
                meta["idx_width"]
            ],
        ).astype(np.int64)
    else:  # legacy bit-packed layout
        idx = unpack_uints(
            payload[rb : rb + ib], meta["n_tokens"], meta["idx_width"]
        ).astype(np.int64)
    vocab = decode_array(payload[rb + ib :], meta["values"])
    flat = vocab.take(pa.array(idx))
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(ntoks, out=off[1:])
    lst = pa.LargeListArray.from_arrays(pa.array(off), flat)
    t = str_to_type(meta["dtype"])
    vt = flat.type
    sep = pa.scalar(
        _SEP.encode()
        if pa.types.is_binary(vt) or pa.types.is_large_binary(vt)
        else _SEP,
        type=vt,
    )
    joined = pc.binary_join(lst, sep)
    if not joined.type.equals(t):
        joined = joined.cast(t)
    return joined
