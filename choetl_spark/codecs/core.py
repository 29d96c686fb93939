"""Core lightweight codecs: plain, bitpack, frame-of-reference, delta, RLE, dict.

All operate on null-free arrays (nulls are split off in
``choetl_spark.codecs``'s top-level encode). Pure NumPy/Arrow — no Spark
imports — so they are unit-testable and run identically inside
``mapInArrow`` workers.

These re-own what the reference delegates to Parquet.Net
(reference src/ChoETL.Parquet/ChoParquetRecordWriter.cs:191-212 only
selects CompressionMethod; the encodings themselves live in the storage
library). Here the encodings are first-class and individually selectable
per column chunk.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from choetl_spark.codecs.base import (
    bit_width,
    data_nbytes,
    from_int_view,
    int_view,
    is_int_like,
    pack_uints,
    str_to_type,
    type_to_str,
    unpack_uints,
)

# ---------------------------------------------------------------------------
# plain
# ---------------------------------------------------------------------------


def encode_plain_parts(arr: pa.Array) -> tuple[list, dict]:
    """Plain encode as a list of buffer-protocol PARTS whose logical
    concatenation is the plain payload. The hot string/binary path
    returns ``[lengths_header, value_bytes_view]`` with the view taken
    zero-copy straight off the Arrow data buffer — the zstd pass
    (:func:`choetl_spark.codecs.zstd.wrap_parts`) compresses the parts
    without ever assembling the blob-sized intermediate. Parts may be
    memoryviews into ``arr``'s buffers: valid only while ``arr`` lives."""
    t = arr.type
    meta: dict = {"codec": "plain", "dtype": type_to_str(t), "n": len(arr)}
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(
        t
    ) or pa.types.is_large_binary(t):
        lengths = np.asarray(pa.compute.binary_length(arr).cast(pa.int64()))
        w = bit_width(int(lengths.max())) if len(lengths) else 0
        len_payload = pack_uints(lengths.astype(np.uint64), w)
        meta["len_width"] = w
        meta["len_bytes"] = len(len_payload)
        return [len_payload, _var_data_view(arr)], meta
    # .data.cast("B"): a multi-byte-dtype memoryview reports ELEMENT
    # count as its len — every parts consumer (len sums, assembly,
    # zstd raw_len) needs byte lengths
    if pa.types.is_boolean(t):
        packed = np.packbits(np.asarray(arr), bitorder="little")
        return [packed.data.cast("B")], meta
    if is_int_like(t):
        vals = int_view(arr)
        return [np.ascontiguousarray(vals, dtype="<i8").data.cast("B")], meta
    if pa.types.is_float32(t):
        return [np.ascontiguousarray(arr, dtype="<f4").data.cast("B")], meta
    if pa.types.is_float64(t):
        return [np.ascontiguousarray(arr, dtype="<f8").data.cast("B")], meta
    raise TypeError(f"plain codec: unsupported type {t}")


def encode_plain(arr: pa.Array) -> tuple[bytes, dict]:
    # single-copy assembly of the parts (the old to_pybytes() +
    # bytes-concat pair copied the blob twice — on the plain+zstd hot
    # path that alone cost ~1.3 CPU-s/GB); callers that zstd the payload
    # skip even this copy via encode_plain_parts + wrap_parts
    from choetl_spark.codecs.zstd import assemble_parts

    parts, meta = encode_plain_parts(arr)
    if len(parts) == 1:
        return bytes(parts[0]), meta
    return assemble_parts(parts), meta


def _var_data_view(arr: pa.Array) -> memoryview:
    """Zero-copy memoryview over the value bytes of a string/binary
    array (the span of the parent data buffer between the slice's first
    and last offsets). Valid only while ``arr`` is alive."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if len(arr) == 0:
        return memoryview(b"")
    offsets_buf = arr.buffers()[1]
    data_buf = arr.buffers()[2]
    if data_buf is None:
        return memoryview(b"")
    big = pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
    odt = np.int64 if big else np.int32
    offs = np.frombuffer(offsets_buf, dtype=odt, count=len(arr) + 1 + arr.offset)
    start = int(offs[arr.offset])
    end = int(offs[arr.offset + len(arr)])
    return memoryview(data_buf)[start:end]


def _var_data_bytes(arr: pa.Array) -> bytes:
    """Concatenated value bytes of a string/binary array — one copy of
    exactly the slice's bytes, never the whole parent buffer."""
    return bytes(_var_data_view(arr))


def decode_plain(payload: bytes, meta: dict) -> pa.Array:
    t = str_to_type(meta["dtype"])
    n = meta["n"]
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(
        t
    ) or pa.types.is_large_binary(t):
        w = meta["len_width"]
        lb = meta["len_bytes"]
        lengths = unpack_uints(payload[:lb], n, w).astype(np.int64)
        # zero-copy view of the value bytes: pa.py_buffer holds a
        # reference to the base payload, so no blob-sized copy is made
        # (payload[lb:] would copy the whole blob per chunk)
        blob = memoryview(payload)[lb:]
        return _strings_from_blob(blob, lengths, t)
    if pa.types.is_boolean(t):
        bits = np.unpackbits(
            np.frombuffer(payload, dtype=np.uint8), count=n, bitorder="little"
        ).astype(bool)
        return pa.array(bits)
    if is_int_like(t):
        vals = np.frombuffer(payload, dtype="<i8", count=n)
        return from_int_view(vals, meta["dtype"])
    if pa.types.is_float32(t):
        return pa.array(np.frombuffer(payload, dtype="<f4", count=n), type=t)
    if pa.types.is_float64(t):
        return pa.array(np.frombuffer(payload, dtype="<f8", count=n), type=t)
    raise TypeError(f"plain codec: unsupported type {t}")


def _strings_from_blob(
    blob: bytes | memoryview, lengths: np.ndarray, t: pa.DataType
) -> pa.Array:
    n = len(lengths)
    big = pa.types.is_large_string(t) or pa.types.is_large_binary(t)
    odt = pa.int64() if big else pa.int32()
    npdt = np.int64 if big else np.int32
    offsets = np.zeros(n + 1, dtype=npdt)
    np.cumsum(lengths, out=offsets[1:])
    offsets_arr = pa.array(offsets, type=odt)
    data = pa.py_buffer(blob)
    return pa.Array.from_buffers(
        t, n, [None, offsets_arr.buffers()[1], data]
    )


# ---------------------------------------------------------------------------
# bitpack (non-negative ints, width from max)
# ---------------------------------------------------------------------------


def encode_bitpack(arr: pa.Array) -> tuple[bytes, dict]:
    vals = int_view(arr)
    if len(vals) and vals.min() < 0:
        raise ValueError("bitpack requires non-negative values (use foref)")
    w = bit_width(int(vals.max())) if len(vals) else 0
    payload = pack_uints(vals.astype(np.uint64), w)
    meta = {
        "codec": "bitpack",
        "dtype": type_to_str(arr.type),
        "n": len(arr),
        "width": w,
    }
    return payload, meta


def decode_bitpack(payload: bytes, meta: dict) -> pa.Array:
    vals = unpack_uints(payload, meta["n"], meta["width"]).astype(np.int64)
    return from_int_view(vals, meta["dtype"])


# ---------------------------------------------------------------------------
# frame-of-reference (subtract min, bitpack deltas)
# ---------------------------------------------------------------------------


def encode_foref(arr: pa.Array) -> tuple[bytes, dict]:
    vals = int_view(arr)
    ref = int(vals.min()) if len(vals) else 0
    # deltas fit in uint64 as long as (max-min) < 2**64; int64 range is fine
    deltas = (vals.astype(np.int64) - np.int64(ref)).astype(np.uint64)
    w = bit_width(int(deltas.max())) if len(deltas) else 0
    payload = pack_uints(deltas, w)
    meta = {
        "codec": "foref",
        "dtype": type_to_str(arr.type),
        "n": len(arr),
        "ref": ref,
        "width": w,
    }
    return payload, meta


def decode_foref(payload: bytes, meta: dict) -> pa.Array:
    deltas = unpack_uints(payload, meta["n"], meta["width"])
    vals = deltas.astype(np.int64) + np.int64(meta["ref"])
    return from_int_view(vals, meta["dtype"])


# ---------------------------------------------------------------------------
# delta (zigzag successive differences, bitpacked) — the encoding for
# locally-sorted / clustered int-like columns (crawl timestamps,
# monotonically assigned ids): consecutive values differ by far less
# than their frame-of-reference span, so the packed width collapses.
# ---------------------------------------------------------------------------


def _zigzag(d: np.ndarray) -> np.ndarray:
    """int64 -> uint64 zigzag (0,-1,1,-2,... -> 0,1,2,3,...)."""
    u = np.ascontiguousarray(d).view(np.uint64)
    return (u << np.uint64(1)) ^ (d >> np.int64(63)).view(np.uint64)


def _unzigzag(zz: np.ndarray) -> np.ndarray:
    return ((zz >> np.uint64(1)) ^ (np.uint64(0) - (zz & np.uint64(1)))).view(
        np.int64
    )


def encode_delta(arr: pa.Array) -> tuple[bytes, dict]:
    """first value + frame-of-reference over zigzag(diff), bitpacked —
    a constant stride (regular timestamps, dense ids) packs at width 0.
    Correct for ANY int64 sequence: numpy diff/cumsum are
    two's-complement wrapping, and zigzag is a bijection on the wrapped
    domain, so decode reproduces the input even across int64 overflow
    in the differences."""
    vals = int_view(arr)
    first = int(vals[0]) if len(vals) else 0
    with np.errstate(over="ignore"):
        zz = _zigzag(np.diff(vals)) if len(vals) > 1 else np.zeros(
            0, dtype=np.uint64
        )
    zref = int(zz.min()) if len(zz) else 0
    rel = zz - np.uint64(zref)  # zz >= zref: stays in uint64, no wrap
    w = bit_width(int(rel.max())) if len(rel) else 0
    payload = pack_uints(rel, w)
    meta = {
        "codec": "delta",
        "dtype": type_to_str(arr.type),
        "n": len(arr),
        "first": first,
        "zref": zref,
        "width": w,
    }
    return payload, meta


def decode_delta(payload: bytes, meta: dict) -> pa.Array:
    n = meta["n"]
    if n == 0:
        return from_int_view(np.zeros(0, dtype=np.int64), meta["dtype"])
    zz = unpack_uints(payload, n - 1, meta["width"]) + np.uint64(
        meta["zref"]
    )
    deltas = _unzigzag(zz)
    vals = np.empty(n, dtype=np.int64)
    vals[0] = meta["first"]
    with np.errstate(over="ignore"):
        np.cumsum(deltas, out=vals[1:])
        vals[1:] += np.int64(meta["first"])
    return from_int_view(vals, meta["dtype"])


# ---------------------------------------------------------------------------
# RLE (runs over int-like values; var-width types go through dict first)
# ---------------------------------------------------------------------------


def encode_rle(arr: pa.Array) -> tuple[bytes, dict]:
    t = arr.type
    if not is_int_like(t) and not pa.types.is_floating(t):
        # var-width: dictionary-encode, RLE the indices, keep values table
        from choetl_spark.codecs import encode_array

        darr = pa.compute.dictionary_encode(arr)
        if isinstance(darr, pa.ChunkedArray):
            darr = darr.combine_chunks()
        idx = darr.indices.cast(pa.int64())
        idx_payload, idx_meta = encode_rle(idx)
        val_payload, val_meta = encode_array(darr.dictionary, codec="plain")
        meta = {
            "codec": "rle",
            "dtype": type_to_str(t),
            "via_dict": True,
            "n": len(arr),
            "idx": idx_meta,
            "idx_bytes": len(idx_payload),
            "values": val_meta,
        }
        return idx_payload + val_payload, meta
    if pa.types.is_floating(t):
        raw = np.asarray(arr)
        view = raw.view(np.int32 if pa.types.is_float32(t) else np.int64).astype(
            np.int64
        )
    else:
        view = int_view(arr)
    n = len(view)
    if n == 0:
        change = np.zeros(0, dtype=bool)
    else:
        change = np.empty(n, dtype=bool)
        change[0] = True
        np.not_equal(view[1:], view[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    run_vals = view[starts]
    bounds = np.append(starts, n)
    run_lens = np.diff(bounds).astype(np.uint64)
    # run lengths: bitpack (lengths >= 1, store len-1)
    lw = bit_width(int(run_lens.max() - 1)) if len(run_lens) else 0
    len_payload = pack_uints(run_lens - 1, lw)
    # run values: frame-of-reference pack
    ref = int(run_vals.min()) if len(run_vals) else 0
    deltas = (run_vals.astype(np.int64) - np.int64(ref)).astype(np.uint64)
    vw = bit_width(int(deltas.max())) if len(deltas) else 0
    val_payload = pack_uints(deltas, vw)
    meta = {
        "codec": "rle",
        "dtype": type_to_str(t),
        "n": n,
        "n_runs": int(len(run_vals)),
        "len_width": lw,
        "val_width": vw,
        "ref": ref,
        "len_bytes": len(len_payload),
        "float": bool(pa.types.is_floating(t)),
    }
    return len_payload + val_payload, meta


def decode_rle(payload: bytes, meta: dict) -> pa.Array:
    if meta.get("via_dict"):
        from choetl_spark.codecs import decode_array

        ib = meta["idx_bytes"]
        idx = decode_rle(payload[:ib], meta["idx"])
        values = decode_array(payload[ib:], meta["values"])
        return values.take(idx)
    n_runs = meta["n_runs"]
    lb = meta["len_bytes"]
    run_lens = unpack_uints(payload[:lb], n_runs, meta["len_width"]).astype(
        np.int64
    ) + 1
    deltas = unpack_uints(payload[lb:], n_runs, meta["val_width"])
    run_vals = deltas.astype(np.int64) + np.int64(meta["ref"])
    vals = np.repeat(run_vals, run_lens)
    t = str_to_type(meta["dtype"])
    if meta.get("float"):
        if pa.types.is_float32(t):
            return pa.array(vals.astype(np.int32).view(np.float32), type=t)
        return pa.array(vals.view(np.float64), type=t)
    return from_int_view(vals, meta["dtype"])


# ---------------------------------------------------------------------------
# dictionary (indices bitpacked + values via child codec)
# ---------------------------------------------------------------------------


def encode_dict(arr: pa.Array, values_codec: str = "plain") -> tuple[bytes, dict]:
    from choetl_spark.codecs import encode_array  # registry, avoids cycle

    darr = pa.compute.dictionary_encode(arr)
    if isinstance(darr, pa.ChunkedArray):
        darr = darr.combine_chunks()
    indices = np.asarray(darr.indices.cast(pa.int64()))
    values = darr.dictionary
    w = bit_width(int(indices.max())) if len(indices) else 0
    idx_payload = pack_uints(indices.astype(np.uint64), w)
    val_payload, val_meta = encode_array(values, codec=values_codec)
    meta = {
        "codec": "dict",
        "dtype": type_to_str(arr.type),
        "n": len(arr),
        "idx_width": w,
        "idx_bytes": len(idx_payload),
        "values": val_meta,
    }
    return idx_payload + val_payload, meta


def decode_dict(payload: bytes, meta: dict) -> pa.Array:
    from choetl_spark.codecs import decode_array

    ib = meta["idx_bytes"]
    indices = unpack_uints(payload[:ib], meta["n"], meta["idx_width"]).astype(
        np.int64
    )
    values = decode_array(payload[ib:], meta["values"])
    return values.take(pa.array(indices))


# ---------------------------------------------------------------------------
# size estimators used by the selector (cheap, no encoding)
# ---------------------------------------------------------------------------


def estimate_plain(arr: pa.Array) -> int:
    return data_nbytes(arr)
