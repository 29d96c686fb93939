"""Per-chunk Bloom filters for point lookups on high-cardinality
string/binary columns (urls, ids) — the complement of the zone maps in
:mod:`choetl_spark.stats`: min/max bounds prune RANGE scans, Blooms
prune EQUALITY probes that range stats can't help with (a random url sits
inside almost every chunk's [min, max]).

The analog in the reference stack is Parquet's optional column bloom
filters, which ChoETL inherits implicitly through Parquet.Net; here they
are first-class per-chunk metadata, opt-in per column
(``EncodeConfig.bloom_columns``), living in the chunk ``stats`` JSON so
readers prune on metadata only.

Design: double hashing (Kirsch-Mitzenmacher) over two independent
wrapping-polynomial hashes of the value bytes; ``m`` is a power of two
sized at ~``bits_per_key`` bits per distinct non-null value (default 10
→ ~1-2% false-positive at k=6). The build is fully vectorized: one
flattened-byte pass, a power-table gather, ``np.add.reduceat`` per-row
sums, ``np.bitwise_or.at`` scatter — no per-row Python, same kernel
discipline as the minhash signatures (operators/dedup.py).
"""

from __future__ import annotations

import base64

import numpy as np
import pyarrow as pa

_P1 = np.uint64(1099511628211)  # FNV-1a prime (64-bit)
_P2 = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _row_hashes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 hashes per row of a null-free string or
    binary array. h = sum(b_j * P^(L-1-j)) mod 2^64, xor the length —
    the vectorized (power-table gather + reduceat) form of the Horner
    loop in :func:`_hash_value`."""
    from choetl_spark.codecs.core import _var_data_bytes

    n = len(arr)
    lengths = np.asarray(
        pa.compute.binary_length(arr).cast(pa.int64())
    ).astype(np.int64)
    total = int(lengths.sum())
    out1 = np.zeros(n, dtype=np.uint64)
    out2 = np.zeros(n, dtype=np.uint64)
    if total:
        blob = np.frombuffer(_var_data_bytes(arr), dtype=np.uint8).astype(
            np.uint64
        )
        ends = np.cumsum(lengths)
        starts = ends - lengths
        maxlen = int(lengths.max())
        with np.errstate(over="ignore"):
            pw1 = np.empty(maxlen, dtype=np.uint64)
            pw2 = np.empty(maxlen, dtype=np.uint64)
            pw1[0] = pw2[0] = 1
            np.multiply.accumulate(
                np.full(maxlen - 1, _P1), out=pw1[1:]
            ) if maxlen > 1 else None
            np.multiply.accumulate(
                np.full(maxlen - 1, _P2), out=pw2[1:]
            ) if maxlen > 1 else None
            gexp = np.repeat(ends - 1, lengths) - np.arange(
                total, dtype=np.int64
            )
            # reduceat over NON-EMPTY rows' starts only: an empty row's
            # start equals its successor's (or runs past the blob) and
            # would split/misread the neighboring segment
            nz = lengths > 0
            h1 = np.add.reduceat(blob * pw1[gexp], starts[nz])
            h2 = np.add.reduceat(blob * pw2[gexp], starts[nz])
        out1[nz] = h1
        out2[nz] = h2
    out1 ^= lengths.view(np.uint64)
    out2 ^= lengths.view(np.uint64)
    return out1, out2 | np.uint64(1)  # odd step covers all residues


def _hash_value(value: str | bytes) -> tuple[int, int]:
    """Scalar twin of :func:`_row_hashes` for the probe side.

    str/bytes ONLY (blooms are built over the column's utf-8/binary
    bytes). Anything else raises: ``bytes(123)`` is 123 NUL bytes, so a
    silently-coerced int probe would hash garbage and prune partitions
    that DO contain the value — breaking the never-over-skip contract
    (the residual ``col == 123`` filter would have matched via Spark's
    cast, but the rows are already gone)."""
    if isinstance(value, str):
        b = value.encode("utf-8")
    elif isinstance(value, (bytes, bytearray, memoryview)):
        b = bytes(value)
    else:
        raise TypeError(
            f"bloom probe must be str or bytes (column values are hashed "
            f"as utf-8/binary); got {type(value).__name__}: {value!r}"
        )
    mask = (1 << 64) - 1
    h1 = h2 = 0
    for byte in b:
        h1 = (h1 * int(_P1) + byte) & mask
        h2 = (h2 * int(_P2) + byte) & mask
    h1 ^= len(b)
    h2 ^= len(b)
    return h1, h2 | 1


def bloom_build(
    arr: pa.Array, bits_per_key: int = 10, k: int = 6
) -> dict | None:
    """JSON-safe bloom dict for one chunk (None for an all-null chunk).

    ``{"m": bits, "k": probes, "bits": base64-LE-uint64-words}``.
    """
    if arr.null_count:
        arr = arr.drop_null()
    n = len(arr)
    if n == 0:
        return None
    m = 1 << max(int(n * bits_per_key - 1).bit_length(), 10)
    h1, h2 = _row_hashes(arr)
    words = np.zeros(m // 64, dtype=np.uint64)
    mmask = np.uint64(m - 1)
    with np.errstate(over="ignore"):
        for i in range(k):
            g = (h1 + np.uint64(i) * h2) & mmask
            np.bitwise_or.at(
                words, (g >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (g & np.uint64(63)),
            )
    return {
        "m": int(m),
        "k": int(k),
        "bits": base64.b64encode(words.tobytes()).decode("ascii"),
    }


def bloom_maybe_contains(bloom: dict | None, value: str | bytes) -> bool:
    """False ONLY when ``value`` is definitely absent from the chunk.
    A missing bloom (None / legacy stats) answers True — pruning is an
    optimization and must never over-skip."""
    if not bloom:
        return True
    words = np.frombuffer(
        base64.b64decode(bloom["bits"]), dtype="<u8"
    )
    m = bloom["m"]
    h1, h2 = _hash_value(value)
    for i in range(bloom["k"]):
        g = (h1 + i * h2) % m
        if not (int(words[g >> 6]) >> (g & 63)) & 1:
            return False
    return True
