"""Per-chunk HyperLogLog sketches → store-level approx distinct counts.

The Iceberg analog is the Puffin statistics file: ``ANALYZE TABLE``
writes an `apache-datasketches-theta-v1` NDV sketch per column so
planners read a cardinality estimate from METADATA instead of scanning
the table. Here the sketch is a classic HyperLogLog (Flajolet,
Fusy, Gandouet, Meunier, "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm", AofA 2007 — public work) stored per
CHUNK in the stats JSON (opt-in via ``EncodeConfig.ndv_columns``), so
any chunk subset — a partition, a snapshot, a pruned scan — merges to
an estimate by taking element-wise register maxima.

Why HLL and not the theta sketch: registers merge with ``np.maximum``
(associative, idempotent — resume/retry safe), the build is one
vectorized pass over the same row hashes the Bloom filters already
compute, and 2^p one-byte registers (p=12 → 4 KB/chunk, ~1.6 % standard
error) cost about what the opt-in Blooms do.

Semantics (same as Iceberg's Puffin stats): the estimate covers values
WRITTEN at/into the selected snapshot. Row-level delete tombstones do
NOT subtract (sketches are insert-only); a clustering rewrite or major
compaction re-encodes partitions and therefore refreshes their
sketches. At 10^12 rows that trade is the point — ANALYZE without a
scan, refreshed by the maintenance operations that rewrite data anyway.

The reference has no statistics subsystem at all (ChoETL writes
Parquet through Parquet.Net footers only); this extends the engine's
stats-driven design (reference parity anchor: the per-column scan
stats that drive the codec selector, `choetl_spark/stats.py`).
"""

from __future__ import annotations

import base64
import json
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

HLL_P = 12  # 2^12 registers = 4 KB/chunk, ~1.04/sqrt(4096) ≈ 1.6 % err

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: the polynomial row hashes are fine for
    Bloom bit probes but their HIGH bits (the HLL register index) need
    an avalanche mix before use."""
    with np.errstate(over="ignore"):
        z = h.astype(np.uint64, copy=True)
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def _bit_length(x: np.ndarray) -> np.ndarray:
    """Vectorized uint64 bit length (numpy has no clz)."""
    out = np.zeros(x.shape, dtype=np.int64)
    v = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        m = v >= (np.uint64(1) << s)
        out[m] += shift
        v[m] >>= s
    out[x > 0] += 1
    return out


def _value_hashes(arr: pa.Array) -> np.ndarray:
    """One avalanche-mixed uint64 hash per NON-NULL row. Strings/binary
    reuse the Bloom kernel's flattened-byte polynomial pass; fixed-width
    types hash their canonical 64-bit pattern (timestamps/dates as
    epoch ints, floats with -0.0 folded to 0.0 so the two equal values
    hash alike — matching SQL DISTINCT)."""
    if arr.null_count:
        arr = arr.drop_null()
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    t = arr.type
    if (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        from choetl_spark.bloom import _row_hashes

        return _mix64(_row_hashes(arr)[0])
    if pa.types.is_floating(t):
        v = np.asarray(arr.cast(pa.float64()).to_numpy(zero_copy_only=False))
        v = np.where(v == 0.0, 0.0, v)  # fold -0.0 into 0.0
        return _mix64(v.view(np.uint64))
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        arr = arr.cast(pa.int64())
    elif pa.types.is_boolean(t) or pa.types.is_integer(t):
        # bit pattern is all that matters; uint64 keeps its pattern
        arr = arr.cast(pa.uint64() if pa.types.is_unsigned_integer(t) else pa.int64())
    else:
        raise TypeError(f"approx-NDV sketch unsupported for type {t}")
    v = np.asarray(arr.to_numpy(zero_copy_only=False)).astype(np.int64)
    return _mix64(v.view(np.uint64))


def hll_build(arr: pa.Array, p: int = HLL_P) -> dict | None:
    """JSON-safe HLL dict for one chunk (None for an all-null chunk):
    ``{"p": p, "regs": base64(uint8[2^p])}``."""
    h = _value_hashes(arr)
    if len(h) == 0:
        return None
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)) & _MASK
    # rho = leading-zero run of the remaining (64-p)-bit suffix + 1
    rho = (64 - p) - _bit_length(w >> np.uint64(p)) + 1
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return {
        "p": int(p),
        "regs": base64.b64encode(regs.tobytes()).decode("ascii"),
    }


def hll_regs(d: dict) -> np.ndarray:
    return np.frombuffer(
        base64.b64decode(d["regs"]), dtype=np.uint8
    ).copy()


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) != len(b):
        raise ValueError(
            f"cannot merge HLL sketches of different p: {len(a)} vs {len(b)}"
        )
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Classic HLL estimator with the small-range linear-counting
    correction; 64-bit hashes make the large-range correction moot."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)
    return float(est)


def approx_ndv(
    spark,
    out_dir: str,
    columns: list[str] | str,
    as_of: int | None = None,
) -> dict[str, int]:
    """Approximate distinct-value counts from chunk metadata only.

    One metadata job: the chunk table's ``stats`` strings (never the
    payload column — column pruning keeps the scan to the few-KB JSON)
    stream through a partial-merge kernel that folds each task's
    sketches into ONE register array per column, so the driver collects
    O(tasks × columns) 4 KB rows however large the store is, merges,
    and estimates.

    Raises ``ValueError`` if any chunk of a requested column lacks a
    sketch (store written without ``ndv_columns`` — there is no sound
    way to combine an exact partial count with HLL registers, and
    silently under-counting would be worse than refusing). Tombstoned
    rows are NOT subtracted — see the module docstring.
    """
    from pyspark.sql import functions as F

    from choetl_spark.ledger import read_encoded

    cols = [columns] if isinstance(columns, str) else list(columns)
    if not cols:
        return {}
    enc = read_encoded(spark, out_dir, as_of=as_of)
    meta = (
        enc.filter(F.col("column").isin(cols))
        .select("column", "stats")
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc: dict[str, np.ndarray] = {}
        missing: set[str] = set()
        for batch in batches:
            names = batch.column(0).to_pylist()
            stats = batch.column(1).to_pylist()
            for name, st_json in zip(names, stats):
                st = json.loads(st_json) if st_json else {}
                d = st.get("hll")
                if d is None:
                    # all-null chunks contribute nothing and carry no
                    # sketch; only a chunk with VALUES and no sketch
                    # means the store predates ndv_columns
                    if st.get("n_nulls", 0) != st.get("n", 0):
                        missing.add(name)
                    continue
                regs = hll_regs(d)
                cur = acc.get(name)
                acc[name] = regs if cur is None else hll_merge(cur, regs)
        out_names = sorted(set(acc) | missing)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_names, type=pa.string()),
                pa.array(
                    [
                        acc[n].tobytes() if n in acc else None
                        for n in out_names
                    ],
                    type=pa.binary(),
                ),
                pa.array([n in missing for n in out_names], type=pa.bool_()),
            ],
            schema=pa.schema(
                [
                    ("column", pa.string()),
                    ("regs", pa.binary()),
                    ("missing", pa.bool_()),
                ]
            ),
        )

    rows = meta.mapInArrow(
        kernel, "column string, regs binary, missing boolean"
    ).collect()
    bad = sorted({r["column"] for r in rows if r["missing"]})
    if bad:
        raise ValueError(
            f"columns {bad} have chunks without NDV sketches — encode "
            f"with EncodeConfig(ndv_columns=(...)) (or rewrite/compact) "
            f"to enable approx_ndv"
        )
    merged: dict[str, np.ndarray] = {}
    for r in rows:
        if r["regs"] is None:
            continue
        regs = np.frombuffer(r["regs"], dtype=np.uint8)
        cur = merged.get(r["column"])
        merged[r["column"]] = (
            regs.copy() if cur is None else hll_merge(cur, regs)
        )
    out: dict[str, int] = {}
    for c in cols:
        out[c] = int(round(hll_estimate(merged[c]))) if c in merged else 0
    return out
