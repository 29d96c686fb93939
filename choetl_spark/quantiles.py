"""Per-chunk quantile digests → store-level approx percentiles from
metadata only.

The second half of the ANALYZE-stats story next to the HLL NDV
sketches (`choetl_spark/ndv.py`): opt-in via
``EncodeConfig.quantile_columns``, each chunk's stats JSON carries the
chunk's k+1 exact order statistics (an equi-depth digest — the
compressed-histogram form of the classic GK/t-digest idea: Greenwald &
Khanna, SIGMOD 2001; Dunning & Ertl, t-digest, arXiv:1902.04023 — both
public work). Any chunk subset (snapshot, partition, pruned scan)
merges by weighted concatenation; rank error is bounded by ~1/(2k) per
merge level (k=128 default → ~1 % rank error through the two-level
task/driver merge).

Digests are insert-only like the NDV sketches: row-level delete
tombstones do not subtract; compaction/clustering rewrites refresh
them. At 10^12 rows the point is percentiles WITHOUT a scan —
`approx_quantile` collects O(tasks x columns) ~1 KB digests however
large the store is.

The reference has no statistics subsystem (ChoETL delegates to
Parquet.Net footers); this extends the engine's stats-driven design.
"""

from __future__ import annotations

import base64
import json
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

QDIGEST_K = 128  # k+1 float64 order stats ~1 KB/chunk, ~0.4 % rank err


def _values_f64(arr: pa.Array) -> np.ndarray:
    """Non-null values of a chunk as float64, in a per-type monotone
    encoding (rank queries only need order, so float64's 2^53 integer
    window is fine for epoch-micros timestamps and all practical
    int64 ranges; the digest is approximate by construction)."""
    t = arr.type
    if pa.types.is_boolean(t):
        arr = arr.cast(pa.int8())
    elif pa.types.is_dictionary(t):
        arr = arr.cast(t.value_type)
        return _values_f64(arr)
    t = arr.type
    if (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
    ):
        v = arr.drop_null().to_numpy(zero_copy_only=False)
        return np.asarray(v, dtype=np.float64)
    if pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_time(t):
        v = arr.cast(pa.int64()).drop_null().to_numpy(zero_copy_only=False)
        return np.asarray(v, dtype=np.float64)
    raise TypeError(f"quantile digest unsupported for type {t}")


def qdigest_build(arr: pa.Array, k: int = QDIGEST_K) -> dict | None:
    """JSON-safe digest for one chunk (None for an all-null chunk):
    ``{"k": k, "n": n_valid, "qs": base64(float64[k+1])}`` where qs are
    the chunk's exact order statistics at ranks linspace(0, n-1, k+1)."""
    v = _values_f64(arr)
    n = len(v)
    if n == 0:
        return None
    v = np.sort(v)
    idx = np.round(np.linspace(0, n - 1, k + 1)).astype(np.int64)
    qs = v[idx]
    return {
        "k": int(k),
        "n": int(n),
        "qs": base64.b64encode(qs.astype("<f8").tobytes()).decode("ascii"),
    }


def qdigest_points(d: dict) -> tuple[np.ndarray, np.ndarray]:
    """(points, weights) view of a digest: each stored order statistic
    represents n/(k+1) rows."""
    qs = np.frombuffer(base64.b64decode(d["qs"]), dtype="<f8").copy()
    w = np.full(len(qs), d["n"] / len(qs), dtype=np.float64)
    return qs, w


def qdigest_merge_compress(
    digests: list[dict], k: int = QDIGEST_K
) -> dict | None:
    """Merge digests by weighted concatenation, re-compress to k+1
    points at equi-spaced cumulative ranks (midpoint rule). Associative
    up to the stated rank-error bound; retry/resume safe because the
    inputs are immutable chunk stats."""
    pts_all, w_all = [], []
    n_tot = 0
    for d in digests:
        if d is None:
            continue
        p, w = qdigest_points(d)
        pts_all.append(p)
        w_all.append(w)
        n_tot += d["n"]
    if not pts_all:
        return None
    p = np.concatenate(pts_all)
    w = np.concatenate(w_all)
    order = np.argsort(p, kind="stable")
    p, w = p[order], w[order]
    cum = np.cumsum(w) - w / 2.0
    targets = np.linspace(0.0, float(w.sum()), k + 1)
    qs = np.interp(targets, cum, p)
    return {
        "k": int(k),
        "n": int(n_tot),
        "qs": base64.b64encode(qs.astype("<f8").tobytes()).decode("ascii"),
    }


def qdigest_quantile(d: dict, probs: list[float]) -> list[float]:
    """Approximate quantiles from a (merged) digest, midpoint-rule
    interpolation over the weighted points."""
    p, w = qdigest_points(d)
    cum = np.cumsum(w) - w / 2.0
    total = float(w.sum())
    return [float(np.interp(q * total, cum, p)) for q in probs]


def approx_quantile(
    spark,
    out_dir: str,
    columns: list[str] | str,
    probs: list[float],
    as_of: int | None = None,
) -> dict[str, list[float]]:
    """Approximate per-column quantiles from chunk METADATA only.

    Same two-level shape as :func:`choetl_spark.ndv.approx_ndv`: the
    chunk table's ``stats`` JSON (payload never scanned) streams
    through a partial-merge kernel that folds each task's digests into
    ONE ~1 KB digest per column, the driver merges those and
    interpolates. Values come back as float64 in the column's digest
    encoding (epoch micros for timestamps).

    Raises ``ValueError`` if any chunk holding values lacks a digest
    (store written without ``quantile_columns``) — mixing exact partial
    data into a rank merge would silently skew the estimate.
    """
    from pyspark.sql import functions as F

    from choetl_spark.ledger import read_encoded

    cols = [columns] if isinstance(columns, str) else list(columns)
    if not cols:
        return {}
    for q in probs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"prob out of [0,1]: {q}")
    enc = read_encoded(spark, out_dir, as_of=as_of)
    meta = enc.filter(F.col("column").isin(cols)).select("column", "stats")

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc: dict[str, list[dict]] = {}
        missing: set[str] = set()
        for batch in batches:
            names = batch.column(0).to_pylist()
            stats = batch.column(1).to_pylist()
            for name, st_json in zip(names, stats):
                st = json.loads(st_json) if st_json else {}
                d = st.get("qdigest")
                if d is None:
                    if st.get("n_nulls", 0) != st.get("n", 0):
                        missing.add(name)
                    continue
                acc.setdefault(name, []).append(d)
        out_names = sorted(set(acc) | missing)
        merged = {
            n: qdigest_merge_compress(acc[n]) for n in acc
        }
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_names, type=pa.string()),
                pa.array(
                    [
                        json.dumps(merged[n]) if n in merged else None
                        for n in out_names
                    ],
                    type=pa.string(),
                ),
                pa.array([n in missing for n in out_names], type=pa.bool_()),
            ],
            schema=pa.schema(
                [
                    ("column", pa.string()),
                    ("digest", pa.string()),
                    ("missing", pa.bool_()),
                ]
            ),
        )

    rows = meta.mapInArrow(
        kernel, "column string, digest string, missing boolean"
    ).collect()
    bad = sorted({r["column"] for r in rows if r["missing"]})
    if bad:
        raise ValueError(
            f"columns {bad} have chunks without quantile digests — encode "
            f"with EncodeConfig(quantile_columns=(...)) (or rewrite/"
            f"compact) to enable approx_quantile"
        )
    per_col: dict[str, list[dict]] = {}
    for r in rows:
        if r["digest"] is not None:
            per_col.setdefault(r["column"], []).append(json.loads(r["digest"]))
    out: dict[str, list[float]] = {}
    for c in cols:
        if c not in per_col:
            out[c] = [float("nan")] * len(probs)
            continue
        final = qdigest_merge_compress(per_col[c])
        out[c] = qdigest_quantile(final, probs)
    return out
