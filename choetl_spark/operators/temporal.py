"""Temporal relational operators: as-of join, sessionization, and a
bounded time-window self-join.

The reference has no event-time operators (its "streaming" is a pull
loop over a file, reference src/ChoETL/IChoReader.cs:22-23), but any
100 TB event/crawl pipeline needs point-in-time joins and gap
sessionization, so these are first-class here — each expressed as
declarative DataFrame ops whose physical plan is a single hash
shuffle on the join/session key (never a range explosion, never a
driver loop).

Scale shapes
------------
- ``asof_join``: the union-tag recipe — one shuffle of |L|+|R| rows on
  the key, then an incremental running-``last`` window (constant state
  per key, no per-row lookback buffer). This is how you do a
  point-in-time join at 100 TB: cost identical to a sort-merge join,
  regardless of how far back the match is. A naive range join
  (``l.ts >= r.ts`` + row_number) explodes to |L|x|R| per key first.
- ``sessionize``: lag + running sum over the per-key window — one
  shuffle, constant state.
- ``time_window_pairs``: |ts_l - ts_r| <= W self-pairs via W-wide
  bucketing: floor(ts/W) buckets differ by at most 1 for any matching
  pair, so the left side explodes to 3 buckets and equi-joins on the
  right's own bucket — Catalyst runs a plain shuffled hash/SMJ, never
  a nested-loop. Per-(key,bucket) output is quadratic in that bucket's
  density, which is the honest lower bound for this operator; hot keys
  salt the same way the encode path does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _epoch(col):
    """Seconds-since-epoch double for timestamp, timestamp_ntz, date,
    or numeric columns (TIMESTAMP_NTZ refuses a direct double cast, so
    route through TIMESTAMP; numeric inputs round-trip unchanged)."""
    return col.cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    tolerance_sec: float | None = None,
    direction: str = "backward",
    matched_ts_col: str = "matched_ts",
    suffix: str = "_r",
) -> DataFrame:
    """Point-in-time (ASOF) left join.

    For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key
    (``direction="backward"``; ``"forward"`` takes the smallest
    ``right_ts`` >= ``left_ts``). Equal timestamps match. Left rows
    with no candidate keep NULL right columns (left-join semantics,
    same contract as DuckDB/pandas ASOF LEFT JOIN).

    ``tolerance_sec`` drops matches farther than that many seconds
    from the left timestamp (the matched right columns become NULL,
    the left row survives).

    Right rows should be unique per (key, right_ts): among equal-key
    equal-ts right rows the survivor is unspecified (same caveat as
    DuckDB ASOF). Dedupe the right side first if that matters.

    Right columns whose names collide with left/key columns come back
    with ``suffix`` appended (pandas ``merge_asof`` discipline); the
    matched row is carried as ONE struct through a single running
    ``last(ignorenulls)``, so all returned right values — including
    NULLs — belong to the same right row.

    Implementation: union both sides tagged (right=0, left=1), one
    window partitioned by the key ordered by (ts, tag) — right rows
    sort before left rows at equal ts so equality matches — and the
    running last carries the most recent right ROW forward onto each
    left row. One shuffle total.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    rcols = right_cols or [
        c for c in right.columns if c not in keys and c != rts
    ]
    lcols = [c for c in left.columns if c not in keys]

    taken = set(keys) | set(lcols)
    out_names = {}
    for c in rcols:
        name = c if c not in taken else f"{c}{suffix}"
        if name in taken or name in out_names.values():
            raise ValueError(
                f"asof_join output column collision for {name!r}; "
                f"rename the input columns or pass a different suffix"
            )
        out_names[c] = name
    if matched_ts_col in taken or matched_ts_col in out_names.values():
        raise ValueError(
            f"matched_ts_col {matched_ts_col!r} collides with an output "
            f"column; pass a different matched_ts_col"
        )

    sign = 1 if direction == "backward" else -1
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")

    # ONE struct carries the whole matched right row (fields + its ts):
    # per-column last(ignorenulls) would splice values from different
    # right rows whenever a later row holds a NULL payload
    r_struct_ddl = "struct<" + ",".join(
        [f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in rcols]
        + [f"`__ts`:{right.schema[rts].dataType.simpleString()}"]
    ) + ">"
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        (_epoch(F.col(left_ts)) * sign).alias("_ord"),
        F.lit(1).alias("_tag"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        F.lit(None).cast(r_struct_ddl).alias("_r"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        (_epoch(F.col(rts)) * sign).alias("_ord"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in lcols],
        F.struct(
            *[F.col(c).alias(c) for c in rcols],
            F.col(rts).alias("__ts"),
        ).cast(r_struct_ddl).alias("_r"),
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("_ord", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        *keys,
        "_ord",
        "_tag",
        *[F.col(f"_l_{c}") for c in lcols],
        F.last("_r", ignorenulls=True).over(w).alias("_m"),
    )
    out = carried.filter(F.col("_tag") == 1)

    matched = F.col("_m")
    if tolerance_sec is not None:
        # _ord is sign*left_ts, so sign*_ord recovers left_ts; the
        # extra outer sign flips the difference for the forward case,
        # making gap the match distance (>= 0) in either direction
        gap = (F.lit(sign) * F.col("_ord") - _epoch(F.col("_m.__ts"))) \
            * F.lit(sign)
        in_tol = F.col("_m").isNotNull() & (gap <= F.lit(tolerance_sec))
        matched = F.when(in_tol, F.col("_m"))

    sel = [F.col(k) for k in keys]
    sel += [F.col(f"_l_{c}").alias(c) for c in lcols]
    sel += [matched[c].alias(out_names[c]) for c in rcols]
    sel.append(matched["__ts"].alias(matched_ts_col))
    return out.select(*sel)


def sessionize(
    df: DataFrame,
    key: list[str] | str,
    ts_col: str,
    gap_sec: float,
    session_col: str = "session_id",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization: within each key, a new session starts
    whenever the time since the previous event exceeds ``gap_sec``.
    Emits a 1-based per-key session number plus the original columns.

    ``tiebreak`` columns make the ordering total when timestamps can
    collide within a key (determinism of the running sum demands a
    total order).

    One shuffle on the key; lag + running sum are both incremental
    window aggregates (constant per-key state at any scale).
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    ts_d = _epoch(F.col(ts_col))
    prev = F.lag(ts_d).over(w)
    new_sess = F.when(
        prev.isNull() | ((ts_d - prev) > F.lit(float(gap_sec))), 1
    ).otherwise(0)
    run = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        session_col, F.sum(new_sess).over(run).cast("long")
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    on: list[str] | str | None = None,
    bucket_width: float | None = None,
    how: str = "inner",
    max_buckets: int = 65536,
) -> DataFrame:
    """Join point rows to every interval row containing them
    (``lo <= point <= hi``, optionally also matching ``on`` keys) —
    the SCD-2 / IP-range / validity-window lookup.

    Never a nested loop: intervals explode to the ``bucket_width``-wide
    buckets they cover (``sequence(floor(lo/W), floor(hi/W))``), points
    join on their own single bucket, and the residual range filter
    keeps exactness. Pick W ~ the typical interval length: interval
    explode cost is ceil(len/W)+1 rows, and every point lands in one
    bucket. When not given, W defaults to the p95 interval length from
    ONE tiny aggregation over the interval side (always ran anyway for
    the explode-cap validation); a degenerate table falls back to the
    max length so open-ended sentinel intervals can never pick a tiny
    width.

    The widest interval may cover at most ``max_buckets`` buckets
    (default 65536) — beyond that the call raises instead of silently
    exploding an unbounded ``sequence`` (an SCD-2 open-ended sentinel
    row against a small W would otherwise try to build a
    billion-element array). Cap or split such rows, or pass a larger
    ``bucket_width``.

    ``how="left"`` keeps unmatched points with NULL interval columns
    (NULL-safe: a matched point with NULL payload columns is never
    re-emitted as unmatched). One shuffle of each side on (keys,
    bucket); per-bucket output is bounded by the true match count
    (each point-interval match is produced exactly once — a containing
    interval covers the point's bucket by construction).

    Point/bound columns may be numeric, timestamp, or date; temporal
    columns compare on their epoch view, numeric columns on their own
    values (no precision-losing cast through a timestamp).
    """
    keys = [on] if isinstance(on, str) else list(on or [])
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how}")

    def _axis(df: DataFrame, c: str):
        t = df.schema[c].dataType.simpleString()
        if t.startswith(("timestamp", "date")):
            return _epoch(F.col(c))
        return F.col(c).cast("double")

    pv = _axis(points, point_col)
    lo = _axis(intervals, lo_col)
    hi = _axis(intervals, hi_col)

    # one small aggregation over the interval side: p95 length for the
    # default width + max length for the explode cap. Interval tables
    # are the dimension side (SCD-2 history, IP ranges) — this is a
    # metadata-priced job next to the join itself.
    stats = (
        intervals.select((hi - lo).alias("_len"))
        .filter(F.col("_len") >= 0)
        .agg(
            F.expr("percentile_approx(_len, 0.95)").alias("p95"),
            F.max("_len").alias("mx"),
        )
        .collect()[0]
    )
    max_len = float(stats["mx"]) if stats["mx"] is not None else 0.0
    if bucket_width is None:
        p95 = float(stats["p95"]) if stats["p95"] is not None else 0.0
        bucket_width = p95 or max_len or 1.0
    w = float(bucket_width)
    if w <= 0:
        raise ValueError(f"bucket_width must be > 0, got {w}")
    if max_len / w + 1 > max_buckets:
        raise ValueError(
            f"widest interval ({max_len}) covers "
            f"~{int(max_len / w) + 1} buckets at width {w} > "
            f"max_buckets={max_buckets}; pass a larger bucket_width or "
            f"split/cap open-ended intervals"
        )

    icols = [c for c in intervals.columns if c not in keys]
    pcols = [c for c in points.columns if c not in keys]
    clash = set(icols) & set(pcols)
    if clash:
        raise ValueError(
            f"point/interval column name collision: {sorted(clash)}; "
            f"rename one side"
        )
    b_lo = F.floor(lo / F.lit(w)).cast("long")
    b_hi = F.floor(hi / F.lit(w)).cast("long")
    iv = (
        intervals.filter(hi >= lo)
        .select(
            *keys,
            *[F.col(c) for c in icols],
            F.explode(F.sequence(b_lo, b_hi)).alias("_jb"),
        )
    )
    pt = points.select(
        *keys,
        *[F.col(c) for c in pcols],
        F.floor(pv / F.lit(w)).cast("long").alias("_jb"),
    )
    lo_j = _axis(intervals, lo_col)
    hi_j = _axis(intervals, hi_col)
    pv_j = _axis(points, point_col)
    joined = (
        pt.join(iv, [*keys, "_jb"], "inner")
        .filter((lo_j <= pv_j) & (pv_j <= hi_j))
        .drop("_jb")
    )
    if how == "left":
        m = joined.select(*keys, *pcols).alias("_m")
        p = points.alias("_p")
        cond = [
            F.col(f"_p.{c}").eqNullSafe(F.col(f"_m.{c}"))
            for c in [*keys, *pcols]
        ]
        missing = p.join(m, cond, "left_anti").select(
            *[F.col(f"_p.{c}").alias(c) for c in keys],
            *[F.col(f"_p.{c}").alias(c) for c in pcols],
            *[F.lit(None).cast(intervals.schema[c].dataType).alias(c)
              for c in icols],
        )
        return joined.unionByName(missing)
    return joined


def time_window_pairs(
    df: DataFrame,
    key: list[str] | str,
    ts_col: str,
    id_col: str,
    window_sec: float,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Unordered pairs of rows with the same key whose timestamps lie
    within ``window_sec`` of each other (|ts_a - ts_b| <= window_sec,
    id_a < id_b). The event-time interval self-join.

    Bucketing by ``window_sec`` bounds the join: a matching pair's
    floor(ts/W) buckets differ by at most 1, so side A explodes each
    row to buckets {b-1, b, b+1} and equi-joins side B on its own
    bucket — each true pair matches on exactly one exploded bucket
    (B's bucket is a single value), so no dedup pass is needed and the
    plan is a plain shuffled equi-join, never a nested loop.
    """
    keys = [key] if isinstance(key, str) else list(key)
    pay = payload_cols or []
    w = float(window_sec)
    b = F.floor(_epoch(F.col(ts_col)) / F.lit(w))

    a = df.select(
        *keys,
        F.col(id_col).alias("id_a"),
        _epoch(F.col(ts_col)).alias("_ts_a"),
        *[F.col(c).alias(f"{c}_a") for c in pay],
        F.explode(F.array(b - 1, b, b + 1)).alias("_jb"),
    )
    bb = df.select(
        *keys,
        F.col(id_col).alias("id_b"),
        _epoch(F.col(ts_col)).alias("_ts_b"),
        *[F.col(c).alias(f"{c}_b") for c in pay],
        b.alias("_jb"),
    )
    out = (
        a.join(bb, [*keys, "_jb"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("_ts_a") - F.col("_ts_b")) <= F.lit(w))
        )
        .drop("_jb", "_ts_a", "_ts_b")
    )
    return out
