"""Temporal operators: as-of join, sessionization, time-window pairs.

Each test cross-checks against a brute-force (per-row loop) reference
computed in Python over the same tiny frame — an independent
formulation, not the operator's own window recipe.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from choetl_spark.operators import asof_join, sessionize, time_window_pairs

UTC = dt.timezone.utc


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, tzinfo=UTC)


def _naive(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, _naive(5), "l1"), (1, _naive(10), "l2"), (1, _naive(2), "l0"),
         (2, _naive(7), "l3"), (3, _naive(1), "l4")],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _naive(4), 40.0), (1, _naive(10), 100.0), (1, _naive(9), 90.0),
         (2, _naive(8), 80.0)],
        "k int, ts timestamp, rv double",
    )
    out = {
        r["lv"]: (r["rv"], r["matched_ts"])
        for r in asof_join(left, right, "k", "ts").collect()
    }
    assert out["l0"] == (None, None)           # no right row at/before 0:02
    assert out["l1"] == (40.0, _naive(4))      # latest <= 0:05
    assert out["l2"] == (100.0, _naive(10))    # equal ts matches
    assert out["l3"] == (None, None)           # right at 0:08 is AFTER 0:07
    assert out["l4"] == (None, None)           # key 3 has no right rows


def test_asof_join_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _naive(5), "a"), (1, _naive(20), "b")],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _naive(7), 7.0), (1, _naive(50), 50.0)],
        "k int, ts timestamp, rv double",
    )
    fwd = {
        r["lv"]: r["rv"]
        for r in asof_join(left, right, "k", "ts", direction="forward")
        .collect()
    }
    assert fwd == {"a": 7.0, "b": 50.0}  # smallest right ts >= left ts
    tol = {
        r["lv"]: r["rv"]
        for r in asof_join(
            left, right, "k", "ts", direction="forward",
            tolerance_sec=300,
        ).collect()
    }
    assert tol == {"a": 7.0, "b": None}  # 0:50 is 30 min past 0:20


def test_asof_join_matches_bruteforce_on_events(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    got = {
        r["event_id"]: r["view_id"]
        for r in asof_join(
            clicks, views, "user_id", "ts", right_cols=["view_id"]
        ).collect()
    }
    vrows = sorted(
        views.collect(), key=lambda r: (r["user_id"], r["ts"], r["view_id"])
    )
    want = {}
    for c in clicks.collect():
        best = None
        for v in vrows:
            if v["user_id"] == c["user_id"] and v["ts"] <= c["ts"]:
                if best is None or v["ts"] > best[0]:
                    best = (v["ts"], v["view_id"])
        want[c["event_id"]] = best[1] if best else None
    assert got == want


def test_asof_join_null_payload_is_atomic(spark):
    """The matched right ROW is carried as one struct: a later right
    row with a NULL payload must yield NULL (that row's value), never
    an older row's value spliced under the newer row's timestamp."""
    left = spark.createDataFrame(
        [(1, _naive(20), "l")], "k int, ts timestamp, lv string"
    )
    right = spark.createDataFrame(
        [(1, _naive(5), 5.0, "x5"), (1, _naive(10), None, "x10")],
        "k int, ts timestamp, rv double, tag string",
    )
    r = asof_join(
        left, right, "k", "ts", right_cols=["rv", "tag"]
    ).collect()[0]
    assert r["matched_ts"] == _naive(10)
    assert r["rv"] is None          # the t=10 row's value, not 5.0
    assert r["tag"] == "x10"        # all fields from the same row


def test_asof_join_collision_suffix_and_raise(spark):
    left = spark.createDataFrame(
        [(1, _naive(5), 1.0)], "k int, ts timestamp, value double"
    )
    right = spark.createDataFrame(
        [(1, _naive(4), 2.0)], "k int, ts timestamp, value double"
    )
    out = asof_join(left, right, "k", "ts", right_cols=["value"])
    assert out.columns == ["k", "ts", "value", "value_r", "matched_ts"]
    r = out.collect()[0]
    assert r["value"] == 1.0 and r["value_r"] == 2.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="matched_ts_col"):
        asof_join(
            left.withColumnRenamed("value", "matched_ts"),
            right, "k", "ts", right_cols=["value"],
        )


def test_sessionize_gap(spark):
    rows = [
        (1, _naive(0), 10), (1, _naive(5), 11), (1, _naive(40), 12),
        (1, _naive(41), 13), (2, _naive(0), 20),
    ]
    df = spark.createDataFrame(rows, "u int, ts timestamp, eid int")
    out = {
        r["eid"]: r["session_id"]
        for r in sessionize(
            df, "u", "ts", gap_sec=30 * 60, tiebreak=["eid"]
        ).collect()
    }
    assert out == {10: 1, 11: 1, 12: 2, 13: 2, 20: 1}


def test_sessionize_no_single_task_exchange(spark):
    df = spark.range(100).select(
        (F.col("id") % 7).alias("u"),
        F.timestamp_seconds(F.col("id") * 100).alias("ts"),
        F.col("id").alias("eid"),
    )
    plan = sessionize(
        df, "u", "ts", gap_sec=60, tiebreak=["eid"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_time_window_pairs_bruteforce(spark):
    import itertools

    rows = [
        (1, 0.0, 1), (1, 50.0, 2), (1, 100.0, 3), (1, 260.0, 4),
        (2, 0.0, 5), (2, 301.0, 6), (3, 10.0, 7),
    ]
    df = spark.createDataFrame(rows, "u int, tsec double, eid int").select(
        "u", F.timestamp_seconds("tsec").alias("ts"), "eid"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in time_window_pairs(df, "u", "ts", "eid", 300.0).collect()
    }
    want = {
        (min(a[2], b[2]), max(a[2], b[2]))
        for a, b in itertools.combinations(rows, 2)
        if a[0] == b[0] and abs(a[1] - b[1]) <= 300.0
    }
    assert got == want
    assert (1, 4) not in got or 260.0 <= 300.0  # boundary sanity
    assert (5, 6) not in got                    # 301 > 300 excluded


def test_asof_join_randomized_torture_vs_bruteforce(spark):
    """Seeded dense random case: few keys, colliding coarse timestamps
    (dedup'd right side), NULL payloads, backward AND forward, with and
    without tolerance — all checked against a per-row brute force."""
    import numpy as np

    rng = np.random.default_rng(42)
    lrows = [
        (int(rng.integers(0, 4)), _naive(int(rng.integers(0, 50)),
                                         int(rng.integers(0, 2)) * 30), i)
        for i in range(120)
    ]
    rraw = [
        (int(rng.integers(0, 4)), _naive(int(rng.integers(0, 50)),
                                         int(rng.integers(0, 2)) * 30),
         None if rng.random() < 0.3 else float(i))
        for i in range(90)
    ]
    # dedupe right per (k, ts): keep max value (None sorts first)
    seen: dict = {}
    for k, t, v in rraw:
        cur = seen.get((k, t), ("absent",))
        if cur == ("absent",) or (v is not None and (
                cur[0] is None or v > cur[0])):
            seen[(k, t)] = (v,)
    rrows = [(k, t, v[0]) for (k, t), v in seen.items()]

    left = spark.createDataFrame(lrows, "k int, ts timestamp, lid int")
    right = spark.createDataFrame(rrows, "k int, ts timestamp, rv double")

    for direction in ("backward", "forward"):
        for tol in (None, 600.0):
            got = {
                r["lid"]: (r["rv"], r["matched_ts"])
                for r in asof_join(
                    left, right, "k", "ts", right_cols=["rv"],
                    direction=direction, tolerance_sec=tol,
                ).collect()
            }
            for k, t, lid in lrows:
                cand = [
                    (rt, rv) for (rk, rt, rv) in rrows
                    if rk == k
                    and (rt <= t if direction == "backward" else rt >= t)
                ]
                if cand:
                    rt, rv = (max if direction == "backward" else min)(
                        cand, key=lambda c: c[0]
                    )
                    if tol is not None and abs(
                        (t - rt).total_seconds()
                    ) > tol:
                        rt = rv = None
                else:
                    rt = rv = None
                assert got[lid] == (rv, rt), (direction, tol, lid)


def test_sessionize_randomized_vs_bruteforce(spark):
    import numpy as np

    rng = np.random.default_rng(9)
    rows = [
        (int(rng.integers(0, 5)),
         _naive(int(rng.integers(0, 59)), int(rng.integers(0, 60))), i)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "u int, ts timestamp, eid int")
    got = {
        r["eid"]: r["session_id"]
        for r in sessionize(
            df, "u", "ts", gap_sec=120.0, tiebreak=["eid"]
        ).collect()
    }
    by_user: dict = {}
    for u, t, eid in rows:
        by_user.setdefault(u, []).append((t, eid))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        for t, eid in evs:
            if prev is None or (t - prev).total_seconds() > 120.0:
                sid += 1
            want[eid] = sid
            prev = t
    assert got == want


def test_point_in_interval_join_bruteforce(spark):
    """Seeded random points/intervals (nested, overlapping, degenerate
    zero-length, boundary-equal) vs per-row brute force; inner + left;
    plan stays a shuffled equi-join."""
    import itertools
    import numpy as np

    from choetl_spark.operators import point_in_interval_join

    rng = np.random.default_rng(5)
    pts = [
        (int(rng.integers(0, 3)), float(rng.integers(0, 1000)), i)
        for i in range(80)
    ]
    ivs = []
    for j in range(40):
        lo = float(rng.integers(0, 1000))
        ivs.append(
            (int(rng.integers(0, 3)), lo,
             lo + float(rng.integers(0, 200)), 1000 + j)
        )
    p = spark.createDataFrame(pts, "k int, x double, pid int")
    v = spark.createDataFrame(ivs, "k int, lo double, hi double, vid int")

    want = {
        (pid, vid)
        for (pk, x, pid), (vk, lo, hi, vid) in itertools.product(pts, ivs)
        if pk == vk and lo <= x <= hi
    }
    for width in (50.0, 500.0, None):
        got = point_in_interval_join(
            p, v, "x", "lo", "hi", on="k", bucket_width=width
        )
        assert {(r["pid"], r["vid"]) for r in got.collect()} == want, width

    left = point_in_interval_join(
        p, v, "x", "lo", "hi", on="k", bucket_width=100.0, how="left"
    )
    rows = left.collect()
    matched_pids = {pid for pid, _ in want}
    assert {(r["pid"], r["vid"]) for r in rows if r["vid"] is not None} \
        == want
    assert {r["pid"] for r in rows if r["vid"] is None} \
        == {pid for (_, _, pid) in pts if pid not in matched_pids}

    plan = point_in_interval_join(
        p, v, "x", "lo", "hi", on="k", bucket_width=100.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan

    import pytest as _pytest

    with _pytest.raises(ValueError, match="collision"):
        point_in_interval_join(
            p.withColumnRenamed("pid", "vid"), v, "x", "lo", "hi", on="k",
            bucket_width=10.0,
        )


def test_point_in_interval_join_null_payload_and_cap(spark):
    from choetl_spark.operators import point_in_interval_join

    # a matched point with a NULL payload column must appear exactly
    # once (NULL-safe anti-join), and an unmatched NULL-payload point
    # exactly once with NULL interval cols
    p = spark.createDataFrame(
        [(5.0, None), (500.0, None)], "x double, tag string"
    )
    v = spark.createDataFrame([(0.0, 10.0, 7)], "lo double, hi double, vid int")
    rows = point_in_interval_join(
        p, v, "x", "lo", "hi", bucket_width=10.0, how="left"
    ).collect()
    assert sorted((r["x"], r["vid"]) for r in rows) == [
        (5.0, 7), (500.0, None),
    ]

    # large numeric domains must NOT route through a timestamp cast:
    # values beyond timestamp range join exactly
    big = 4_000_000_000_000_000.0  # > timestamp micros range as seconds
    p2 = spark.createDataFrame([(big + 5.0, 1)], "x double, pid int")
    v2 = spark.createDataFrame(
        [(big, big + 10.0, 2)], "lo double, hi double, vid int"
    )
    got = point_in_interval_join(
        p2, v2, "x", "lo", "hi", bucket_width=10.0
    ).collect()
    assert [(r["pid"], r["vid"]) for r in got] == [(1, 2)]

    # an open-ended sentinel interval must refuse loudly, not explode
    import pytest as _pytest

    sentinel = spark.createDataFrame(
        [(0.0, 1e12, 1)], "lo double, hi double, vid int"
    )
    with _pytest.raises(ValueError, match="max_buckets"):
        point_in_interval_join(
            p2, sentinel, "x", "lo", "hi", bucket_width=1.0
        )


def test_time_window_pairs_no_nested_loop(spark):
    df = spark.range(50).select(
        (F.col("id") % 5).alias("u"),
        F.timestamp_seconds(F.col("id") * 37).alias("ts"),
        F.col("id").alias("eid"),
    )
    plan = time_window_pairs(
        df, "u", "ts", "eid", 120.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
