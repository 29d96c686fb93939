"""Stateful streaming sessionization (applyInPandasWithState +
EventTimeTimeout): sessions close on in-batch gaps, carry state across
micro-batches, and idle keys close via the event-time watermark."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from choetl_spark.streaming import sessionize_stream


def _write_batch(spark, path, rows, mtime):
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    df.coalesce(1).write.parquet(str(path))
    # the file source orders micro-batches by modification time; pin it
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))
    os.utime(path, (mtime, mtime))


def _naive(sec):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def test_sessionize_stream_gap_and_timeout(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    now = time.time()
    # batch 1: user 1 has a 2-event session (0s, 60s) then a lone event
    # at 10000s — both stay open (watermark is still 0 during batch 1);
    # the first closes via timeout once the watermark passes 360s
    _write_batch(
        spark, src / "f1",
        [(1, _naive(0)), (1, _naive(60)), (1, _naive(10000))],
        now,
    )
    # batch 2 advances the watermark to 20000s (user 2 activity only)
    _write_batch(spark, src / "f2", [(2, _naive(20000))], now + 10)
    # batch 3 advances it to 30000s: at batch start the 10300s timeout
    # of user 1's open session is below the 20000s watermark -> closes
    _write_batch(spark, src / "f3", [(2, _naive(30000))], now + 20)

    stream = (
        spark.readStream.schema("user_id int, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    sessions = sessionize_stream(stream, "user_id", "ts", gap_sec=300.0)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert (1, _naive(0), _naive(60), 2) in got          # gap close
    assert (1, _naive(10000), _naive(10000), 1) in got   # watermark timeout
    # user 2's sessions never time out before the stream drains: the
    # 20000s event closes only if a THIRD watermark advance passes its
    # timeout — 30000s landed in the final batch, so it stays open
    assert all(u != 2 or s != _naive(30000) for (u, s, _e, _n) in got)
    assert len(got) == 2 or (2, _naive(20000), _naive(20000), 1) in got


def test_sessionize_stream_out_of_order_within_watermark(spark, tmp_path):
    """An on-time straggler (late but inside the watermark delay) must
    extend a session BACKWARD and bridge two open intervals — exactly
    the batch semantics, which constant-scalar state cannot give."""
    src = tmp_path / "in3"
    src.mkdir()
    now = time.time()
    # batch 1: two events 400s apart (gap 300 -> two open intervals)
    _write_batch(
        spark, src / "f1", [(1, _naive(1000)), (1, _naive(1400))], now
    )
    # batch 2: straggler at 1200s bridges them into ONE session
    # (watermark delay 1h keeps it on-time); also a null ts row, which
    # must be ignored, not crash the kernel
    _write_batch(
        spark, src / "f2", [(1, _naive(1200)), (1, None)], now + 10
    )
    # batch 3+4: push the watermark far ahead so the merged session closes
    _write_batch(spark, src / "f3", [(9, _naive(100_000))], now + 20)
    _write_batch(spark, src / "f4", [(9, _naive(200_000))], now + 30)

    stream = (
        spark.readStream.schema("user_id int, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        sessionize_stream(
            stream, "user_id", "ts", gap_sec=300.0,
            watermark_delay="1 hour",
        )
        .writeStream.format("memory")
        .queryName("sess_ooo")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql(
            "SELECT * FROM sess_ooo WHERE user_id = 1"
        ).collect()
    }
    assert got == {(1, _naive(1000), _naive(1400), 3)}


def test_sessionize_stream_matches_batch_operator(spark, tmp_path):
    """Feed a deterministic event set through the stream (single batch +
    a far-future watermark pusher) and through the BATCH sessionize; the
    closed streaming sessions must agree with the batch session spans."""
    from choetl_spark.operators import sessionize

    rows = [
        (1, _naive(0)), (1, _naive(100)), (1, _naive(900)),
        (3, _naive(50)), (3, _naive(60)), (3, _naive(1500)),
    ]
    src = tmp_path / "in2"
    src.mkdir()
    now = time.time()
    _write_batch(spark, src / "f1", rows, now)
    _write_batch(spark, src / "f2", [(99, _naive(10_000_000))], now + 10)
    _write_batch(spark, src / "f3", [(99, _naive(20_000_000))], now + 20)

    stream = (
        spark.readStream.schema("user_id int, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        sessionize_stream(stream, "user_id", "ts", gap_sec=300.0)
        .writeStream.format("memory")
        .queryName("sess_cmp")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql(
            "SELECT * FROM sess_cmp WHERE user_id != 99"
        ).collect()
    }

    batch = spark.createDataFrame(rows, "user_id int, ts timestamp")
    spans = (
        sessionize(batch, "user_id", "ts", gap_sec=300.0)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("s"),
            F.max("ts").alias("e"),
            F.count("*").alias("n"),
        )
    )
    want = {
        (r["user_id"], r["s"], r["e"], r["n"]) for r in spans.collect()
    }
    assert streamed == want
