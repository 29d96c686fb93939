"""Streaming scope + the incremental-encode micro-batch sink.

The reference has NO streaming operators — no watermarks, event-time
windows, or stateful processing anywhere (verified: SURVEY.md §2.10; its
`SkipUntil`/`DoWhile` reader events, reference src/ChoETL/IChoReader.cs:22-23,
are pull-side gating, not event time). The batch north rule's resume
story lives in ``choetl_spark.ledger``.

What streaming adds on top is exactly one semantic: **epochs**. A
micro-batch (Structured Streaming ``foreachBatch``) gets its own
partition-id namespace (``epoch * num_partitions + part_id``), so

- a RETRY of the same epoch (Spark re-runs a failed batch with the same
  batch id) left-anti-joins the ledger and skips completed partitions —
  the engine's resume is precisely the idempotence foreachBatch needs;
- DIFFERENT epochs never collide, so appending new data never lands in
  a partition the ledger already considers done (which would silently
  drop rows — the failure mode of naive Append mode).

Usage with a real stream:

    query = (stream_df.writeStream.foreachBatch(
        lambda batch, epoch: incremental_encode(
            spark, batch, out_dir, cfg, epoch=epoch)
    ).start())
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from choetl_spark.engine import EncodeConfig
from choetl_spark.ledger import encode_with_resume
from choetl_spark.partitioning import plan_partitions


def dedup_stream(
    stream_df: DataFrame,
    ts_col: str,
    text_col: str = "text",
    watermark: str = "10 minutes",
    normalized: bool = True,
) -> DataFrame:
    """Streaming exact dedup for a document feed: fingerprint the text
    (md5 of case/whitespace-normalized content, matching the batch
    ``with_fingerprint``) and keep the first arrival per fingerprint
    within the event-time watermark.

    Built on ``dropDuplicatesWithinWatermark`` — Spark's state-store-
    backed streaming dedup (RocksDB state store on a real cluster), so
    state is bounded by the watermark horizon instead of growing
    forever (the failure mode of plain ``dropDuplicates`` on a stream).
    A crawl feed re-announcing pages within the horizon dedups here;
    long-horizon dedup stays a batch job over the encoded store
    (``operators.dedup_exact``)."""
    if normalized:
        # reuse the batch operator so streaming and batch dedup can
        # never drift apart on the normalization formula
        from choetl_spark.operators.textstats import with_fingerprint

        keyed = with_fingerprint(stream_df, text_col)
    else:
        keyed = stream_df.withColumn("fingerprint", F.md5(F.col(text_col)))
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def sessionize_stream(
    stream_df: DataFrame,
    key: str,
    ts_col: str,
    gap_sec: float,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Stateful streaming gap-sessionization: emits one row per CLOSED
    session ``(key, session_start, session_end, n_events)``. A session
    closes when a later event of the same key arrives more than
    ``gap_sec`` after it, or when the event-time watermark passes its
    timeout (no successor can ever arrive — late data beyond the
    watermark is dropped by Spark before the operator sees it).

    The custom-stateful-operator shape: ``applyInPandasWithState`` with
    EventTimeTimeout. Per-key state is the list of OPEN session
    intervals ``(start, last, n)`` — a session interval closes only
    once the watermark passes ``last + gap_sec`` (no on-time event can
    merge into it anymore), so out-of-order arrivals WITHIN the
    watermark delay sessionize exactly like the batch operator: an
    early straggler extends a session backward or founds its own
    earlier session, and adjacent intervals merge when a straggler
    bridges their gap. The state store (RocksDB on a real cluster)
    holds one small row per ACTIVE key — intervals are closed/GC'd by
    the watermark, so state is bounded by key activity inside the
    watermark horizon, not stream length. Null event times are
    dropped (they carry no position on the session timeline). The
    batch equivalent (same gap rule) is :func:`choetl_spark.operators.
    sessionize`; this is the continuous form.
    """
    import pandas as pd

    gap = float(gap_sec)

    def _merge(intervals: list[list], points: list[float]) -> list[list]:
        """Fold event points into gap-linked intervals (both sides:
        a point within gap of an interval's edge joins it, and two
        intervals bridged by a point merge)."""
        items = [list(iv) for iv in intervals] + [
            [t, t, 1] for t in points
        ]
        items.sort(key=lambda iv: iv[0])
        out: list[list] = []
        for iv in items:
            if out and iv[0] - out[-1][1] <= gap:
                out[-1][1] = max(out[-1][1], iv[1])
                out[-1][2] += iv[2]
            else:
                out.append(iv)
        return out

    def fn(key_tuple, pdf_iter, state):
        if state.exists:
            s_st, l_st, n_st = state.get
            intervals = [
                [s, e, n] for s, e, n in zip(s_st, l_st, n_st)
            ]
        else:
            intervals = []
        if not state.hasTimedOut:
            pts: list[float] = []
            for pdf in pdf_iter:
                ts = pdf[ts_col].dropna()
                pts.extend(ts.astype("int64").to_numpy() / 1e9)
            intervals = _merge(intervals, pts)
        # close every interval no on-time event can still reach:
        # arrivals from here on have ts >= watermark > last + gap
        wm = state.getCurrentWatermarkMs() / 1000.0
        closed = [iv for iv in intervals if iv[1] + gap < wm]
        open_ = [iv for iv in intervals if iv[1] + gap >= wm]
        if open_:
            state.update((
                [float(iv[0]) for iv in open_],
                [float(iv[1]) for iv in open_],
                [int(iv[2]) for iv in open_],
            ))
            # wake when the earliest open interval becomes closable;
            # must sit strictly above the current watermark
            timeout = max(
                int((min(iv[1] for iv in open_) + gap) * 1000) + 1,
                state.getCurrentWatermarkMs() + 1,
            )
            state.setTimeoutTimestamp(timeout)
        elif state.exists:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]] * len(closed),
                    "session_start": pd.to_datetime(
                        [c[0] for c in closed], unit="s"
                    ),
                    "session_end": pd.to_datetime(
                        [c[1] for c in closed], unit="s"
                    ),
                    "n_events": [c[2] for c in closed],
                }
            )

    key_type = stream_df.schema[key].dataType.simpleString()
    out_schema = (
        f"`{key}` {key_type}, session_start timestamp, "
        "session_end timestamp, n_events bigint"
    )
    state_schema = (
        "starts array<double>, lasts array<double>, ns array<bigint>"
    )
    return (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", "EventTimeTimeout"
        )
    )


def upsert_sink(
    spark: SparkSession,
    out_dir: str,
    key: str,
    cfg: EncodeConfig | None = None,
    epoch_base: int | None = None,
    mode: str = "positional",
):
    """CDC-apply sink: a ``foreachBatch`` callable that MERGEs each
    micro-batch into the encoded store by ``key`` — existing rows with
    a matching key are tombstoned and the batch ingests into its own
    epoch-namespaced partition range (:func:`choetl_spark.deletes.
    upsert`), so the store always reflects the latest version of every
    key.

        query = (updates.writeStream.foreachBatch(
            upsert_sink(spark, out_dir, key="url", cfg=cfg)
        ).start())

    Idempotent under Spark's batch-retry contract: a re-run of batch N
    reuses the same epoch (``epoch_base + N``) and run_id, so the
    delete half re-applies harmlessly and the ledger resume skips the
    partitions that already committed. ``epoch_base`` is derived once
    from the ledger at sink creation (clears every existing epoch and
    partition id); a store fed by MULTIPLE concurrent writers needs
    explicitly disjoint bases — same single-writer-per-table caveat as
    an Iceberg streaming MERGE.

    ``mode`` picks the delete flavor. ``"positional"`` (default) scans
    the store's key column per batch to pin exact tombstones — zero
    read-side overhead afterward. ``"eq"`` routes through
    :func:`choetl_spark.eqdeletes.upsert_by_key`: O(batch) write cost
    with NO store scan per micro-batch (the high-frequency CDC shape);
    readers pay the lazy equality-delete resolution until the next
    ``rewrite_partitions``. Both are idempotent under batch replay."""
    from choetl_spark.deletes import next_free_epoch, upsert
    from choetl_spark.eqdeletes import upsert_by_key

    if mode not in ("positional", "eq"):
        raise ValueError(f"mode must be 'positional' or 'eq', got {mode!r}")
    cfg = cfg or EncodeConfig()
    if epoch_base is None:
        # shared collision guard with the batch path (deletes.upsert)
        epoch_base = next_free_epoch(spark, out_dir, cfg.num_partitions)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if mode == "eq":
            upsert_by_key(
                spark, out_dir, key, batch_df, cfg=cfg,
                epoch=int(epoch_base) + int(batch_id),
                run_id=f"equpsert-batch-{int(batch_id)}",
            )
        else:
            upsert(
                spark, out_dir, batch_df, key, cfg=cfg,
                epoch=int(epoch_base) + int(batch_id),
                run_id=f"upsert-batch-{int(batch_id)}",
            )

    return apply_batch


def incremental_encode(
    spark: SparkSession,
    batch_df: DataFrame,
    out_dir: str,
    cfg: EncodeConfig | None = None,
    epoch: int = 0,
    run_id: str | None = None,
) -> dict:
    """Encode one micro-batch into its epoch-namespaced partition range."""
    cfg = cfg or EncodeConfig()
    planned = plan_partitions(
        batch_df,
        cfg.num_partitions,
        key_col=cfg.key_col,
        by_host=cfg.partition_by_host,
        hot_factor=cfg.hot_factor,
        salt_buckets=cfg.salt_buckets,
    ).withColumn(
        "part_id", F.col("part_id") + F.lit(int(epoch) * cfg.num_partitions)
    )
    return encode_with_resume(
        spark, planned, out_dir, cfg, run_id=run_id or f"epoch-{epoch}"
    )
