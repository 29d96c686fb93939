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
