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
