"""Relational record operators mirroring ChoETL's record ops, Spark-first.

Each maps a reference capability (SURVEY.md §2.3/2.4/2.7) onto the
declarative DataFrame API so Catalyst owns the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def compare_tables(
    old: DataFrame, new: DataFrame, keys: list[str], status_col: str = "status"
) -> DataFrame:
    """Master-vs-detail diff → New/Changed/Deleted/Unchanged per key.

    The Spark form of ChoETL's sorted merge-walk Compare
    (reference src/ChoETL/Common/ExtensionMethods/ChoEnumerableEx.cs:105-187):
    a full-outer join on the keys plus a value-columns comparison, which
    Catalyst executes as a shuffle-free SMJ when both sides are already
    bucketed, or an SMJ/shuffled-hash otherwise — no driver-side walk.
    """
    vals = [c for c in old.columns if c not in keys]
    o = old.alias("o")
    n = new.alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys]
    joined = o.join(n, cond, "full_outer")
    old_exists = F.col(f"o.{keys[0]}").isNotNull()
    new_exists = F.col(f"n.{keys[0]}").isNotNull()
    changed = F.lit(False)
    for c in vals:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    status = (
        F.when(old_exists & ~new_exists, F.lit("Deleted"))
        .when(~old_exists & new_exists, F.lit("New"))
        .when(changed, F.lit("Changed"))
        .otherwise(F.lit("Unchanged"))
    )
    key_cols = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys
    ]
    return joined.select(*key_cols, status.alias(status_col))


def left_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    broadcast_right: bool = True,
) -> DataFrame:
    """ChoETL LeftJoin (GroupJoin + DefaultIfEmpty,
    reference src/ChoETL/Common/ExtensionMethods/Linq/ChoLeftJoin.cs:13-50).
    Small dimension side is broadcast so the fact side never shuffles."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, "left")


def with_seq_no(
    df: DataFrame, order_by: list[str], partition_by: list[str] | None = None,
    col_name: str = "seq_no", materialize: bool = True,
) -> DataFrame:
    """ChoSequenceNoGenerator
    (reference src/ChoETL/Common/Converters/ChoSeqNoGeneratorConvertor.cs:12-40).

    Partitioned: plain window row_number. UNpartitioned: a global
    ``Window.orderBy`` funnels every row through one task, so instead we
    range-partition on the order keys, count rows per partition (one
    tiny driver collect — the zipWithIndex recipe), and add each
    partition's cumulative offset to its local row number inside a
    ``mapInArrow`` kernel. No single-partition exchange anywhere
    (pinned by tests/test_plans.py)."""
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
        return df.withColumn(col_name, F.row_number().over(w))

    import numpy as np
    import pyarrow as pa

    # localCheckpoint PINS the range partitioning: repartitionByRange
    # re-samples its boundaries per job (seed varies with the RDD id),
    # so without materialization the count job and the numbering job
    # could see DIFFERENT partition boundaries -> duplicated/gapped
    # sequence numbers. One materialization is the same price RDD
    # zipWithIndex pays (its count pass + cached partitions).
    # ``materialize=False`` skips the checkpoint so the exchanges stay
    # visible in the query plan — for plan-shape tests ONLY (it reopens
    # the boundary race on real data).
    sorted_df = df.repartitionByRange(*order_by).sortWithinPartitions(
        *order_by
    )
    if materialize:
        sorted_df = sorted_df.localCheckpoint()
    counts = (
        sorted_df.select(F.spark_partition_id().alias("_pid"))
        .groupBy("_pid")
        .count()
        .collect()
    )
    by_pid = {r["_pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]

    ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", `{col_name}` bigint"

    def kernel(batches):
        from pyspark import TaskContext

        base = offsets.get(TaskContext.get().partitionId(), 0)
        seen = 0
        for batch in batches:
            n = batch.num_rows
            seq = pa.array(
                base + seen + 1 + np.arange(n, dtype=np.int64),
                type=pa.int64(),
            )
            seen += n
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)] + [seq],
                names=list(batch.schema.names) + [col_name],
            )

    return sorted_df.mapInArrow(kernel, ddl)


def top_k(df: DataFrame, order_col: str, k: int, desc: bool = True) -> DataFrame:
    """orderBy + limit → Catalyst TakeOrderedAndProject (no full sort)."""
    key = F.col(order_col).desc() if desc else F.col(order_col).asc()
    return df.orderBy(key).limit(k)


def except_keys(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """Rows of ``left`` whose key has no match in ``right`` (anti join)."""
    return left.join(right, on, "left_anti")
