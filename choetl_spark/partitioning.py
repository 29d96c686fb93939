"""Partition planning: stable partition ids, hot-host salting.

Partition ids are derived from the DATA (xxhash64 of the partition key),
never from ``spark_partition_id()``, so they are stable across runs,
cluster sizes, and AQE re-plans — the property the resume ledger keys on.

Skew handling (north rule): partitioning by host co-locates same-domain
pages (longer runs, better dictionaries — the RLE-ordering insight from
SIGMOD 2020, see SURVEY.md §4), but hot domains would then explode a
partition. Hosts whose row share exceeds ``hot_factor / num_partitions``
get salted across ``salt_buckets`` partitions. The hot-host set is found
with one map-side-combined groupBy and broadcast back — at 10^12 rows the
hot set is tiny (it's a top-k by definition), so the join is a broadcast
hash join, never a shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_host(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn(
        "_host", F.parse_url(F.col(url_col), F.lit("HOST"))
    )


def plan_partitions(
    df: DataFrame,
    num_partitions: int,
    key_col: str = "url",
    by_host: bool = True,
    hot_factor: float = 2.0,
    salt_buckets: int = 16,
    sample_fraction: float = 1.0,
) -> DataFrame:
    """Return df + ``part_id`` column (long in [0, num_partitions)).

    ``sample_fraction < 1`` runs the hot-host census on a seeded sample
    of the input — at extreme scale an exact census is an extra full
    scan; a hot host is by definition a large fraction of rows, so a
    small sample finds it with near-certainty and the threshold scales
    by the fraction."""
    if not by_host:
        return df.withColumn(
            "part_id", F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_partitions))
        )
    df = with_host(df, key_col)
    # One pass for the skew census: per-host counts are map-side combined
    # and tiny relative to the data; total derives from the same aggregate
    # (no second scan of the big side).
    census_src = (
        df.sample(fraction=sample_fraction, seed=42)
        if sample_fraction < 1.0
        else df
    )
    host_counts = census_src.groupBy("_host").count().persist()
    total = host_counts.agg(F.sum("count").alias("t")).collect()[0]["t"] or 0
    threshold = max(int(total * hot_factor / num_partitions), 1)
    hot = (
        host_counts.filter(F.col("count") > threshold)
        .select("_host", F.lit(True).alias("_hot"))
    )
    out = (
        df.join(F.broadcast(hot), "_host", "left")
        .withColumn(
            "part_id",
            F.when(
                F.col("_hot").isNotNull(),
                F.pmod(
                    F.xxhash64(F.col("_host"))
                    + F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt_buckets)),
                    F.lit(num_partitions),
                ),
            ).otherwise(F.pmod(F.xxhash64(F.col("_host")), F.lit(num_partitions))),
        )
        .drop("_hot", "_host")
    )
    return out


def diagnose_skew(
    df: DataFrame,
    key: str | list,
    num_partitions: int = 256,
    top: int = 20,
    hot_factor: float = 2.0,
) -> dict:
    """Pre-flight skew report for a shuffle key: the observability half
    of the salting story (plan_partitions applies the fix; this tells
    you whether you need it and how big to size it).

    ONE scan of the input (a map-side-combined key aggregation, cached
    as the per-key count frame) feeding two metadata-sized jobs: a
    totals aggregate and a top-k collect. Returns totals, the top-N
    heaviest keys with their row share, and a recommended
    ``salt_buckets`` — the bucket count that brings the heaviest key's
    share back under ``hot_factor`` even-partition shares (the same
    threshold plan_partitions salts at). ``skewed`` is True when any
    key crosses that threshold.
    """
    keys = [key] if isinstance(key, str) else list(key)
    counts = df.groupBy(*keys).count().persist()
    try:
        agg = counts.agg(
            F.coalesce(F.sum("count"), F.lit(0)).alias("total"),
            F.count("*").alias("n_keys"),
        ).collect()[0]
        total, n_keys = int(agg["total"]), int(agg["n_keys"])
        if total == 0:
            return {
                "total_rows": 0, "n_keys": 0, "top": [],
                "skewed": False, "recommended_salt_buckets": 1,
            }
        top_rows = counts.orderBy(F.desc("count")).limit(top).collect()
    finally:
        counts.unpersist()
    even = total / max(num_partitions, 1)
    threshold = max(even * hot_factor, 1.0)
    heaviest = top_rows[0]["count"] if top_rows else 0
    rec = max(1, int(-(-heaviest // threshold)))  # ceil
    return {
        "total_rows": int(total),
        "n_keys": int(n_keys),
        "even_share_per_partition": even,
        "hot_threshold_rows": threshold,
        "top": [
            {
                "key": {k: r[k] for k in keys},
                "rows": int(r["count"]),
                "share": r["count"] / total,
            }
            for r in top_rows
        ],
        "skewed": heaviest > threshold,
        "recommended_salt_buckets": rec,
    }
