"""Link-graph analytics over the outlink edge list.

The web graph a crawl pipeline derives from
:func:`choetl_spark.operators.with_outlinks`: PageRank for
page-importance weighting (crawl prioritization, quality signals for
training-data mixtures — the public Brin & Page 1998 algorithm) on top
of the existing :func:`connected_components` component labeling.

Scale shape: every iteration is ONE equi-join (ranks onto edges, on
src) and ONE groupBy (contributions by dst) — 2 shuffles on the (src,
dst) long-pair projection, never on page content. Dangling mass (nodes
with no outlinks) is redistributed uniformly each round via a single
scalar aggregate; lineage is truncated per round (localCheckpoint) so
n_iter rounds cannot build an n_iter-deep plan. Iterations are
fixed-count (the standard practice for web-scale PageRank — ~10 rounds
reaches ranking stability; convergence deltas cost an extra pass).

No reference analog (ChoETL has no graph surface); built from the
public algorithm statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, rank) after ``n_iter`` synchronous power iterations.

    Semantics (kept exactly SQL-replayable so the driver oracle can
    recompute every round):

      - nodes = distinct(src) ∪ distinct(dst); N = count(nodes)
      - rank_0 = 1/N for every node
      - each round: every node sends rank/out_degree along each out
        edge; dangling nodes (out_degree 0) send their whole rank to
        every node uniformly;
        rank' = (1-d)/N + d * (received + dangling_mass/N)
      - duplicate (src, dst) edges are collapsed first (a page linking
        twice is one edge, the standard web-graph convention)

    Total rank mass stays 1.0 every round (dangling redistribution
    closes the leak), which the tests pin.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # ranks: (node, rank, deg) — deg null => dangling
    ranks = nodes.join(
        out_deg, nodes.node == out_deg.src, "left"
    ).select("node", F.lit(1.0 / n).alias("rank"), "deg")
    for _ in range(n_iter):
        dangling = (
            ranks.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("received"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("received", F.lit(0.0))
                ).alias("rank"),
            )
            .join(out_deg, F.col("node") == out_deg.src, "left")
            .select("node", "rank", "deg")
            .localCheckpoint()
        )
    return ranks.select("node", "rank")
