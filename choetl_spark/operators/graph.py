"""Link-graph analytics over the outlink edge list.

The web graph a crawl pipeline derives from
:func:`choetl_spark.operators.with_outlinks`: PageRank for
page-importance weighting (crawl prioritization, quality signals for
training-data mixtures — the public Brin & Page 1998 algorithm) on top
of the existing :func:`connected_components` component labeling.

Scale shape: every iteration is one equi-join of the checkpointed
ranks onto the edges (on src), ONE map-side-combined groupBy
(contributions by dst), and one join back onto the static
(node, deg) frame — three exchanges over the (src, dst) long-pair
projection, never over page content — plus one scalar aggregate for
the dangling mass (the driver receives ONE double per round, never
rows). The degree frame is computed ONCE and checkpointed; lineage is
truncated per round (localCheckpoint) so n_iter rounds cannot build an
n_iter-deep plan. Iterations are fixed-count (the standard practice
for web-scale PageRank — ~10 rounds reaches ranking stability;
convergence deltas cost an extra pass).

Node ids are LONGS: :func:`with_outlinks` URLs must be hashed first
(``F.xxhash64(url)`` — 8-byte keys keep the per-round shuffle at 16
bytes/edge instead of shipping full URL strings every iteration); a
string edge column raises instead of silently null-casting to an
empty graph.

No reference analog (ChoETL has no graph surface); built from the
public algorithm statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _long_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct (src, dst) long pairs; raises on string node ids (a
    silent cast would null every URL and return an empty graph)."""
    for c in (src, dst):
        t = edges.schema[c].dataType.typeName()
        if t in ("string", "binary"):
            raise TypeError(
                f"graph node column {c!r} is {t}; hash ids to long "
                "first, e.g. F.xxhash64(col) over with_outlinks output"
            )
    return (
        edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint()
    )


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
    e = _long_edges(edges, src, dst)
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # static (node, deg) frame, built ONCE — deg null => dangling; the
    # per-round update joins contributions back onto this instead of
    # recomputing degrees every iteration
    nodes_deg = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(out_deg, F.col("node") == out_deg.src, "left")
        .select("node", "deg")
        .localCheckpoint()
    )
    n = nodes_deg.count()
    if n == 0:
        return nodes_deg.select("node").withColumn("rank", F.lit(0.0))
    ranks = nodes_deg.select("node", F.lit(1.0 / n).alias("rank"), "deg")
    for _ in range(n_iter):
        # dangling mass rides as a broadcast 1-row frame crossJoined
        # into the update instead of a driver-side collect: the round's
        # ONLY action is its lineage-truncating localCheckpoint — no
        # per-iteration full-stage barrier on the driver (round-3
        # advice; at 100x scale each collect was a cluster-wide sync)
        dang = ranks.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling")
        )
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("received"))
        )
        ranks = (
            nodes_deg.join(contrib, nodes_deg.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("dangling") / F.lit(float(n))
                    + F.lit(damping) * F.coalesce("received", F.lit(0.0))
                ).alias("rank"),
                "deg",
            )
            .localCheckpoint()
        )
    return ranks.select("node", "rank")


def hits(
    edges: DataFrame,
    n_iter: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, hub, auth) after ``n_iter`` HITS iterations (Kleinberg
    1999, "Authoritative sources in a hyperlinked environment" — public
    algorithm): authorities are pages good hubs point AT, hubs are pages
    that point at good authorities. The anchor/link analog of PageRank
    for intra-corpus quality signals.

    Update rule, kept exactly SQL-replayable for the driver oracle:

      - duplicate edges collapse; nodes = distinct(src) ∪ distinct(dst)
      - hub_0 = auth_0 = 1/N
      - each round: auth'(v) = Σ_{u→v} hub(u), then L1-normalized
        (auth = auth'/Σauth'); hub'(u) = Σ_{u→v} auth(v), L1-normalized.
        L1 instead of the textbook L2 keeps the oracle's CTE chain in
        plain SQL; normalization choice rescales, never reranks.

    Scale shape: per round, TWO equi-joins + TWO groupBys over the
    (src, dst) long-pair projection (16 bytes/edge of shuffle); the two
    L1 norms ride as broadcast 1-row frames inside the same job (no
    driver collects); lineage truncated per round (localCheckpoint)
    like :func:`pagerank`. Nodes with no in-edges
    have auth 0, nodes with no out-edges hub 0 — both stay in the
    output.
    """
    e = _long_edges(edges, src, dst)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("hub", F.lit(0.0)).withColumn(
            "auth", F.lit(0.0)
        )
    scores = nodes.select(
        "node", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth")
    )
    for _ in range(n_iter):
        # auth'(v) = sum of hub over in-neighbors, L1-normalized
        a_raw = (
            e.join(scores, e.src == scores.node)
            .groupBy("dst")
            .agg(F.sum("hub").alias("a_raw"))
        )
        a = nodes.join(a_raw, nodes.node == a_raw.dst, "left").select(
            "node", F.coalesce("a_raw", F.lit(0.0)).alias("a_raw")
        )
        # L1 norms ride as broadcast 1-row frames instead of per-round
        # driver collects (same rationale as pagerank): the round's only
        # action is its localCheckpoint. The norm's aggregate subtree is
        # re-evaluated inside the same job — identical total work to the
        # old collect-then-rescan, minus two driver barriers per round.
        a_sum = a.agg(
            F.coalesce(F.sum("a_raw"), F.lit(0.0)).alias("a_sum")
        )
        a = a.crossJoin(F.broadcast(a_sum)).select(
            "node",
            (
                F.col("a_raw")
                / F.when(F.col("a_sum") == 0.0, F.lit(1.0)).otherwise(
                    F.col("a_sum")
                )
            ).alias("auth"),
        )
        # hub'(u) = sum of the NEW auth over out-neighbors, L1-normalized
        h_raw = (
            e.join(a, e.dst == a.node)
            .groupBy("src")
            .agg(F.sum("auth").alias("h_raw"))
        )
        h = nodes.join(h_raw, nodes.node == h_raw.src, "left").select(
            "node", F.coalesce("h_raw", F.lit(0.0)).alias("h_raw")
        )
        h_sum = h.agg(
            F.coalesce(F.sum("h_raw"), F.lit(0.0)).alias("h_sum")
        )
        h = h.crossJoin(F.broadcast(h_sum)).select(
            "node",
            (
                F.col("h_raw")
                / F.when(F.col("h_sum") == 0.0, F.lit(1.0)).otherwise(
                    F.col("h_sum")
                )
            ).alias("hub"),
        )
        scores = (
            h.join(a, "node").select("node", "hub", "auth").localCheckpoint()
        )
    return scores
