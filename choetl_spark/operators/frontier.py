"""Crawl-frontier scheduling — turn a scored URL universe into a
polite, prioritized fetch plan, the step that closes the crawl loop
(link graph -> PageRank -> robots -> WHAT TO FETCH NEXT, WHEN).

Two pieces:

:func:`sitemap_entries`
    Parse sitemap XML bodies (sitemaps.org protocol: ``<urlset>`` leaf
    sitemaps and ``<sitemapindex>`` indexes) into one row per entry —
    the crawl-discovery feed that complements outlink extraction. Pure
    codegen (regexp_extract_all + higher-order transforms) in the
    Java ∩ RE2 subset, so a DuckDB oracle mirrors it.

:func:`crawl_frontier`
    Per-host politeness scheduling: keep each host's top
    ``k_per_host`` URLs by a caller score (PageRank, freshness, ...),
    then space fetches ``interval_sec`` apart within the host — the
    classic Mercator frontier shape (Heydon & Najork 1999: prioritize
    globally, serialize per host). ONE window shuffle on host; Spark's
    rank-limit pushdown (``WindowGroupLimit``) turns the top-k into a
    map-side partial before the exchange, so the shuffle carries
    O(hosts x k), not O(urls), when k is small. Composes with
    :func:`choetl_spark.operators.robots.robots_allowed` upstream for
    the politeness *permission* half.

Reference analog: none (the reference has no crawl layer); this
extends the web-pipeline surface of the task brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from choetl_spark.operators.weburl import _parts

__all__ = ["sitemap_entries", "crawl_frontier"]

_SM_ENTRY_RE = r"(?is)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"


def _tag(block, name: str):
    return F.regexp_extract(
        block, rf"(?is)<{name}[^>]*>\s*(.*?)\s*</{name}>", 1
    )


def sitemap_entries(
    df: DataFrame, body_col: str = "body"
) -> DataFrame:
    """Explode sitemap XML bodies into entries: ``loc`` (required —
    entries without one are dropped), ``lastmod`` / ``changefreq`` /
    ``priority`` ('' when absent), and ``is_index`` (true when the
    body is a ``<sitemapindex>`` — its locs are MORE sitemaps to
    fetch, not pages). All original columns are kept."""
    body = F.col(body_col).cast("string")
    is_index = body.rlike(r"(?is)<\s*sitemapindex")
    blocks = F.regexp_extract_all(body, F.lit(_SM_ENTRY_RE), F.lit(1))
    entries = F.transform(
        blocks,
        lambda b: F.struct(
            _tag(b, "loc").alias("loc"),
            _tag(b, "lastmod").alias("lastmod"),
            _tag(b, "changefreq").alias("changefreq"),
            _tag(b, "priority").alias("priority"),
        ),
    )
    entries = F.filter(entries, lambda e: e["loc"] != "")
    return (
        df.withColumn("_entry", F.explode(entries))
        .select(
            "*",
            F.col("_entry.loc").alias("loc"),
            F.col("_entry.lastmod").alias("lastmod"),
            F.col("_entry.changefreq").alias("changefreq"),
            F.col("_entry.priority").alias("priority"),
            is_index.alias("is_index"),
        )
        .drop("_entry")
    )


def crawl_frontier(
    urls: DataFrame,
    k_per_host: int,
    score_col: str | None = None,
    interval_sec: float = 1.0,
    url_col: str = "url",
    crawlable_col: str | None = None,
    interval_col: str | None = None,
) -> DataFrame:
    """Prioritized, host-polite fetch plan.

    Adds ``host``, ``fetch_rank`` (1-based priority within the host:
    by ``score_col`` DESCENDING when given, ties and the no-score case
    broken by URL ascending for determinism) and ``fetch_offset_sec``
    (``(fetch_rank - 1) * interval_sec`` — the earliest polite fetch
    time relative to the host's first request, the one-connection-
    per-host serialization every crawler enforces). Keeps only each
    host's top ``k_per_host`` rows. ``crawlable_col`` names a boolean
    (from :func:`~choetl_spark.operators.robots.robots_allowed`) —
    disallowed rows are dropped BEFORE ranking so they don't occupy
    fetch slots. ``interval_col`` names a per-row seconds column (the
    host's robots ``crawl_delay`` joined on by the caller, from
    :func:`~choetl_spark.operators.robots.parse_robots_directives`);
    null falls back to ``interval_sec``.

    Plan shape: one hash exchange on host + WindowGroupLimit (partial
    top-k before the shuffle). No collect, no second shuffle."""
    out = urls.withColumn("host", _parts(F.col(url_col))["host"])
    if crawlable_col is not None:
        out = out.filter(F.col(crawlable_col))
    order = (
        [F.col(score_col).desc(), F.col(url_col).asc()]
        if score_col is not None
        else [F.col(url_col).asc()]
    )
    w = Window.partitionBy("host").orderBy(*order)
    per = (
        F.coalesce(
            F.col(interval_col).cast("double"),
            F.lit(float(interval_sec)),
        )
        if interval_col is not None
        else F.lit(float(interval_sec))
    )
    out = (
        out.withColumn("fetch_rank", F.row_number().over(w))
        .filter(F.col("fetch_rank") <= k_per_host)
        .withColumn(
            "fetch_offset_sec",
            (F.col("fetch_rank") - 1).cast("double") * per,
        )
    )
    return out
