"""robots.txt (RFC 9309, the Robots Exclusion Protocol) — parse the
per-host policy files a crawl collects and evaluate crawlability for
every page URL, the politeness gate a Common-Crawl-style pipeline runs
before (re-)fetching and the provenance filter it runs after.

Two halves, both declarative:

:func:`parse_robots`
    robots bodies ``(host, body)`` -> a RULES table ``(host, rule,
    pattern)`` for ONE user-agent product token: lines are exploded and
    parsed with codegen'd regexps, stanzas are grouped with a running
    window sum (consecutive ``User-agent`` lines share the following
    rules, per the RFC), and the agent's groups are selected with the
    RFC's fallback — exact (case-insensitive) product-token groups if
    any exist for the host, else the ``*`` groups. All metadata-scale:
    the rules table is rows-per-host x rules, never rows-per-page.

:func:`robots_allowed`
    pages x rules -> pages + a boolean verdict column, as a PURE MAP
    over the pages: the rules collapse to ONE array row per host
    (tiny), broadcast-join onto the pages, and the RFC's
    most-specific-match rule (longest pattern wins; at equal length
    Allow wins) evaluates inside higher-order functions
    (``filter`` + ``aggregate`` over the rule array) — the page table
    is never shuffled, which is the only shape that survives 10^12
    rows. Hosts with no robots file, and URLs no rule matches, are
    allowed (the RFC default).

Pattern semantics: literal prefixes with ``*`` wildcards and a ``$``
end anchor (RFC 9309 §2.2.3), matched against ``path + '?' + query``.
Specificity is pattern octet length — the common implementation of the
RFC's longest-match rule. Patterns compile to anchored Java regexes
with every regex metacharacter escaped; ``regexp_like`` caches the
compiled pattern per distinct value, and a host's rule list is short,
so the match stays cheap.

Reference analog: the reference has no crawl layer — this extends the
web-pipeline surface the task brief asks for; the parse discipline
(line reader -> keyed fields -> grouped records) mirrors its KVP
reader (reference src/ChoETL/File/KeyValue/ChoKVPReader.cs:30).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from choetl_spark.operators.weburl import _parts

__all__ = ["parse_robots", "robots_allowed", "parse_robots_directives"]


def _rule_regex(pattern: Column) -> Column:
    """Compile one robots path pattern to an anchored Java regex:
    escape every metacharacter except ``*`` (kept as the wildcard),
    translate ``*`` -> ``.*``, anchor the start, and honor a trailing
    ``$`` as an end anchor (an unanchored tail is a prefix match —
    Java's ``find()`` semantics make '^...' exactly that)."""
    dollar = pattern.endswith("$")
    core = F.when(
        dollar, F.substring(pattern, 1, F.length(pattern) - 1)
    ).otherwise(pattern)
    esc = F.regexp_replace(core, r"([^A-Za-z0-9*])", r"\\$1")
    rx = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), rx, F.when(dollar, F.lit("$")).otherwise(F.lit(""))
    )


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    agent: str = "*",
) -> DataFrame:
    """Parse robots.txt bodies into the rules that bind ``agent``.

    Returns ``(host, rule, pattern)`` with ``rule`` in
    ``{'allow', 'disallow'}`` and non-empty patterns only (an empty
    ``Disallow:`` means "no restriction" per the RFC and contributes
    nothing). Group selection per host: groups naming the agent's
    product token exactly (case-insensitive) win; hosts without one
    fall back to their ``*`` groups. Rules outside any ``User-agent``
    stanza are invalid per the RFC and dropped.
    """
    w = Window.partitionBy("host").orderBy("pos")
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias(
            "pos", "raw"
        ),
    )
    line = F.trim(F.regexp_replace(F.col("raw"), r"#.*", ""))
    key = F.lower(F.trim(F.regexp_extract(line, r"^([^:]+):", 1)))
    val = F.trim(F.regexp_extract(line, r"^[^:]+:(.*)$", 1))
    parsed = lines.select(
        "host", "pos", key.alias("k"), val.alias("v")
    ).filter(F.col("k").isin("user-agent", "allow", "disallow"))
    # stanza grouping: a run of consecutive user-agent lines opens ONE
    # group that owns the allow/disallow lines after it
    is_ua = (F.col("k") == "user-agent").cast("int")
    parsed = parsed.withColumn(
        "new_group",
        ((is_ua == 1) & (F.lag(is_ua, 1, 0).over(w) == 0)).cast("int"),
    )
    parsed = parsed.withColumn("gid", F.sum("new_group").over(w))
    uas = (
        parsed.filter((F.col("k") == "user-agent") & (F.col("v") != ""))
        .select("host", "gid", F.lower(F.col("v")).alias("ua"))
        .distinct()
    )
    exact = uas.filter(F.col("ua") == agent.lower()).select("host", "gid")
    star = (
        uas.filter(F.col("ua") == "*")
        .join(exact.select("host").distinct(), "host", "left_anti")
        .select("host", "gid")
    )
    chosen = exact.unionByName(star).distinct()
    return (
        parsed.filter(
            F.col("k").isin("allow", "disallow")
            & (F.col("gid") >= 1)  # rules before any stanza are invalid
            & (F.col("v") != "")
        )
        .join(chosen, ["host", "gid"], "semi")
        .select(
            "host",
            F.col("k").alias("rule"),
            F.col("v").alias("pattern"),
        )
        .distinct()
    )


def parse_robots_directives(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """The non-rule directives real robots.txt files carry: one row
    per host with ``crawl_delay`` (seconds, double — the de-facto
    politeness knob honored by most crawlers though absent from RFC
    9309; smallest value wins when stanzas disagree, the conservative
    read) and ``sitemaps`` (array of Sitemap: URLs in file order —
    stanza-independent per the sitemaps.org protocol). Feed
    ``crawl_delay`` to :func:`~choetl_spark.operators.frontier.
    crawl_frontier`'s ``interval_col`` for per-host spacing and the
    sitemap list to the discovery fetcher. Metadata-scale, one
    groupBy on host."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias(
            "pos", "raw"
        ),
    )
    line = F.trim(F.regexp_replace(F.col("raw"), r"#.*", ""))
    key = F.lower(F.trim(F.regexp_extract(line, r"^([^:]+):", 1)))
    # sitemap values contain ':' (the URL scheme) — split on the FIRST
    val = F.trim(F.regexp_extract(line, r"^[^:]+:(.*)$", 1))
    parsed = lines.select("host", "pos", key.alias("k"), val.alias("v"))
    delay = F.when(
        (F.col("k") == "crawl-delay")
        & F.col("v").rlike(r"^\d+(\.\d+)?$"),
        F.col("v").cast("double"),
    )
    sitemap = F.when(
        (F.col("k") == "sitemap") & (F.col("v") != ""), F.col("v")
    )
    return parsed.groupBy("host").agg(
        F.min(delay).alias("crawl_delay"),
        F.array_sort(
            F.collect_list(F.struct("pos", sitemap.alias("u")))
        ).alias("_s"),
    ).select(
        "host",
        "crawl_delay",
        F.filter(
            F.transform(F.col("_s"), lambda s: s["u"]),
            lambda u: u.isNotNull(),
        ).alias("sitemaps"),
    )


def robots_allowed(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    out_col: str = "crawlable",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Add a boolean ``out_col``: may ``agent`` (already baked into
    ``rules`` by :func:`parse_robots`) fetch this URL?

    RFC 9309 evaluation: among the host's rules whose pattern matches
    ``path + '?' + query``, the LONGEST pattern decides; a
    length tie goes to Allow; no match / no robots -> allowed.

    Scale shape: rules collapse to one array row per host and join
    onto the pages map-side (``broadcast_rules=True``, right for
    real-crawl rule volumes — ~100 B x rules per host; pass False to
    let AQE pick when the rule table rivals executor memory). The
    match + argmax run in higher-order functions over the array, so
    the page table itself is NEVER shuffled.
    """
    per_host = rules.groupBy("host").agg(
        F.collect_list(
            F.struct(
                _rule_regex(F.col("pattern")).alias("rx"),
                F.length("pattern").alias("l"),
                (F.col("rule") == "allow").cast("int").alias("a"),
            )
        ).alias("_rules")
    )
    if broadcast_rules:
        per_host = F.broadcast(per_host)
    p = _parts(F.col(url_col))
    target = F.concat(
        F.when(p["path"] == "", F.lit("/")).otherwise(p["path"]),
        F.when(
            p["query"] != "", F.concat(F.lit("?"), p["query"])
        ).otherwise(F.lit("")),
    )
    joined = pages.withColumn("_rb_host", p["host"]).join(
        per_host.withColumnRenamed("host", "_rb_host"),
        "_rb_host",
        "left",
    )
    tgt = F.coalesce(target, F.lit("/"))
    best = F.aggregate(
        F.filter(
            F.coalesce(
                F.col("_rules"),
                F.array().cast(
                    "array<struct<rx:string,l:int,a:int>>"
                ),
            ),
            lambda r: F.regexp_like(tgt, r["rx"]),
        ),
        # init: shorter than any real match and Allow — the RFC default
        F.struct(F.lit(-1).alias("l"), F.lit(1).alias("a")),
        lambda acc, r: F.when(
            F.struct(r["l"].alias("l"), r["a"].alias("a")) > acc,
            F.struct(r["l"].alias("l"), r["a"].alias("a")),
        ).otherwise(acc),
    )
    return (
        joined.withColumn(out_col, best["a"] == 1)
        .drop("_rb_host", "_rules")
    )
