"""URL parsing, normalization, and domain-level rollups — the first
operations a web-corpus pipeline runs after the WARC scan (grouping by
registered domain, per-host quotas, canonical-URL exact dedup).

Everything is a chain of JVM ``regexp_extract``/``regexp_replace`` calls
(whole-stage codegen, no UDF), restricted to the Java-regex ∩ RE2 subset
with no replacement backreferences, so the DuckDB oracle can mirror the
chain byte-for-byte. Spark's builtin ``parse_url`` exists but is
Java-``URI``-quirky (throws on bare hosts, keeps userinfo); an explicit
chain gives identical cross-engine semantics and stays codegen-friendly.

At 100 TB this is a pure map — no shuffle; the rollup
(:func:`domain_stats`) is a single partial-aggregated groupBy on a
low-cardinality key (registered domains ≪ pages), so the exchange is
tiny post-combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column, functions as F

# RFC 3986-ish scheme, authority, path, query, fragment split. All
# patterns avoid lookaround/backreferences (Java ∩ RE2).
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_DOMAIN_RE = r"([^.]+\.[^.]+)$"
# tracking parameters dropped by canonicalization (the common public
# list). Anchored at a '&' separator — the query is prefixed with '&'
# before this runs, so every param (including the first) has one and
# substrings of legit names ('myfbclid=1') can never match; no
# replacement backreferences needed (RE2 parity).
_TRACKING_RE = r"&(?:utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid)=[^&]*"


def _parts(url: Column) -> dict[str, Column]:
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    authority = F.regexp_extract(url, _AUTH_RE, 1)
    host_port = F.regexp_replace(authority, r"^[^@]*@", "")
    host = F.lower(F.regexp_replace(host_port, r":[0-9]+$", ""))
    port = F.regexp_extract(host_port, r":([0-9]+)$", 1)
    path = F.regexp_extract(url, _PATH_RE, 1)
    # query comes from the PRE-FRAGMENT text: a '?' inside an SPA-style
    # fragment ('/p#/route?tab=2') must not resurrect as a query string
    query = F.regexp_extract(
        F.regexp_replace(url, r"#.*", ""), _QUERY_RE, 1
    )
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "path": path,
        "query": query,
        "registered_domain": F.regexp_extract(host, _DOMAIN_RE, 1),
    }


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Split a URL column into scheme / host / port / path / query /
    registered_domain columns. Userinfo is dropped from the host; host
    and scheme are lowercased; missing components are ``''`` (the
    regexp_extract no-match convention, identical in Spark and DuckDB).
    ``registered_domain`` is the last two labels — the public-suffix
    list is a lookup-table refinement, not a semantics change."""
    parts = _parts(F.col(url_col))
    out = df
    for name, col in parts.items():
        out = out.withColumn(name, col)
    return out


def with_url_canonical(
    df: DataFrame, url_col: str = "url", out_col: str = "url_canon"
) -> DataFrame:
    """Canonical URL for exact dedup / grouping:

      - scheme and host lowercased, userinfo dropped
      - default ports stripped (``:80`` http, ``:443`` https)
      - fragment dropped
      - tracking query params removed (``utm_*``, ``fbclid``,
        ``gclid``, ``msclkid``); a now-empty query drops its ``?``
      - trailing slashes trimmed from the path; empty path → ``/``

    Scheme-less input (no ``<scheme>://``) passes through VERBATIM —
    every part extraction would come up empty and distinct URLs would
    otherwise collapse onto one degenerate '://'-key, poisoning exact
    dedup.

    Chain of codegen'd regexps + concat, no UDF, no backreferences."""
    p = _parts(F.col(url_col))
    keep_port = (p["port"] != "") & ~(
        ((p["scheme"] == "http") & (p["port"] == "80"))
        | ((p["scheme"] == "https") & (p["port"] == "443"))
    )
    # '&'-prefix so _TRACKING_RE's separator anchor covers the first
    # param too, then strip the leading '&'s left by removals
    clean_q = F.regexp_replace(
        F.concat(F.lit("&"), p["query"]), _TRACKING_RE, ""
    )
    clean_q = F.regexp_replace(clean_q, r"^&+", "")
    clean_q = F.regexp_replace(clean_q, r"&+$", "")
    path = F.regexp_replace(p["path"], r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    canon = F.concat(
        p["scheme"],
        F.lit("://"),
        p["host"],
        F.when(keep_port, F.concat(F.lit(":"), p["port"])).otherwise(
            F.lit("")
        ),
        path,
        F.when(clean_q != "", F.concat(F.lit("?"), clean_q)).otherwise(
            F.lit("")
        ),
    )
    canon = F.when(p["scheme"] == "", F.col(url_col)).otherwise(canon)
    return df.withColumn(out_col, canon)


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    text_col: str | None = "text",
) -> DataFrame:
    """Registered-domain rollup: page count, distinct full hosts, and
    (when ``text_col`` is given) total/mean document length — the
    per-domain quota/quality table web pipelines join back against.
    One partial-aggregated groupBy on a small key space."""
    parts = with_url_parts(df, url_col)
    aggs = [
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("host").alias("n_hosts"),
    ]
    if text_col is not None:
        aggs += [
            F.sum(F.length(F.col(text_col)).cast("bigint")).alias(
                "total_chars"
            ),
            F.round(F.avg(F.length(F.col(text_col))), 4).alias(
                "avg_chars"
            ),
        ]
    return parts.groupBy("registered_domain").agg(*aggs)
