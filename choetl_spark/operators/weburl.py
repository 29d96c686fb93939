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

import pandas as pd

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


def with_surt(
    df: DataFrame, url_col: str = "url", out_col: str = "surt"
) -> DataFrame:
    """SURT key (Sort-friendly URI Reordering Transform) — the sort /
    range-partition key of web-archive capture indexes (Common Crawl's
    CDXJ, OpenWayback): lowercase the host, drop a leading ``www.``
    label, REVERSE the remaining labels comma-joined, then append
    ``)`` + path (+ ``?`` + query). Reversal makes every host of a
    registered domain contiguous under a range scan — the property the
    index's binary-searchable sort depends on, and exactly what
    ``rewrite_clustered(sort)`` wants as its key for web-page stores.

    ``www2.host.example.com/de/7`` -> ``com,example,host,www2)/de/7``.

    Pure codegen chain (split / reverse / concat_ws) with a DuckDB
    twin (``list_reverse`` + ``array_to_string``), so oracle queries
    mirror it byte-for-byte. Scheme-less input yields ``''`` host ->
    surt ``)``-prefixed; filter upstream if that matters."""
    p = _parts(F.col(url_col))
    host = F.regexp_replace(p["host"], r"^www\.", "")
    rev = F.concat_ws(",", F.reverse(F.split(host, r"\.")))
    surt = F.concat(
        rev,
        F.lit(")"),
        F.when(p["path"] == "", F.lit("/")).otherwise(p["path"]),
        F.when(
            p["query"] != "", F.concat(F.lit("?"), p["query"])
        ).otherwise(F.lit("")),
    )
    return df.withColumn(out_col, surt)


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


# ------------------------------------------------------------ MIME sniff

# (hex-prefix, mime) in precedence order — longer/more-specific first.
# The well-known magic numbers; matching is on the HEX of the leading
# bytes, which both Spark (hex/substring on binary) and DuckDB can
# compute identically.
MAGIC_PREFIXES: list[tuple[str, str]] = [
    ("89504E470D0A1A0A", "image/png"),
    ("25504446", "application/pdf"),
    ("474946383761", "image/gif"),
    ("474946383961", "image/gif"),
    ("FFD8FF", "image/jpeg"),
    ("1F8B", "application/gzip"),
    ("28B52FFD", "application/zstd"),
    ("504B0304", "application/zip"),
    ("494433", "audio/mpeg"),
    ("52494646", "_riff"),  # container: WAV or WEBP, resolved below
    ("4F676753", "application/ogg"),
]


def with_mime_detected(
    df: DataFrame, payload_col: str = "html", out_col: str = "mime"
) -> DataFrame:
    """Content sniffing from magic bytes — what a crawl pipeline runs
    on every fetched payload BEFORE trusting the server's Content-Type
    (mislabelled responses are endemic; decoding a PNG as HTML
    corrupts text extraction, gzip must be inflated first). Detects
    the common binary formats by leading-byte signatures, resolves
    RIFF containers (WAV vs WEBP) by their format tag, and falls back
    to ``text/html`` when the first bytes look like markup, else
    ``text/plain``, else ``application/octet-stream``.

    Pure codegen: one ``hex`` of the first 16 bytes + a CASE chain —
    no UDF, no shuffle; the hex-prefix table is shared with the DuckDB
    oracle so both engines sniff identically. ``payload_col`` may be
    string (cast to binary as utf-8)."""
    raw = F.col(payload_col).cast("binary")
    h = F.upper(F.hex(F.substring(raw, 1, 16)))
    # text fallbacks. The binary->string cast never fails (invalid
    # byte sequences ride through verbatim), so "it casted" proves
    # nothing: a head with a NUL or invalid UTF-8 is BINARY
    # (octet-stream), not text. Leading whitespace (\s incl. \n\t\r)
    # and a UTF-8 BOM are tolerated before the markup probe (real
    # pages often start with a newline before <!DOCTYPE).
    head = F.substring(raw.cast("string"), 1, 256)
    looks_binary = head.contains("\x00") | ~F.expr(
        f"is_valid_utf8(substring(cast(`{payload_col}` as string), 1, 256))"
    )
    text = F.regexp_replace(head, r"^[\s﻿]+", "")
    fallback = (
        F.when(looks_binary, F.lit("application/octet-stream"))
        .when(text.startswith("<"), F.lit("text/html"))
        .when(F.length(text) > 0, F.lit("text/plain"))
        .otherwise(F.lit("application/octet-stream"))
    )
    # the magic CASE chain, most-specific prefix first; fallback is
    # the chain's otherwise
    mime = None
    for prefix, label in MAGIC_PREFIXES:
        cond = h.startswith(prefix)
        if label == "_riff":
            branch = (
                F.when(
                    F.substring(raw, 9, 4) == F.lit(b"WAVE"),
                    "audio/wav",
                )
                .when(
                    F.substring(raw, 9, 4) == F.lit(b"WEBP"),
                    "image/webp",
                )
                .otherwise("application/octet-stream")
            )
        else:
            branch = F.lit(label)
        mime = mime.when(cond, branch) if mime is not None else F.when(
            cond, branch
        )
    mime = mime.otherwise(fallback)
    return df.withColumn(
        out_col,
        F.when(raw.isNull(), F.lit(None).cast("string")).otherwise(mime),
    )


# --------------------------------------------------------------- charset

_META_CHARSET_RE = (
    rb"""charset\s*=\s*["']?\s*([A-Za-z0-9_][A-Za-z0-9._-]*)"""
)


def sniff_charset(
    payload: bytes, declared: str | None = None
) -> str:
    """Charset for one html payload, in the order real crawlers use:
    BOM > Content-Type header charset > <meta charset> in the first
    2 KiB > utf-8. Returns a Python codec name; unknown labels fall
    through to the next source (crawls declare garbage constantly)."""
    import codecs
    import re

    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"
    for cand in (declared, None):
        if cand is None:
            m = re.search(_META_CHARSET_RE, payload[:2048], re.IGNORECASE)
            if not m:
                continue
            cand = m.group(1).decode("ascii", errors="replace")
        else:
            m2 = re.search(
                _META_CHARSET_RE, cand.encode("ascii", errors="replace"),
                re.IGNORECASE,
            )
            if not m2:
                continue
            cand = m2.group(1).decode("ascii", errors="replace")
        try:
            codecs.lookup(cand)
            return cand
        except LookupError:
            continue
    return "utf-8"


def with_html_decoded(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "html_text",
    ctype_col: str | None = None,
) -> DataFrame:
    """Decode raw html bytes (e.g. a WARC response payload) to a string
    column using the page's ACTUAL charset — Common-Crawl html is only
    mostly utf-8; the tail is windows-125x/latin-1/shift_jis/gbk and a
    blind ``F.decode(.., 'utf-8')`` silently mangles it.

    Charset per page: BOM > ``ctype_col`` (the HTTP Content-Type, e.g.
    from :func:`choetl_spark.sources.read_warc`'s
    ``http_content_type``) > ``<meta charset>`` sniff in the first
    2 KiB > utf-8; undecodable bytes take U+FFFD (decode must never
    kill a task). Arrow-batched pandas UDF — a pure map, no shuffle;
    the dominant cost is the C-level ``bytes.decode`` itself. The
    sniff order and the 2 KiB window are the public WHATWG
    encoding-sniffing algorithm's shape (header beats meta, bounded
    prescan)."""
    from pyspark.sql.functions import pandas_udf

    if ctype_col is not None:

        @pandas_udf("string")
        def dec2(html: pd.Series, ctype: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    None
                    if b is None
                    else bytes(b).decode(
                        sniff_charset(bytes(b), c), errors="replace"
                    )
                    for b, c in zip(html, ctype)
                ],
                dtype=object,
            )

        return df.withColumn(out_col, dec2(F.col(html_col), F.col(ctype_col)))

    @pandas_udf("string")
    def dec1(html: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if b is None
                else bytes(b).decode(sniff_charset(bytes(b)), errors="replace")
                for b in html
            ],
            dtype=object,
        )

    return df.withColumn(out_col, dec1(F.col(html_col)))


# --------------------------------------------------------------- outlinks

# href values in single or double quotes — one capture group for both
# styles (an alternation with two groups would return per-match EMPTY
# captures for the other branch and scramble document order), no
# backreferences (Java regex ∩ RE2, DuckDB-mirrorable). The attribute
# name matches case-insensitively via charclasses (legacy HTML writes
# <A HREF=...>; an inline (?i) flag would also lowercase the captured
# VALUE match semantics in some engines, charclasses are unambiguous).
# Values containing the opposite quote character truncate at it —
# real-world URLs percent-encode quotes, and a truncated link is
# strictly safer than a mis-spanned one swallowing html between two
# attributes.
_HREF_RE = """[Hh][Rr][Ee][Ff]\\s*=\\s*["']([^"'<>]*)["']"""


def with_outlinks(
    df: DataFrame,
    html_col: str = "html",
    base_url_col: str | None = "url",
    out_col: str = "outlinks",
) -> DataFrame:
    """Extract the page's outgoing links — the edge list of the web
    graph (crawl frontier expansion, link-based spam/dup clustering;
    feeds :func:`connected_components` / :func:`domain_stats`).

    Pure codegen: ``regexp_extract_all`` over the html (binary columns
    decoded utf-8 first — run :func:`with_html_decoded` upstream for
    charset-correct bytes), scheme-relative (``//host/..``) and
    root-relative (``/path``) hrefs resolved against ``base_url_col``'s
    scheme/host when given; fragments and javascript:/mailto: pseudo
    links dropped. No UDF, no shuffle — a pure map whatever the corpus
    size; the explode-shaped cost is bounded by links-per-page.
    """
    html = F.col(html_col)
    if dict(df.dtypes).get(html_col) == "binary":
        html = F.decode(html, "utf-8")
    raw = F.filter(
        F.regexp_extract_all(html, F.lit(_HREF_RE), 1),
        lambda x: x != F.lit(""),
    )
    # trim (the WHATWG URL parser strips edge whitespace — ' https://x'
    # must classify as absolute, ' javascript:' as a pseudo-scheme),
    # strip fragments, drop pseudo-schemes
    cleaned = F.transform(
        raw, lambda x: F.regexp_replace(F.trim(x), "#.*", "")
    )
    cleaned = F.filter(
        cleaned,
        lambda x: (x != F.lit(""))
        & ~F.lower(x).rlike("^(javascript|mailto|data|tel):"),
    )
    if base_url_col is not None:
        scheme = F.regexp_extract(F.col(base_url_col), _SCHEME_RE, 1)
        origin = F.regexp_extract(
            F.col(base_url_col), r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1
        )
        # resolution only fires against a USABLE base (non-null url
        # with a real scheme/origin): a WARC record with no
        # WARC-Target-URI has url NULL, and concat(NULL, x) would
        # otherwise poison the edge list with NULL elements; a
        # scheme-less base would mint '://host' garbage. Unresolvable
        # relative links stay verbatim — safe, never corrupt.
        has_scheme = scheme.isNotNull() & (scheme != F.lit(""))
        has_origin = origin.isNotNull() & (origin != F.lit(""))
        cleaned = F.transform(
            cleaned,
            lambda x: F.when(x.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), x)
            .when(
                x.startswith("//") & has_scheme,
                F.concat(scheme, F.lit(":"), x),
            )
            .when(
                x.startswith("/") & ~x.startswith("//") & has_origin,
                F.concat(origin, x),
            )
            .otherwise(x),  # relative-path links kept verbatim
        )
    return df.withColumn(out_col, cleaned)


# ------------------------------------------------------------ anchor text

# Full <a ...>text</a> spans: href value captured as group 1 (either
# quote style, same charclass discipline as _HREF_RE), the anchor body
# as group 2 (non-greedy, (?s) so anchors spanning lines match). No
# backreferences/lookaround — Java regex ∩ RE2, so the DuckDB oracle
# runs the IDENTICAL pattern. Two regexp_extract_all passes over the
# same pattern (group 1, then group 2) return the same match spans in
# document order, so the arrays zip positionally.
_ANCHOR_RE = (
    """(?s)<[Aa](?:\\s[^>]*?)?\\s[Hh][Rr][Ee][Ff]\\s*=\\s*["']"""
    """([^"'<>]*)["'][^>]*>(.*?)</[Aa]\\s*>"""
)


def with_anchor_texts(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "anchors",
) -> DataFrame:
    """Extract ``(href, text)`` pairs from every ``<a>`` element — the
    anchor-text signal (link-context labels for training data, the
    classic relevance feature web search built on: the LINKING page
    describes the linked page).

    Returns ``array<struct<href:string, text:string>>``; the text is
    the anchor's visible form — inner tags stripped, whitespace
    collapsed, trimmed. Pure codegen (``regexp_extract_all`` +
    higher-order array fns over the decoded html), zero shuffle, zero
    UDF — same scale shape as :func:`with_outlinks`. Anchors without an
    href attribute (``<a name=...>`` targets) produce no pair; href
    resolution against the page origin is :func:`with_outlinks`'s job —
    this operator reports hrefs verbatim so the pair stays a faithful
    quote of the document.
    """
    html = F.col(html_col)
    if dict(df.dtypes).get(html_col) == "binary":
        html = F.decode(html, "utf-8")
    hrefs = F.transform(
        F.regexp_extract_all(html, F.lit(_ANCHOR_RE), 1),
        # an explicit 1-arg lambda: transform would otherwise feed the
        # element INDEX into F.trim's optional trim-characters parameter
        lambda x: F.trim(x),
    )
    texts = F.transform(
        F.regexp_extract_all(html, F.lit(_ANCHOR_RE), 2),
        lambda x: F.trim(
            F.regexp_replace(
                F.regexp_replace(x, "<[^>]*>", " "), r"\s+", " "
            )
        ),
    )
    pairs = F.arrays_zip(hrefs.alias("href"), texts.alias("text"))
    return df.withColumn(out_col, pairs)
