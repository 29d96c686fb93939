"""robots.txt rules (RFC 9309), SURT keys, and the CDXJ capture index.

Golden cases for the parser/matcher come from the RFC's own examples
(§2.2.2 grouping, §5.1 longest-match) plus the wildcard/anchor grammar
of §2.2.3; the CDXJ round-trip pins the line format byte-for-byte.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from choetl_spark.operators.robots import parse_robots, robots_allowed
from choetl_spark.operators.weburl import with_surt
from choetl_spark.sources import read_cdxj, write_cdxj

ROBOTS_A = """# politeness policy
User-agent: *
Disallow: /private/
Disallow:

User-agent: ccbot
User-agent: otherbot
Disallow: /de/
Allow: /de/open
Disallow: /tmp/*.pdf$
"""

ROBOTS_B = """Disallow: /orphan-rule-before-any-stanza/
User-Agent: *
Allow: /w/
DISALLOW: /w/secret
"""


@pytest.fixture(scope="module")
def robots_df(spark):
    return spark.createDataFrame(
        [("a.example.com", ROBOTS_A), ("b.example.com", ROBOTS_B)],
        "host string, body string",
    )


def _rules(df):
    return sorted(
        (r["host"], r["rule"], r["pattern"]) for r in df.collect()
    )


def test_parse_groups_and_agent_fallback(spark, robots_df):
    # ccbot has an exact group on host a -> star group ignored there;
    # host b has only a star group -> ccbot falls back to it
    got = _rules(parse_robots(robots_df, agent="ccbot"))
    assert got == [
        ("a.example.com", "allow", "/de/open"),
        ("a.example.com", "disallow", "/de/"),
        ("a.example.com", "disallow", "/tmp/*.pdf$"),
        ("b.example.com", "allow", "/w/"),
        ("b.example.com", "disallow", "/w/secret"),
    ]
    # the shared-stanza rule: otherbot sees the SAME group as ccbot
    assert _rules(parse_robots(robots_df, agent="otherbot")) == got
    # an unknown agent gets the star groups (and the empty Disallow
    # contributes nothing); the pre-stanza orphan rule on b is dropped
    star = _rules(parse_robots(robots_df, agent="nobody"))
    assert star == [
        ("a.example.com", "disallow", "/private/"),
        ("b.example.com", "allow", "/w/"),
        ("b.example.com", "disallow", "/w/secret"),
    ]


def _verdicts(spark, rules, urls):
    pages = spark.createDataFrame([(u,) for u in urls], "url string")
    out = robots_allowed(pages, rules)
    return {r["url"]: r["crawlable"] for r in out.collect()}


def test_longest_match_wildcards_and_defaults(spark, robots_df):
    rules = parse_robots(robots_df, agent="ccbot")
    v = _verdicts(
        spark,
        rules,
        [
            "https://a.example.com/de/page",        # disallow /de/
            "https://a.example.com/de/open/page",   # allow wins (longer)
            "https://a.example.com/private/x",      # star rule NOT ccbot's
            "https://a.example.com/tmp/x.pdf",      # wildcard + $ anchor
            "https://a.example.com/tmp/x.pdfx",     # $ anchor rejects
            "https://a.example.com/",               # no rule matches
            "https://b.example.com/w/page",         # fallback group allow
            "https://b.example.com/w/secretx",      # longer disallow wins
            "https://c.example.com/anything",       # no robots -> allowed
        ],
    )
    assert v == {
        "https://a.example.com/de/page": False,
        "https://a.example.com/de/open/page": True,
        "https://a.example.com/private/x": True,
        "https://a.example.com/tmp/x.pdf": False,
        "https://a.example.com/tmp/x.pdfx": True,
        "https://a.example.com/": True,
        "https://b.example.com/w/page": True,
        "https://b.example.com/w/secretx": False,
        "https://c.example.com/anything": True,
    }


def test_length_tie_goes_to_allow_and_query_matching(spark):
    robots = spark.createDataFrame(
        [
            (
                "t.example.com",
                "User-agent: *\nAllow: /p/a\nDisallow: /p/b\n"
                "Disallow: /s?x=1\n",
            )
        ],
        "host string, body string",
    )
    rules = parse_robots(robots, agent="anybot")
    # equal-length allow+disallow both matching: craft via overlapping
    # prefixes of the same length on one path
    robots2 = spark.createDataFrame(
        [("u.example.com", "User-agent: *\nAllow: /dir\nDisallow: /dir\n")],
        "host string, body string",
    )
    rules2 = parse_robots(robots2)
    v = _verdicts(spark, rules, ["https://t.example.com/s?x=1&y=2"])
    assert v["https://t.example.com/s?x=1&y=2"] is False  # query matched
    v2 = _verdicts(spark, rules2, ["https://u.example.com/dir/x"])
    assert v2["https://u.example.com/dir/x"] is True  # RFC: tie -> allow


def test_regex_metacharacters_in_patterns_stay_literal(spark):
    robots = spark.createDataFrame(
        [("m.example.com", "User-agent: *\nDisallow: /a+b(c).d\n")],
        "host string, body string",
    )
    rules = parse_robots(robots)
    v = _verdicts(
        spark,
        rules,
        ["https://m.example.com/a+b(c).d/e", "https://m.example.com/aab"],
    )
    assert v["https://m.example.com/a+b(c).d/e"] is False
    assert v["https://m.example.com/aab"] is True


def test_surt_key(spark):
    df = spark.createDataFrame(
        [
            ("https://www.Host.Example.COM/de/7?q=1",),
            ("http://a.b.example.org:8080/",),
            ("https://example.com",),
        ],
        "url string",
    )
    got = [r["surt"] for r in with_surt(df).collect()]
    assert got == [
        "com,example,host)/de/7?q=1",
        "org,example,b,a)/",
        "com,example)/",
    ]


def test_cdxj_roundtrip_sorted(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("https://b.example.com/2", "2023-07-22 06:05:57", "text/html"),
            ("https://a.example.com/1", "2023-01-01 00:00:00", "text/html"),
            ("https://a.example.com/1", "2024-02-02 02:02:02", "warc/revisit"),
        ],
        "url string, ts string, mime string",
    ).withColumn("warc_ts", F.to_timestamp("ts")).drop("ts")
    out = str(tmp_path / "cdxj")
    write_cdxj(
        df, out, meta_cols=("url", "mime"), num_partitions=2
    )
    back = read_cdxj(spark, out, "url string, mime string")
    rows = sorted(
        (r["surt"], r["ts14"], r["url"], r["mime"])
        for r in back.collect()
    )
    assert rows == [
        ("com,example,a)/1", "20230101000000", "https://a.example.com/1",
         "text/html"),
        ("com,example,a)/1", "20240202020202", "https://a.example.com/1",
         "warc/revisit"),
        ("com,example,b)/2", "20230722060557", "https://b.example.com/2",
         "text/html"),
    ]
    # the index property: every part file is internally sorted
    import glob

    for f in glob.glob(f"{out}/part-*"):
        with open(f) as fh:
            lines = [ln for ln in fh.read().splitlines() if ln]
        assert lines == sorted(lines)


def test_cdxj_null_key_rows_are_excluded(spark, tmp_path):
    """concat_ws silently drops null fields — a capture with a null
    timestamp or url must be excluded, not emitted as a shifted
    two-field line the reader mis-splits."""
    df = spark.createDataFrame(
        [
            ("https://a.example.com/1", "2023-01-01 00:00:00"),
            ("https://a.example.com/2", None),
            (None, "2023-01-01 00:00:00"),
        ],
        "url string, ts string",
    ).withColumn("warc_ts", F.to_timestamp("ts")).drop("ts")
    out = str(tmp_path / "cdxj_nulls")
    write_cdxj(df, out, meta_cols=("url",), num_partitions=1)
    back = read_cdxj(spark, out, "url string")
    rows = back.collect()
    assert [(r["surt"], r["url"]) for r in rows] == [
        ("com,example,a)/1", "https://a.example.com/1")
    ]
    assert rows[0]["ts14"] == "20230101000000"


def test_mime_detection_magic_bytes(spark):
    from choetl_spark.operators.weburl import with_mime_detected

    rows = [
        (b"\x89PNG\r\n\x1a\x0apayload", "image/png"),
        (b"\xff\xd8\xff\xe0JFIF", "image/jpeg"),
        (b"GIF89a....", "image/gif"),
        (b"%PDF-1.7 x", "application/pdf"),
        (b"\x1f\x8b\x08deflated", "application/gzip"),
        (b"(\xb5/\xfdzstd", "application/zstd"),
        (b"PK\x03\x04zip", "application/zip"),
        (b"RIFF....WAVEfmt ", "audio/wav"),
        (b"RIFF....WEBPVP8 ", "image/webp"),
        (b"RIFF....XXXX", "application/octet-stream"),
        (b"  <html><body>", "text/html"),
        (b"plain words here", "text/plain"),
        (b"", "application/octet-stream"),
        (None, None),
    ]
    df = spark.createDataFrame([(p,) for p, _ in rows], "p binary")
    got = [
        r["mime"] for r in with_mime_detected(df, "p").collect()
    ]
    assert got == [m for _, m in rows]
    # pure map: no exchange in the plan
    plan = (
        with_mime_detected(df, "p")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
