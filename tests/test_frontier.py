"""Sitemap parsing + crawl-frontier scheduling (operators/frontier.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from choetl_spark.operators.frontier import crawl_frontier, sitemap_entries

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.example.com/1</loc>
       <lastmod>2024-01-01</lastmod><priority>0.8</priority></url>
  <url><loc> https://a.example.com/2 </loc><changefreq>daily</changefreq></url>
  <url><lastmod>2024-01-02</lastmod></url>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.example.com/sitemap-1.xml</loc></sitemap>
  <sitemap><loc>https://a.example.com/sitemap-2.xml</loc>
           <lastmod>2024-02-02</lastmod></sitemap>
</sitemapindex>"""


def test_sitemap_entries(spark):
    df = spark.createDataFrame(
        [("s1", URLSET), ("s2", INDEX)], "sid string, body string"
    )
    got = sorted(
        (r["sid"], r["loc"], r["lastmod"], r["changefreq"],
         r["priority"], r["is_index"])
        for r in sitemap_entries(df).collect()
    )
    # the loc-less <url> entry is dropped; whitespace-trimmed locs
    assert got == [
        ("s1", "https://a.example.com/1", "2024-01-01", "", "0.8", False),
        ("s1", "https://a.example.com/2", "", "daily", "", False),
        ("s2", "https://a.example.com/sitemap-1.xml", "", "", "", True),
        ("s2", "https://a.example.com/sitemap-2.xml", "2024-02-02", "",
         "", True),
    ]


def test_crawl_frontier_ranking_spacing_and_gate(spark):
    rows = [
        ("https://h1.example.com/a", 5.0, True),
        ("https://h1.example.com/b", 9.0, True),
        ("https://h1.example.com/c", 7.0, True),
        ("https://h1.example.com/d", 8.0, False),  # robots-disallowed
        ("https://h2.example.com/x", 1.0, True),
    ]
    df = spark.createDataFrame(
        rows, "url string, score double, crawlable boolean"
    )
    got = {
        r["url"]: (r["host"], r["fetch_rank"], r["fetch_offset_sec"])
        for r in crawl_frontier(
            df, k_per_host=2, score_col="score", interval_sec=2.0,
            crawlable_col="crawlable",
        ).collect()
    }
    # h1: b (9) then c (7); d is disallowed so it must NOT occupy a
    # slot; a (5) falls off at k=2. h2 keeps its single url.
    assert got == {
        "https://h1.example.com/b": ("h1.example.com", 1, 0.0),
        "https://h1.example.com/c": ("h1.example.com", 2, 2.0),
        "https://h2.example.com/x": ("h2.example.com", 1, 0.0),
    }


def test_crawl_frontier_plan_has_partial_topk(spark):
    df = spark.createDataFrame(
        [("https://h.example.com/%d" % i, float(i)) for i in range(50)],
        "url string, score double",
    )
    plan = (
        crawl_frontier(df, 3, score_col="score")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan  # map-side partial top-k
    assert plan.count("Exchange") <= 2  # the one hash exchange (+AQE)


def test_robots_directives_feed_frontier_intervals(spark):
    from choetl_spark.operators.robots import parse_robots_directives

    robots = spark.createDataFrame(
        [
            (
                "h1.example.com",
                "User-agent: *\nCrawl-delay: 10\nDisallow: /x\n"
                "Sitemap: https://h1.example.com/sm1.xml\n"
                "User-agent: bot\nCrawl-delay: 2.5\n"
                "Sitemap: https://h1.example.com/sm2.xml\n",
            ),
            ("h2.example.com", "User-agent: *\nDisallow:\n"),
            ("h3.example.com", "Crawl-delay: oops\n"),
        ],
        "host string, body string",
    )
    d = {
        r["host"]: (r["crawl_delay"], r["sitemaps"])
        for r in parse_robots_directives(robots).collect()
    }
    # smallest delay wins; sitemaps keep file order; junk values null
    assert d["h1.example.com"] == (
        2.5,
        ["https://h1.example.com/sm1.xml", "https://h1.example.com/sm2.xml"],
    )
    assert d["h2.example.com"] == (None, [])
    assert d["h3.example.com"] == (None, [])

    urls = spark.createDataFrame(
        [
            ("https://h1.example.com/a", 2.0),
            ("https://h1.example.com/b", 1.0),
            ("https://h2.example.com/c", 9.0),
        ],
        "url string, score double",
    )
    from choetl_spark.operators.weburl import _parts
    from pyspark.sql import functions as F

    joined = urls.withColumn("h", _parts(F.col("url"))["host"]).join(
        parse_robots_directives(robots).withColumnRenamed("host", "h"),
        "h",
        "left",
    )
    out = {
        r["url"]: r["fetch_offset_sec"]
        for r in crawl_frontier(
            joined, 5, score_col="score", interval_sec=1.0,
            interval_col="crawl_delay",
        ).collect()
    }
    # h1 spaces by its crawl-delay (2.5s); h2 falls back to 1.0s
    assert out["https://h1.example.com/a"] == 0.0
    assert out["https://h1.example.com/b"] == 2.5
    assert out["https://h2.example.com/c"] == 0.0
