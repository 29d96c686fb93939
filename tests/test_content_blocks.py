"""Block-level main-content extraction (with_content_blocks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from choetl_spark.operators.textstats import with_content_blocks

PAGE = (
    "<html><head><script>var x=1;</script></head><body>"
    '<div class="nav"><a href="/">Home</a> <a href="/de">Sprache</a>'
    ' <a href="/about">About</a></div>'
    "<p>This is the real article body with enough words to pass the"
    " minimum and no links at all.</p>"
    "<p>A second content paragraph mentions <a href=\"/ref\">one"
    " reference</a> but is otherwise long prose text again.</p>"
    '<div class="links">Read more: <a href="/a">alpha beta gamma delta'
    ' epsilon zeta</a> <a href="/b">eta theta iota kappa lambda'
    " mu</a></div>"
    "<div>short footer</div>"
    "</body></html>"
)


def test_content_blocks_classification(spark):
    df = spark.createDataFrame([(PAGE,)], "html string")
    out = with_content_blocks(df).collect()[0]
    got = out["content_text"].split("\n")
    assert got == [
        "This is the real article body with enough words to pass the"
        " minimum and no links at all.",
        "A second content paragraph mentions one reference but is"
        " otherwise long prose text again.",
    ]
    # nav (3 links, short), the link-farm div (long but ~all link
    # chars), and the short footer are all chrome
    assert out["n_content_blocks"] == 2
    assert out["n_blocks"] >= 4


def test_content_blocks_entities_binary_and_empty(spark):
    df = spark.createDataFrame(
        [
            (b"<p>fish &amp; chips &lt;tag&gt; plus six more words"
             b" here to qualify</p>",),
            (b"<p>too short</p>",),
            (None,),
        ],
        "html binary",
    )
    rows = with_content_blocks(df).collect()
    assert rows[0]["content_text"] == (
        "fish & chips <tag> plus six more words here to qualify"
    )
    assert rows[1]["content_text"] == ""
    assert rows[1]["n_content_blocks"] == 0
    assert rows[2]["content_text"] == ""


def test_content_blocks_is_pure_map(spark):
    df = spark.createDataFrame([(PAGE,)], "html string")
    plan = (
        with_content_blocks(df)
        .select("content_text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
