"""Source readers + scalar function surface (ChoETL families, SURVEY §2.1/2.9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from choetl_spark import functions as cf
from choetl_spark import sources as src
from choetl_spark.sources import FixedField


@pytest.fixture(scope="module")
def datadir(tmp_path_factory):
    return tmp_path_factory.mktemp("srcdata")


def test_read_csv_quote_aware(spark, datadir):
    p = str(datadir / "t.csv")
    with open(p, "w") as f:
        f.write('id,name,notes\n1,"Smith, John","said ""hi"""\n2,Jane,plain\n')
    df = src.read_csv(spark, p, escape='"')
    rows = df.orderBy("id").collect()
    assert rows[0]["name"] == "Smith, John"
    assert rows[0]["notes"] == 'said "hi"'
    assert df.schema["id"].dataType.typeName() == "integer"  # inferSchema


def test_read_tsv(spark, datadir):
    p = str(datadir / "t.tsv")
    with open(p, "w") as f:
        f.write("a\tb\n1\tx\n")
    assert src.read_tsv(spark, p).collect()[0]["b"] == "x"


def test_read_json(spark, datadir):
    p = str(datadir / "t.json")
    with open(p, "w") as f:
        f.write('{"a": 1, "nested": {"b": "x"}}\n{"a": 2, "nested": {"b": "y"}}\n')
    df = src.read_json(spark, p)
    assert df.select("nested.b").orderBy("a").collect()[1][0] == "y"


def test_read_fixed_length(spark, datadir):
    p = str(datadir / "f.txt")
    with open(p, "w") as f:
        f.write("001Alice   0042\n002Bob     0017\n")
    df = src.read_fixed_length(
        spark,
        p,
        [
            FixedField("id", 1, 3, "int"),
            FixedField("name", 4, 8),
            FixedField("score", 12, 4, "int"),
        ],
    )
    rows = df.orderBy("id").collect()
    assert rows[0]["id"] == 1 and rows[0]["name"] == "Alice"
    assert rows[1]["score"] == 17


def test_read_manifold(spark, datadir):
    p = str(datadir / "m.txt")
    with open(p, "w") as f:
        f.write("CUS001Alice\nORD77 0042\nCUS002Bob  \n")
    out = src.read_manifold(
        spark,
        p,
        1,
        3,
        {
            "CUS": [FixedField("id", 4, 3, "int"), FixedField("name", 7, 5)],
            "ORD": [FixedField("ref", 4, 3), FixedField("qty", 8, 4, "int")],
        },
    )
    assert out["CUS"].count() == 2
    assert out["ORD"].collect()[0]["qty"] == 42


def test_stage_as_view(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    src.stage_as_view(df, "staged_region")
    n = spark.sql("SELECT count(*) AS n FROM staged_region").collect()[0]["n"]
    assert n == df.count()


# --- scalar functions -------------------------------------------------------


def test_parse_bool(spark):
    df = spark.createDataFrame(
        [("Y",), ("0",), ("true",), ("zzz",)], "v string"
    ).select(cf.parse_bool(F.col("v")).alias("b"))
    assert [r["b"] for r in df.collect()] == [True, False, True, None]


def test_parse_currency(spark):
    df = spark.createDataFrame([("$1,234.50",), ("-€12.00",)], "v string").select(
        cf.parse_currency(F.col("v"), 2).alias("d")
    )
    vals = [float(r["d"]) for r in df.collect()]
    assert vals == [1234.50, -12.00]


def test_parse_datetime(spark):
    df = spark.createDataFrame(
        [("2024-01-02 03:04:05",), ("garbage",)], "v string"
    ).select(cf.parse_datetime(F.col("v"), "yyyy-MM-dd HH:mm:ss").alias("t"))
    rows = df.collect()
    assert rows[0]["t"] is not None and rows[1]["t"] is None


def test_iif_mask_left_right(spark):
    df = spark.createDataFrame([(5, "1234567890")], "n int, s string").select(
        cf.iif(F.col("n") > 3, F.lit("big"), F.lit("small")).alias("sz"),
        cf.mask(F.col("s")).alias("m"),
        cf.left(F.col("s"), 3).alias("l"),
        cf.right(F.col("s"), 2).alias("r"),
    )
    r = df.collect()[0]
    assert r["sz"] == "big" and r["m"] == "******7890"
    assert r["l"] == "123" and r["r"] == "90"


def test_to_camel_case(spark):
    df = spark.createDataFrame([("hello world foo",)], "s string").select(
        cf.to_camel_case(F.col("s")).alias("c")
    )
    assert df.collect()[0]["c"] == "helloWorldFoo"


def test_is_number_json_field(spark):
    df = spark.createDataFrame(
        [("-1.5", '{"a": {"b": 7}}')], "n string, j string"
    ).select(
        cf.is_number(F.col("n")).alias("isn"),
        cf.json_field(F.col("j"), "$.a.b").alias("jb"),
    )
    r = df.collect()[0]
    assert r["isn"] is True and r["jb"] == "7"


def test_read_xml_flat(spark, tmp_path):
    xml = """<catalog>
  <book><id>1</id><title>First</title><price>9.99</price></book>
  <book><id>2</id><title>Second</title><price>19.5</price></book>
  <book><id>3</id><title>Third</title><price>0.5</price></book>
</catalog>"""
    p = tmp_path / "books.xml"
    p.write_text(xml)
    from choetl_spark.sources import read_xml_flat

    df = read_xml_flat(spark, str(p), "book", ["id", "title", "price"])
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert [r["title"] for r in rows] == ["First", "Second", "Third"]
    assert rows[1]["price"] == "19.5"


def test_write_fixed_length_roundtrip(spark, tmp_path):
    from choetl_spark.sources import (
        FixedField,
        read_fixed_length,
        write_fixed_length,
    )

    src = spark.createDataFrame(
        [("alpha", 1), ("beta-long-name", 22), (None, 3)],
        "name string, n int",
    )
    fields = [
        FixedField("name", 1, 10),
        FixedField("n", 11, 4, "int"),
    ]
    out = str(tmp_path / "fixed")
    write_fixed_length(src, out, fields)
    back = read_fixed_length(spark, out, fields)
    got = {(r["name"], r["n"]) for r in back.collect()}
    # name truncated to its 10-char slot; null rendered as empty
    assert got == {("alpha", 1), ("beta-long-", 22), ("", 3)}


def test_write_manifold_roundtrip(spark, tmp_path):
    from choetl_spark.sources import (
        FixedField,
        read_manifold,
        write_manifold,
    )

    orders = spark.createDataFrame([(1, 100), (2, 200)], "k int, v int")
    notes = spark.createDataFrame([("x", 7)], "tag string, m int")
    out = str(tmp_path / "manifold")
    write_manifold(
        {
            "O": (orders, [FixedField("k", 2, 6, "int"), FixedField("v", 8, 6, "int")]),
            "N": (notes, [FixedField("tag", 2, 6), FixedField("m", 8, 6, "int")]),
        },
        out,
    )
    parts = read_manifold(
        spark, out, 1, 1,
        {
            "O": [FixedField("k", 2, 6, "int"), FixedField("v", 8, 6, "int")],
            "N": [FixedField("tag", 2, 6), FixedField("m", 8, 6, "int")],
        },
    )
    assert {(r["k"], r["v"]) for r in parts["O"].collect()} == {(1, 100), (2, 200)}
    assert parts["N"].collect()[0]["tag"] == "x"


def test_read_xml_attributes_cdata_nested(spark, tmp_path):
    """Nested XML (one level), row-element attributes, CDATA, and a
    namespaced/dotted tag — the regex reader's declared scope (spark-xml
    is the cluster path for deeper nesting)."""
    xml = """<catalog>
  <item id="7" lang="en"><name><![CDATA[A & B <raw>]]></name>
    <meta><author>Ada</author><year>1842</year></meta>
    <ns.price>12.5</ns.price></item>
  <item id="8"><name>Plain</name>
    <meta><author>Bob</author><year>1900</year></meta>
    <ns.price>3</ns.price></item>
</catalog>"""
    p = tmp_path / "cat.xml"
    p.write_text(xml)
    from choetl_spark.sources import read_xml

    df = read_xml(
        spark, str(p), "item",
        ["@id", "@lang", "name", "meta/author", "meta/year", "ns.price"],
    )
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == ["7", "8"]
    assert rows[0]["lang"] == "en" and rows[1]["lang"] == ""
    assert rows[0]["name"] == "A & B <raw>"
    assert rows[1]["name"] == "Plain"
    assert [r["meta_author"] for r in rows] == ["Ada", "Bob"]
    assert [r["meta_year"] for r in rows] == ["1842", "1900"]
    assert rows[0]["ns.price"] == "12.5"


def test_read_xml_arbitrary_depth_and_raises_on_unsupported(spark, tmp_path):
    """Depth>=3 element paths and attributes on nested elements resolve
    (round-2 verdict #6: a/b/c used to silently return empty); specs
    outside the supported subset raise instead of matching nothing."""
    import pytest as _pytest

    xml = """<catalog>
  <item id="1"><a><b sku="X9"><c>deep1</c></b></a></item>
  <item id="2"><a><b sku="Y3"><c><![CDATA[deep & raw]]></c></b></a></item>
</catalog>"""
    p = tmp_path / "deep.xml"
    p.write_text(xml)
    from choetl_spark.sources import read_xml

    df = read_xml(spark, str(p), "item", ["@id", "a/b/c", "a/b/@sku"])
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert [r["a_b_c"] for r in rows] == ["deep1", "deep & raw"]
    assert [r["a_b_sku"] for r in rows] == ["X9", "Y3"]
    for bad in ["a/b/", "a[0]/b", "", "//", "a/@b/c", "a[last()]",
                "a[@x>1]/b"]:
        with _pytest.raises(ValueError, match="unsupported XML field"):
            read_xml(spark, str(p), "item", [bad])
    # '//' descendant axes are ACCEPTED as aliases: this subset's
    # element steps are already descendant-matching, so 'a//c' and a
    # leading '//c' resolve like 'a/c' and 'c'
    df2 = read_xml(spark, str(p), "item", ["a//c", "//a/b/c"])
    got = sorted(r[0] for r in df2.collect())
    assert got == sorted(
        r["a_b_c"] for r in df.select("a_b_c").collect()
    )


def test_read_xml_predicates_and_wildcards(spark, tmp_path):
    """The XPath predicate/wildcard subset the reference tests lean on
    (ChoXmlReaderTest Program.cs:4346 `Variable[@name='Email']` and
    :5431-5539 `p[@name="..."]`): attribute-equality predicates on leaf
    and ancestor steps, both quote styles, plus `*` wildcard steps whose
    closing tag matches by backreference."""
    xml = """<doc>
  <rec>
    <VariableData>
      <Variable name="Email">a@example.com</Variable>
      <Variable name="Phone">555-1234</Variable>
    </VariableData>
    <p name="name">alpha</p>
    <p name="cellBarQualify">0</p>
    <wrap><inner attr="z">star1</inner></wrap>
  </rec>
  <rec>
    <VariableData>
      <Variable name="Phone">555-9999</Variable>
      <Variable name="Email">b@example.com</Variable>
    </VariableData>
    <p name="cellBarQualify">1</p>
    <p name="name">beta</p>
    <wrap><other attr="z">star2</other></wrap>
  </rec>
</doc>"""
    p = tmp_path / "pred.xml"
    p.write_text(xml)
    from choetl_spark.sources import read_xml

    df = read_xml(
        spark,
        str(p),
        "rec",
        [
            "VariableData/Variable[@name='Email']",  # ancestor + leaf pred
            'p[@name="name"]',                       # double-quoted pred
            "p[@name='cellBarQualify']",             # single-quoted pred
            "wrap/*",                                # wildcard leaf
            "wrap/*/@attr",                          # wildcard + attr leaf
        ],
    )
    rows = sorted(df.collect(), key=lambda r: r["p"])
    assert [r["VariableData_Variable"] for r in rows] == [
        "a@example.com", "b@example.com",
    ]
    assert [r["p"] for r in rows] == ["alpha", "beta"]
    # second p[...] spec collides on out_name with the first after
    # predicate stripping? no: both are 'p' -> Spark allows duplicate
    # names but our select aliases twice; verify via positional access
    assert [r[2] for r in rows] == ["0", "1"]
    assert [r["wrap_any"] for r in rows] == ["star1", "star2"]
    assert [r["wrap_any_attr"] for r in rows] == ["z", "z"]


def test_read_xml_positional_predicates(spark, tmp_path):
    """XPath positional ``[n]`` predicates (reference WithXPath corpus,
    ChoXmlReader.cs:651-655: repeated-sibling selection like
    ``phone[2]``): 1-based occurrence counting on leaf and ancestor
    steps, tolerant of self-closing earlier siblings, composing with
    attribute leaves; ``[1]`` is the no-predicate default; out-of-range
    yields empty; ``*[n]`` stays unsupported and raises."""
    import pytest as _pytest

    xml = """<doc>
  <member>
    <phone>111</phone>
    <phone>222</phone>
    <addr kind="home"><line>h1</line></addr>
    <addr kind="work"><line>w1</line></addr>
  </member>
  <member>
    <phone/>
    <phone>888</phone>
    <phone>999</phone>
    <addr kind="home"><line>h2</line></addr>
    <addr kind="work"><line>w2</line></addr>
  </member>
</doc>"""
    p = tmp_path / "pos.xml"
    p.write_text(xml)
    from choetl_spark.sources import read_xml

    df = read_xml(
        spark,
        str(p),
        "member",
        [
            "phone[1]",       # == plain 'phone' (first PAIRED element)
            "phone[2]",       # leaf positional; row 2's first is <phone/>
            "phone[3]",       # counts the self-closing sibling too
            "addr[2]/line",   # ancestor positional
            "addr[2]/@kind",  # ancestor positional + attribute leaf
        ],
    )
    rows = sorted(df.collect(), key=lambda r: r["addr_2_line"])
    assert [r["phone_1"] for r in rows] == ["111", "888"]
    assert [r["phone_2"] for r in rows] == ["222", "888"]
    assert [r["phone_3"] for r in rows] == ["", "999"]
    assert [r["addr_2_line"] for r in rows] == ["w1", "w2"]
    assert [r["addr_2_kind"] for r in rows] == ["work", "work"]

    with _pytest.raises(ValueError, match="unsupported"):
        read_xml(spark, str(p), "member", ["*[2]"]).collect()


def test_read_xml_text_equality_predicates(spark, tmp_path):
    """XPath ``tag[text()='v']`` body-equality predicates — the
    sibling-selection-by-value shape (reference WithXPath corpus):
    select a sibling by its text and read its attribute, CDATA bodies
    match their literal text, non-matching rows yield empty, and the
    predicate composes with ancestor steps; ``*[text()='v']`` stays
    unsupported and raises."""
    import pytest as _pytest

    xml = """<doc>
  <rec>
    <p name="name">alpha</p>
    <p name="kind"><![CDATA[cd-val]]></p>
    <wrap><tag>inner</tag><tag>other</tag></wrap>
  </rec>
  <rec>
    <p name="kind">cd-val</p>
    <p name="name">beta</p>
    <wrap><tag>other</tag><tag>inner</tag></wrap>
  </rec>
</doc>"""
    p = tmp_path / "textpred.xml"
    p.write_text(xml)
    from choetl_spark.sources import read_xml

    df = read_xml(
        spark,
        str(p),
        "rec",
        [
            "p[text()='alpha']/@name",   # attr of the matching sibling
            "p[text()='cd-val']/@name",  # CDATA body matches literally
            "wrap/tag[text()='inner']",  # ancestor step + leaf pred
            "p[text()='absent']/@name",  # no match -> empty
        ],
    )
    rows = sorted(df.collect(), key=lambda r: r[0] or "~")
    assert [r[0] for r in rows] == ["name", ""]  # alpha only in rec 1
    assert [r[1] for r in rows] == ["kind", "kind"]
    assert [r[2] for r in rows] == ["inner", "inner"]
    assert [r[3] for r in rows] == ["", ""]

    with _pytest.raises(ValueError, match="unsupported"):
        read_xml(spark, str(p), "rec", ["*[text()='x']"]).collect()


def test_read_xml_namespace_manager(spark, tmp_path):
    """URI-bound namespace resolution (ChoXmlReader WithXmlNamespaceManager,
    reference ChoXmlReader.cs:480-520): the QUERY's prefixes bind to URIs
    and match whatever prefixes the DOCUMENT's root declares for those
    URIs — a different prefix ('po' vs query 'q') and the default
    namespace both resolve. An undeclared URI raises instead of matching
    nothing."""
    import pytest as _pytest

    xml = """<root xmlns="http://example.com/base"
      xmlns:po="http://example.com/purchase">
  <po:order po:ref="A1"><po:total>10</po:total><qty>2</qty></po:order>
  <po:order po:ref="B2"><po:total>30</po:total><qty>5</qty></po:order>
</root>"""
    p = tmp_path / "ns.xml"
    p.write_text(xml)
    from choetl_spark.sources import read_xml

    ns = {
        "q": "http://example.com/purchase",
        "d": "http://example.com/base",
    }
    df = read_xml(
        spark, str(p), "q:order", ["@q:ref", "q:total", "d:qty"],
        namespaces=ns,
    )
    rows = sorted(df.collect(), key=lambda r: r["q_ref"])
    assert [r["q_ref"] for r in rows] == ["A1", "B2"]
    assert [r["q_total"] for r in rows] == ["10", "30"]
    # default-namespace elements are unprefixed in the document
    assert [r["d_qty"] for r in rows] == ["2", "5"]
    # prefixes NOT in the manager stay literal matches
    lit = read_xml(spark, str(p), "po:order", ["@po:ref"], namespaces=ns)
    assert sorted(r["po_ref"] for r in lit.collect()) == ["A1", "B2"]
    with _pytest.raises(ValueError, match="not declared"):
        read_xml(
            spark, str(p), "x:order", ["x:total"],
            namespaces={"x": "http://example.com/other"},
        ).collect()
    # single-quoted xmlns declarations are equally valid XML
    p2 = tmp_path / "ns_sq.xml"
    p2.write_text(xml.replace('"', "'"))
    df2 = read_xml(spark, str(p2), "q:order", ["@q:ref"], namespaces=ns)
    assert sorted(r["q_ref"] for r in df2.collect()) == ["A1", "B2"]


def test_wholetext_guard_rejects_oversized_file(spark, tmp_path):
    """The wholetext formats materialize one string per FILE per task;
    a file above max_file_bytes raises with the path named instead of
    OOMing a task (round-2 verdict #7)."""
    import pytest as _pytest

    p = tmp_path / "big.kvp"
    p.write_text("k: v\n" * 4000)  # 20 kB
    from choetl_spark.sources import read_kvp, read_text_gated

    with _pytest.raises(ValueError, match="max_file_bytes"):
        read_kvp(spark, str(p), max_file_bytes=1024)
    with _pytest.raises(ValueError, match="max_file_bytes"):
        read_text_gated(
            spark, str(p), skip_until="line like '%'", max_file_bytes=1024
        )
    # under the cap (and with the default) it reads fine
    assert read_kvp(spark, str(p), max_file_bytes=1 << 20).count() == 1


def test_read_manifold_custom_selector(spark, tmp_path):
    """Non-positional dispatch: a Column-expression selector (the
    reference's arbitrary recordSelector Func,
    ChoManifoldReader.cs:273-290) — here the record type is the text
    AFTER a variable-width numeric prefix, which no fixed substring
    can express."""
    from choetl_spark.sources import FixedField, read_manifold

    p = tmp_path / "mixed.txt"
    p.write_text(
        "7ORD000123    \n42LIN000456   \n8ORD000789    \n"
    )
    sel = lambda c: F.regexp_extract(c, r"^\d+([A-Z]+)", 1)  # noqa: E731
    out = read_manifold(
        spark, str(p),
        layouts={
            "ORD": [FixedField("line", 1, 14, "string")],
            "LIN": [FixedField("line", 1, 14, "string")],
        },
        selector=sel,
    )
    assert out["ORD"].count() == 2 and out["LIN"].count() == 1


def test_read_jdbc_embedded_derby_roundtrip(spark, tmp_path):
    """End-to-end JDBC against a REAL database: Spark bundles Apache
    Derby (embedded JDBC) for its Hive metastore, so the partitioned
    read path runs un-gated here — the executable analog of the
    reference's SQLite staging (ChoETL.Sqlite/ChoETLSqlite.cs:24-59)."""
    from choetl_spark.sources import read_jdbc

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    src_df = spark.range(0, 100).selectExpr(
        "id", "CAST(id * 2 AS DOUBLE) AS dbl"
    )
    (
        src_df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "t1")
        .option("driver", driver)
        .save()
    )
    back = read_jdbc(
        spark, url, "t1",
        partition_column="id", num_partitions=4,
        lower_bound=0, upper_bound=100, driver=driver,
    )
    assert back.rdd.getNumPartitions() == 4  # genuinely partitioned read
    rows = {r["id"]: r["dbl"] for r in back.collect()}
    assert len(rows) == 100 and rows[7] == 14.0


def test_csv_delimiter_sniffing(spark, tmp_path):
    """delimiter='auto' detects ; \\t | from a buffered prefix, ignoring
    candidates inside quoted spans (ChoCSVRecordReader.cs:1821-1860
    semantics)."""
    from choetl_spark.sources import sniff_delimiter

    cases = {
        "semi.csv": ('id;name;x\n1;"a;b";2\n2;c;3\n', ";"),
        "tab.csv": ("id\tname\n1\tx\n2\ty\n", "\t"),
        "pipe.csv": ("id|name|z\n1|x|9\n", "|"),
        "comma.csv": ('id,name\n1,"x,y"\n2,z\n', ","),
    }
    for fname, (content, want) in cases.items():
        p = tmp_path / fname
        p.write_text(content)
        assert sniff_delimiter(str(p)) == want, fname
    # end-to-end: auto-sniffed read parses the right columns
    df = src.read_csv(spark, str(tmp_path / "semi.csv"))
    r = df.orderBy("id").collect()[0]
    assert r["name"] == "a;b" and r["x"] == 2


def test_csv_sniffer_prefers_comma(tmp_path):
    """A valid comma CSV whose text column consistently contains MORE of
    another candidate (pipes in a templated column) must still sniff as
    comma — the comma wins whenever it is itself consistent-nonzero
    (ADVICE r2: auto-detect must not silently re-delimit a comma CSV)."""
    from choetl_spark.sources import sniff_delimiter

    p = tmp_path / "tricky.csv"
    p.write_text(
        "id,path\n1,a|b|c|d\n2,e|f|g|h\n3,i|j|k|l\n"
    )
    assert sniff_delimiter(str(p)) == ","


def test_read_kvp_preamble_before_first_marker_dropped(spark, tmp_path):
    """key:value lines before the first record_start marker are preamble,
    not a record — the reference's state machine only opens a record at
    the marker (ChoKVPRecordReader.cs:82-219; ADVICE r2)."""
    from choetl_spark.sources import read_kvp

    (tmp_path / "pre.kvp").write_text(
        "generator: testsuite\nversion: 9\n"
        "##RECORD##\nid: 1\nname: Mark\n"
        "##RECORD##\nid: 2\nname: Jane\n"
    )
    df = read_kvp(spark, str(tmp_path / "pre.kvp"), record_start="##RECORD##")
    rows = sorted(df.collect(), key=lambda r: r["record_id"])
    assert len(rows) == 2
    assert [r["kv"]["id"] for r in rows] == ["1", "2"]
    assert all("generator" not in r["kv"] for r in rows)


def test_read_text_lines_ordered_across_many_splits(spark, tmp_path):
    """Line-framed reader (no wholetext): force ONE file into many input
    splits (tiny maxPartitionBytes) and check the partition-offset
    line-number reconstruction is exact — this is the assumption the
    streaming framing rests on."""
    from choetl_spark.sources import read_text_lines

    n = 5000
    p = tmp_path / "big.txt"
    p.write_text("".join(f"line-{i:06d}\n" for i in range(n)))
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    try:
        df = read_text_lines(spark, str(p))
        assert df.rdd.getNumPartitions() > 4  # really split
        rows = df.collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert len(rows) == n
    by_pos = sorted(rows, key=lambda r: r["pos"])
    assert [r["pos"] for r in by_pos] == list(range(n))
    assert [r["line"] for r in by_pos] == [f"line-{i:06d}" for i in range(n)]


def test_read_kvp_lines_framing_matches_wholetext(spark, tmp_path):
    """framing="lines" (streaming, unbounded file size) produces the
    same records as the wholetext path."""
    from choetl_spark.sources import read_kvp

    (tmp_path / "a.kvp").write_text(
        "##R##\nid: 1\nname: Ann\n##R##\nid: 2\nname: Bo\n"
    )
    (tmp_path / "b.kvp").write_text("id: 10\nnote: x\n\nid: 20\nnote: y\n")

    def canon(df):
        return sorted(
            (r["file"].rsplit("/", 1)[-1], r["record_id"], dict(r["kv"]))
            for r in df.collect()
        )

    whole_m = read_kvp(spark, str(tmp_path / "a.kvp"), record_start="##R##")
    lines_m = read_kvp(
        spark, str(tmp_path / "a.kvp"), record_start="##R##", framing="lines"
    )
    assert canon(whole_m) == canon(lines_m)
    whole_b = read_kvp(spark, str(tmp_path / "b.kvp"))
    lines_b = read_kvp(spark, str(tmp_path / "b.kvp"), framing="lines")
    assert canon(whole_b) == canon(lines_b)


def test_read_kvp_marker_and_blankline(spark, tmp_path):
    """ChoKVPReader analog: key:value lines grouped into records by a
    start marker or blank lines (ChoKVPRecordReader.cs:82-219)."""
    from choetl_spark.sources import read_kvp

    (tmp_path / "m.kvp").write_text(
        "##RECORD##\nid: 1\nname: Mark\ncity: NY\n"
        "##RECORD##\nid: 2\nname: Jane\n"
    )
    df = read_kvp(spark, str(tmp_path / "m.kvp"), record_start="##RECORD##")
    rows = sorted(df.collect(), key=lambda r: r["record_id"])
    assert len(rows) == 2
    assert rows[0]["kv"]["name"] == "Mark" and rows[0]["kv"]["city"] == "NY"
    assert rows[1]["kv"]["id"] == "2" and "city" not in rows[1]["kv"]

    (tmp_path / "b.kvp").write_text(
        "id: 10\nnote: a:b:c\n\nid: 20\nnote: plain\n"
    )
    df2 = read_kvp(spark, str(tmp_path / "b.kvp"))
    rows2 = sorted(df2.collect(), key=lambda r: r["record_id"])
    assert [r["kv"]["id"] for r in rows2] == ["10", "20"]
    assert rows2[0]["kv"]["note"] == "a:b:c"  # only first sep splits


def test_write_kvp_roundtrip(spark, tmp_path):
    """ChoKVPWriter analog (ChoKVPWriter.cs:16): blank-line separated
    key:value records that read_kvp re-groups exactly; null fields omit
    their line; values may contain the separator."""
    from pyspark.sql import functions as F

    from choetl_spark.sources import read_kvp, write_kvp

    df = spark.createDataFrame(
        [(1, "Mark", "a:b:c"), (2, "Jane", None)],
        "id long, name string, note string",
    )
    out = str(tmp_path / "kvp")
    write_kvp(df, out)
    back = read_kvp(spark, out)
    rows = sorted(
        back.select(
            F.col("kv")["id"].alias("id"),
            F.col("kv")["name"].alias("name"),
            F.col("kv")["note"].alias("note"),
        ).collect(),
        key=lambda r: r["id"],
    )
    assert [(r["id"], r["name"], r["note"]) for r in rows] == [
        ("1", "Mark", "a:b:c"),
        ("2", "Jane", None),
    ]


def test_json_path_extract_recursive(spark):
    """$..x recursive descent + [*] wildcard — beyond get_json_object
    (ChoJSONReader.cs:827-834 JSONPath parity)."""
    from choetl_spark.functions import json_path_extract

    doc = (
        '{"store": {"books": [{"title": "A", "price": 5},'
        ' {"title": "B"}], "shelf": {"books": [{"title": "C"}]}}}'
    )
    df = spark.createDataFrame([(1, doc), (2, "{}"), (3, None)],
                               "id int, js string")
    out = {
        r["id"]: r["m"]
        for r in json_path_extract(df, "js", "$..books[*].title", "m").collect()
    }
    assert sorted(out[1]) == ["A", "B", "C"]
    assert out[2] == []
    assert out[3] is None
    out2 = {
        r["id"]: r["m"]
        for r in json_path_extract(
            df, "js", "$.store.books[0].price", "m"
        ).collect()
    }
    assert out2[1] == ["5"]


def test_stage_durable_roundtrip(spark, tmp_path):
    from choetl_spark.sources import stage_durable

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "k long, v string"
    )
    out = stage_durable(df, str(tmp_path / "stage_pq"), name="stg")
    assert spark.sql("SELECT count(*) c FROM stg").collect()[0]["c"] == 3
    eng = stage_durable(
        df, str(tmp_path / "stage_eng"), name="stg2", use_engine=True
    )
    a = df.select("k", "v")
    b = eng.select("k", "v")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_read_jdbc_option_wiring():
    """No JDBC driver jars ship here; exercise the option-building logic
    (what this layer owns) against a reader double."""
    from choetl_spark.sources import read_jdbc

    class FakeReader:
        def __init__(self):
            self.fmt = None
            self.opts = {}

        def format(self, f):
            self.fmt = f
            return self

        def option(self, k, v):
            self.opts[k] = v
            return self

        def load(self):
            return self

    class FakeSpark:
        def __init__(self):
            self.read = FakeReader()

    fs = FakeSpark()
    out = read_jdbc(
        fs, "jdbc:postgresql://db/x", "events",
        partition_column="id", num_partitions=16,
        lower_bound=0, upper_bound=100000, fetchsize=10000,
    )
    assert out.fmt == "jdbc"
    assert out.opts["dbtable"] == "events"
    assert out.opts["partitionColumn"] == "id"
    assert out.opts["numPartitions"] == 16
    assert out.opts["lowerBound"] == 0 and out.opts["upperBound"] == 100000
    assert out.opts["fetchsize"] == 10000


def test_read_yaml_multidoc_and_path(spark, tmp_path):
    """ChoYamlReader analog: multi-doc streams, YamlPath-lite subtree
    selection with list fan-out, explicit-schema and inferred reads."""
    from choetl_spark.sources import read_yaml

    (tmp_path / "a.yaml").write_text(
        "---\nid: 1\nname: Ada\ntags: [x, y]\n---\nid: 2\nname: Bob\n"
    )
    df = read_yaml(spark, str(tmp_path / "a.yaml"),
                   schema="id long, name string, tags array<string>")
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert [r["name"] for r in rows] == ["Ada", "Bob"]
    assert rows[0]["tags"] == ["x", "y"] and rows[1]["tags"] is None

    (tmp_path / "b.yaml").write_text(
        "store:\n  books:\n    - {title: A, price: 5}\n"
        "    - {title: B, price: 7}\n"
    )
    books = read_yaml(spark, str(tmp_path / "b.yaml"),
                      yaml_path="store.books")  # inferred schema
    got = sorted(books.collect(), key=lambda r: r["title"])
    assert [r["title"] for r in got] == ["A", "B"]
    assert got[1]["price"] == 7


def test_write_yaml_roundtrip(spark, tmp_path):
    from choetl_spark.sources import read_yaml, write_yaml

    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", None)], "id long, s string, x double"
    )
    p = str(tmp_path / "out_yaml")
    write_yaml(df, p)
    back = read_yaml(spark, p, schema="id long, s string, x double")
    a = df.select("id", "s", "x")
    b = back.select("id", "s", "x")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_bson_spec_golden():
    """Spec conformance: the canonical bsonspec.org example document
    {"hello": "world"} must encode byte-identically."""
    from choetl_spark.sources.bson_py import decode_document, encode_document

    golden = (
        b"\x16\x00\x00\x00\x02hello\x00\x06\x00\x00\x00world\x00\x00"
    )
    assert encode_document({"hello": "world"}) == golden
    doc, pos = decode_document(memoryview(golden))
    assert doc == {"hello": "world"} and pos == len(golden)


def test_bson_roundtrip(spark, tmp_path):
    """ChoBSONReader analog via the pure-Python dump bridge: nullable
    longs/ints/strings/doubles/bools/bytes/timestamps round-trip."""
    import datetime as dt

    from choetl_spark.sources.bson_py import read_bson_py, write_bson_py

    ddl = ("id bigint, small int, name string, score double, ok boolean, "
           "blob binary, ts timestamp")
    rows = [
        (1, 7, "alpha", 1.5, True, b"\x00\x01",
         dt.datetime(2023, 7, 22, 1, 2, 3, 456000)),
        (2, None, None, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, ddl)
    p = str(tmp_path / "out_bson")
    write_bson_py(df, p)
    back = read_bson_py(spark, p, ddl)
    a = df.select(*sorted(df.columns))
    b = back.select(*sorted(df.columns))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_write_xml_roundtrip(spark, tmp_path):
    """write_xml -> read_xml closes the XML loop with TRUE value identity:
    the reader decodes the five predefined entities the writer emits,
    matching the reference reader's behavior (ChoXmlReader materializes
    decoded text via XElement.Value, never raw markup)."""
    from choetl_spark.sources import read_xml, write_xml

    df = spark.createDataFrame(
        [(1, "a<b&c", "x"), (2, None, 'q"z&amp;w')],
        "id long, note string, v string",
    )
    p = str(tmp_path / "out_xml")
    write_xml(df, p, row_tag="item", root_tag="cat", attributes=["id"])
    back = read_xml(spark, p, "item", ["@id", "note", "v"])
    rows = sorted(back.collect(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == ["1", "2"]
    assert rows[0]["note"] == "a<b&c"
    # double-escaping round-trips: source text "&amp;" survives literally
    assert rows[1]["v"] == 'q"z&amp;w'
    assert rows[1]["note"] == ""  # null -> element omitted


def test_crypto_converter_roundtrip(spark):
    """ChoDESCryptoConverter analog on Spark-native AES (JVM-side)."""
    from choetl_spark.functions import decrypt_col, encrypt_col

    key = "0123456789abcdef"
    df = spark.createDataFrame([(1, "secret"), (2, None)], "id int, s string")
    enc = df.select("id", encrypt_col(F.col("s"), key).alias("c"))
    assert enc.filter("id = 1").collect()[0]["c"] != "secret"
    back = enc.select("id", decrypt_col(F.col("c"), key).alias("s"))
    rows = {r["id"]: r["s"] for r in back.collect()}
    assert rows[1] == "secret" and rows[2] is None


def test_read_text_gated_skipuntil_dowhile(spark, tmp_path):
    """Stateful SkipUntil/DoWhile gating (IChoReader.cs:22-23): emit
    from the first match through the last line satisfying do_while."""
    from choetl_spark.sources import read_text_gated

    (tmp_path / "a.log").write_text(
        "garbage\nmore garbage\nBEGIN\ndata 1\ndata 2\nEND\ntrailing\n"
    )
    (tmp_path / "b.log").write_text("no markers here\nat all\n")
    out = read_text_gated(
        spark,
        str(tmp_path / "*.log"),
        skip_until="line = 'BEGIN'",
        do_while="line != 'END'",
    )
    rows = sorted(out.collect(), key=lambda r: r["pos"])
    assert [r["line"] for r in rows] == ["BEGIN", "data 1", "data 2"]
    # skip_until alone: from marker to EOF
    tail = read_text_gated(
        spark, str(tmp_path / "a.log"), skip_until="line = 'END'"
    )
    assert [r["line"] for r in sorted(tail.collect(), key=lambda r: r["pos"])][:2] == ["END", "trailing"]


def test_stage_sqlite_roundtrip_all_types(spark, tmp_path):
    """Real SQLite staging (reference StageOnSQLite,
    ChoETL.Sqlite/ChoETLSqlite.cs:24-59): every Spark primitive plus
    array/decimal round-trips through the database file, including
    int64 beyond 2**53 (TEXT/REAL coercion would corrupt it), NaN->NULL,
    and microsecond timestamps."""
    import datetime
    import decimal

    from choetl_spark.sources import read_sqlite, stage_sqlite

    ddl = (
        "id bigint, s string, f double, b boolean, ts timestamp, "
        "bin binary, tags array<string>, d decimal(10,2), big bigint"
    )
    df = spark.createDataFrame(
        [
            (
                1, "a", 3.5, True,
                datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
                b"\x00\xff", ["x", "y"],
                decimal.Decimal("12.34"), -(2**62) - 7,
            ),
            (2, None, float("nan"), None, None, None, None, None, 2**62 + 7),
        ],
        ddl,
    )
    db = str(tmp_path / "stage.db")
    stage_sqlite(df, db, "docs")
    back = read_sqlite(spark, db, table="docs", num_partitions=3, schema=ddl)
    assert back.schema == df.schema
    rows = {r["id"]: r for r in back.collect()}
    assert rows[1]["big"] == -(2**62) - 7 and rows[2]["big"] == 2**62 + 7
    assert rows[1]["ts"] == datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)
    assert rows[1]["bin"] == b"\x00\xff" and rows[1]["tags"] == ["x", "y"]
    assert rows[1]["d"] == decimal.Decimal("12.34")
    assert rows[2]["f"] is None  # NaN stored as NULL
    # append mode stacks; overwrite replaces
    stage_sqlite(df, db, "docs", mode="append")
    assert read_sqlite(spark, db, table="docs").count() == 4
    stage_sqlite(df, db, "docs", mode="overwrite")
    assert read_sqlite(spark, db, table="docs").count() == 2


def test_read_sqlite_partitioned_scan_and_query(spark, tmp_path):
    """The distributed read really splits the table into rowid ranges
    (one task per range, no overlap/loss), and query= runs arbitrary
    SQL like the reference's StageOnSQLite(conditions) overload
    (ChoETL.Sqlite/ChoETLSqlite.cs:46-60)."""
    from choetl_spark.sources import read_sqlite, stage_sqlite

    df = spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
    db = str(tmp_path / "part.db")
    stage_sqlite(df, db, "t")
    back = read_sqlite(spark, db, table="t", num_partitions=4)
    assert back.rdd.getNumPartitions() == 4
    got = {r["id"] for r in back.collect()}
    assert got == set(range(1000))  # no range overlap, no loss
    agg = read_sqlite(
        spark, db,
        query="SELECT count(*) AS n, sum(v) AS s FROM t WHERE id < 10",
    ).collect()[0]
    assert agg["n"] == 10 and agg["s"] == 90


def test_read_xml_lines_framing_streams_and_matches_wholetext(spark, tmp_path):
    """framing='lines' (streaming text source, no wholetext string):
    same records as the wholetext path on multi-file input, and the
    rec_id reconstruction survives one file being forced across MANY
    splits (the arbitrarily-large-single-file scale path the reference
    streams via its pull-based line reader, ChoExtensions.cs:808)."""
    from choetl_spark.sources import read_xml

    def rec(i):
        return (
            f'  <row id="{i}">\n    <name>user {i}</name>\n'
            f"    <addr><city>c{i % 7}</city></addr>\n"
            f"    <note><![CDATA[n<{i}>]]></note>\n  </row>\n"
        )

    big = '<?xml version="1.0"?>\n<root>\n' + "".join(
        rec(i) for i in range(300)
    ) + "</root>\n"
    (tmp_path / "big.xml").write_text(big)
    (tmp_path / "small.xml").write_text(
        '<root>\n<row id="900">\n<name>tail</name>\n'
        "<addr><city>z</city></addr>\n<note>t</note>\n</row>\n</root>\n"
    )
    fields = ["@id", "name", "addr/city", "note"]
    expected = sorted(
        tuple(r)
        for r in read_xml(
            spark, str(tmp_path / "*.xml"), "row", fields
        ).collect()
    )
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    try:
        out = read_xml(
            spark, str(tmp_path / "*.xml"), "row", fields, framing="lines"
        )
        got = sorted(tuple(r) for r in out.collect())
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert len(got) == 301
    assert got == expected
    assert ("17", "user 17", "c3", "n<17>") in got


def test_read_yaml_lines_framing_matches_wholetext(spark, tmp_path):
    """framing='lines' parses per DOCUMENT over the streaming text
    source (YAML pins '---' to column 0) and agrees with the wholetext
    path even when one file is forced across many splits."""
    from choetl_spark.sources import read_yaml

    big = "first: doc0\nn: -1\n" + "".join(
        f"---\nfirst: u{i}\nn: {i}\n" for i in range(200)
    )
    (tmp_path / "big.yaml").write_text(big)
    (tmp_path / "b.yaml").write_text("---\nfirst: tail\nn: 999\n")
    ddl = "first string, n long"
    expected = sorted(
        tuple(r)
        for r in read_yaml(
            spark, str(tmp_path / "*.yaml"), schema=ddl
        ).collect()
    )
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    try:
        got = sorted(
            tuple(r)
            for r in read_yaml(
                spark, str(tmp_path / "*.yaml"), schema=ddl,
                framing="lines",
            ).collect()
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert len(got) == 202 and got == expected
    assert ("doc0", -1) in got and ("tail", 999) in got


def test_read_sqlite_query_leading_null_and_schema_probe_skip(spark, tmp_path):
    """Query-mode typing survives a NULL in the first rows (type comes
    from the first NON-null value), and schema= skips the probe while
    restoring declared types."""
    import sqlite3

    from choetl_spark.sources import read_sqlite

    db = str(tmp_path / "q.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (k INTEGER, v INTEGER)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(0, None), (1, None), (2, 42), (3, 7)],
    )
    con.commit()
    con.close()
    out = read_sqlite(spark, db, query="SELECT v FROM t ORDER BY k")
    assert [r["v"] for r in out.collect()] == [None, None, 42, 7]
    out2 = read_sqlite(
        spark, db, query="SELECT k, v FROM t ORDER BY k",
        schema="k bigint, v bigint",
    )
    assert out2.schema.simpleString() == "struct<k:bigint,v:bigint>"
    assert [r["v"] for r in out2.collect()] == [None, None, 42, 7]


def test_read_sqlite_foreign_affinity_coercion(spark, tmp_path):
    """SQLite type affinity lets a TEXT column hold ints and an INTEGER
    column hold integral floats; reads coerce losslessly instead of
    crashing with an Arrow type error."""
    import sqlite3

    from choetl_spark.sources import read_sqlite

    db = str(tmp_path / "f.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (s TEXT, n INTEGER)")
    con.execute("INSERT INTO t VALUES (123, 4.0)")  # affinity abuse
    con.execute("INSERT INTO t VALUES ('abc', 5)")
    con.commit()
    con.close()
    rows = sorted(
        tuple(r) for r in read_sqlite(spark, db, table="t").collect()
    )
    assert rows == [("123", 4), ("abc", 5)]


def test_read_yaml_lines_rejects_single_doc_mode(spark, tmp_path):
    import pytest as _pytest

    from choetl_spark.sources import read_yaml

    (tmp_path / "x.yaml").write_text("a: 1\n")
    with _pytest.raises(ValueError, match="multi_doc"):
        read_yaml(
            spark, str(tmp_path / "x.yaml"), multi_doc=False,
            framing="lines",
        )


def test_lines_census_cap_guard(monkeypatch):
    """The lines-framing census guard: metadata-scale censuses pass,
    a census above CHOETL_LINES_CENSUS_CAP refuses with guidance
    instead of silently growing the driver and every task closure."""
    import pytest as _pytest

    from choetl_spark.sources import _guard_lines_census

    _guard_lines_census(100)
    monkeypatch.setenv("CHOETL_LINES_CENSUS_CAP", "50")
    with _pytest.raises(ValueError, match="CHOETL_LINES_CENSUS_CAP"):
        _guard_lines_census(51)
