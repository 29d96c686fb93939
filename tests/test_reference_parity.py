"""Named ports of the reference's ChoParquetWriterTest round-trips
(reference src/Test/ChoParquetWriterTest/Program.cs) — the golden-output
discipline of SURVEY.md §5 applied to our encode→decode path. Each test
mirrors a specific reference test; the contract is identical (write →
read back → structural equality), the machinery is ours.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from choetl_spark.engine import (
    EncodeConfig,
    decode_dataframe,
    encode_dataframe,
    verify_roundtrip,
)

CFG = EncodeConfig(num_partitions=2, chunk_rows=256, partition_by_host=False,
                   key_col="k")


def _roundtrip(spark, df, cfg=CFG):
    enc = encode_dataframe(df, cfg)
    out = decode_dataframe(enc)
    assert verify_roundtrip(df, out) == 0
    return out


def test_quicktest_two_row_golden(spark):
    """QuickTest (Program.cs:33-66): two simple rows, exact round-trip."""
    df = spark.createDataFrame(
        [("1", "Mark"), ("2", "Jason")], "k string, name string"
    )
    _roundtrip(spark, df)


def test_currency_guid_date_columns(spark):
    """Test1 (Program.cs:67-116): currency (decimal), guid-as-string,
    date columns survive bit-identically. Decimal rides the cast path
    (the reference maps ChoCurrency -> decimal, Writer.cs:247-253)."""
    df = spark.createDataFrame(
        [
            ("a", datetime.date(2001, 1, 1), "1E32B39F-4A4A-4B48-81D3",
             "100.33"),
            ("b", datetime.date(1975, 12, 11), "23D22C16-F773-4B11-A94D",
             "500.01"),
        ],
        "k string, created date, guid string, salary string",
    ).withColumn("salary", F.col("salary").cast("decimal(18,4)"))
    _roundtrip(spark, df)


def test_bytearray_and_map_columns(spark):
    """ByteArrayTest (Program.cs:607-636): binary payloads + a map
    column; the reference writes maps as Key/Value pairs, we hold
    MapType natively (JSON storage form, restored on decode)."""
    df = spark.createDataFrame(
        [
            ("r1", bytearray(b"Hello world"), {"K1": 33}),
            ("r2", bytearray(b"\x00\xff\xfe"), {"K2": -1, "K3": 0}),
        ],
        "k string, image binary, tags map<string,long>",
    )
    enc = encode_dataframe(df, CFG)
    out = decode_dataframe(enc)
    src_rows = {r["k"]: r for r in df.collect()}
    for r in out.collect():
        s = src_rows[r["k"]]
        assert bytes(r["image"]) == bytes(s["image"])
        assert r["tags"] == s["tags"]


def test_serialize_datetime(spark):
    """SerializeDateTime (Program.cs:637-673): timestamps incl. epoch
    edges pinned to UTC micros end-to-end (SURVEY §7 'timestamp
    fidelity')."""
    df = spark.createDataFrame(
        [
            ("a", datetime.datetime(1970, 1, 1, 0, 0, 0)),
            ("b", datetime.datetime(1969, 12, 31, 23, 59, 59, 999999)),
            ("c", datetime.datetime(2262, 1, 1, 12, 34, 56, 789012)),
            ("d", None),
        ],
        "k string, ts timestamp",
    )
    _roundtrip(spark, df)


def test_csv_array_to_parquet_array_column(spark):
    """CSVArrayToParquet (Program.cs:400-443): array column; the
    reference flattens to indexed columns, we keep ArrayType (JSON
    storage form)."""
    df = spark.createDataFrame(
        [("1", "Tom", ["92480", "92481"]), ("2", "Mark", []), ("3", "x", None)],
        "k string, name string, zips array<string>",
    )
    enc = encode_dataframe(df, CFG)
    out = decode_dataframe(enc)
    got = {r["k"]: r["zips"] for r in out.collect()}
    assert got == {"1": ["92480", "92481"], "2": [], "3": None}


def test_issue251_all_null_nullable_row(spark):
    """Issue251_IssueWithNullableValues (Program.cs:2359-2382): a row of
    all nulls in every nullable column round-trips as nulls, not
    defaults."""
    df = spark.createDataFrame(
        [("present", 1, 2.5, "x"), ("nulls", None, None, None)],
        "k string, n bigint, d double, s string",
    )
    _roundtrip(spark, df)


def test_db2parquet_rowgroup_scale(spark):
    """DB2ParquetTest (Program.cs:2016-2062, RowGroupSize=5000): chunking
    respects the configured row cap at row-group scale."""
    df = spark.range(0, 12000).select(
        F.col("id").cast("string").alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    cfg = EncodeConfig(
        num_partitions=1, chunk_rows=5000, partition_by_host=False,
        key_col="k",
    )
    enc = encode_dataframe(df, cfg).cache()
    n_rows = [
        r["n_rows"]
        for r in enc.filter(F.col("column") == "v").collect()
    ]
    assert max(n_rows) <= 5000 and sum(n_rows) == 12000
    out = decode_dataframe(enc)
    assert verify_roundtrip(df, out) == 0
    enc.unpersist()


def test_nested_struct_column(spark):
    """Nested objects: the reference flattens to parent/child columns
    (ChoDictionaryEx.cs:424-499); we keep StructType natively and restore
    it on decode."""
    df = spark.createDataFrame(
        [("1", {"street": "10 River Rd", "city": "Princeton"}),
         ("2", {"street": None, "city": "Edison"})],
        "k string, addr struct<street:string,city:string>",
    )
    enc = encode_dataframe(df, CFG)
    out = decode_dataframe(enc)
    got = {r["k"]: (r["addr"]["street"], r["addr"]["city"]) for r in out.collect()}
    assert got == {"1": ("10 River Rd", "Princeton"), "2": (None, "Edison")}
