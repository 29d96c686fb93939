"""Format readers/writers mirroring ChoETL's reader/writer families
(SURVEY.md §2.1/2.2), expressed as thin wrappers over Spark's sources so
Catalyst keeps pushdown/pruning. Formats with no Spark-native reader
(fixed-length, manifold) are built from ``spark.read.text`` +
declarative column expressions — never per-row Python."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    infer_schema: bool = True,
    delimiter: str = ",",
    quote: str = '"',
    escape: str = "\\",
    multi_line: bool = False,
    comment: str | None = None,
) -> DataFrame:
    """ChoCSVReader analog (reference src/ChoETL/File/CSV/ChoCSVReader.cs:284):
    quote-aware, multiline-field, header, comment skip; schema scan =
    inferSchema sampling."""
    r = (
        spark.read.option("header", header)
        .option("inferSchema", infer_schema)
        .option("sep", delimiter)
        .option("quote", quote)
        .option("escape", escape)
        .option("multiLine", multi_line)
    )
    if comment:
        r = r.option("comment", comment)
    return r.csv(path)


def read_tsv(spark: SparkSession, path: str, **kw) -> DataFrame:
    """ChoTSVReader analog."""
    return read_csv(spark, path, delimiter="\t", **kw)


def read_json(spark: SparkSession, path: str, multi_line: bool = False) -> DataFrame:
    """ChoJSONReader analog; JSONPath subtree selection becomes column
    path expressions / get_json_object downstream."""
    return spark.read.option("multiLine", multi_line).json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """ChoAvroReader analog; requires spark-avro jars on the cluster."""
    return spark.read.format("avro").load(path)


@dataclass
class FixedField:
    name: str
    start: int  # 1-based, like ChoETL's positional config
    size: int
    dtype: str = "string"


def read_fixed_length(
    spark: SparkSession, path: str, fields: list[FixedField]
) -> DataFrame:
    """ChoFixedLengthReader analog
    (reference src/ChoETL/File/FixedLength/ChoFixedLengthReader.cs:20):
    positional slicing as substring projections over spark.read.text —
    one scan, whole-stage codegen, no UDFs."""
    lines = spark.read.text(path)
    cols = [
        F.trim(F.substring(F.col("value"), f.start, f.size))
        .cast(f.dtype)
        .alias(f.name)
        for f in fields
    ]
    return lines.select(*cols)


def read_manifold(
    spark: SparkSession,
    path: str,
    selector_start: int,
    selector_size: int,
    layouts: dict[str, list[FixedField]],
) -> dict[str, DataFrame]:
    """ChoManifoldReader analog
    (reference src/ChoETL/File/Manifold/ChoManifoldReader.cs:16,273-290):
    one file, many record layouts, dispatched by a record-type code
    substring → one cached scan + per-type filter/parse branches."""
    lines = spark.read.text(path)
    code = F.trim(F.substring(F.col("value"), selector_start, selector_size))
    out = {}
    for type_code, fields in layouts.items():
        branch = lines.filter(code == type_code)
        cols = [
            F.trim(F.substring(F.col("value"), f.start, f.size))
            .cast(f.dtype)
            .alias(f.name)
            for f in fields
        ]
        out[type_code] = branch.select(*cols)
    return out


def write_csv(df: DataFrame, path: str, header: bool = True, **opts) -> None:
    df.write.mode("overwrite").options(**opts).option("header", header).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def stage_as_view(df: DataFrame, name: str) -> None:
    """StageOnSQLite analog (reference src/ChoETL.Sqlite/ChoETLSqlite.cs:24-59):
    register for arbitrary SQL; the durable variant is the Iceberg/parquet
    catalog table written by the engine."""
    df.createOrReplaceTempView(name)


def read_xml_flat(
    spark: SparkSession,
    path: str,
    row_tag: str,
    fields: list[str],
) -> DataFrame:
    """ChoXmlReader analog for flat (non-nested) row elements
    (reference src/ChoETL/File/Xml/ChoXmlReader.cs:22,651-655): whole-file
    read, split on <row_tag> boundaries, per-field element extraction —
    all declarative (explode + regexp_extract), no UDFs, no spark-xml
    dependency. Nested/attribute XML would use spark-xml on a real
    cluster; this covers the flat-record shape the reference tests use.
    """
    whole = spark.read.text(path, wholetext=True)
    records = whole.select(
        F.explode(F.split(F.col("value"), f"<{row_tag}[ >]")).alias("rec")
    ).filter(F.col("rec").contains(f"</{row_tag}>"))
    cols = [
        F.regexp_extract(
            F.col("rec"), f"<{f}>([^<]*)</{f}>", 1
        ).alias(f)
        for f in fields
    ]
    return records.select(*cols)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **opts,
) -> DataFrame:
    """DB scan analog (reference src/ChoETL.Parquet/ChoParquetWriter.cs:590-631
    Write(IDataReader)): Spark's JDBC source with explicit partitioned
    reads — the distributed replacement for row-at-a-time IDataReader
    pulls. No driver jars ship in this sandbox; gated for real clusters."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in opts.items():
        r = r.option(k, v)
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    return r.load()


def write_avro(df: DataFrame, path: str, codec: str = "deflate") -> None:
    """ChoAvroWriter analog (reference src/ChoETL.Avro/ChoAvroWriter.cs:17,
    251-255, pluggable Codec): spark-avro with the codec option. Requires
    the spark-avro module on the cluster (absent in this sandbox)."""
    df.write.mode("overwrite").format("avro").option(
        "avro.codec", codec
    ).save(path)


def write_fixed_length(
    df: DataFrame, path: str, fields: list[FixedField]
) -> None:
    """Fixed-length writer: pad/truncate each column to its configured
    size (the NormalizeFieldValue pad/truncate discipline, reference
    src/ChoETL.Parquet/ChoParquetRecordWriter.cs:1222-1410) and emit one
    text column."""
    line = F.concat(
        *[
            F.rpad(
                F.coalesce(F.col(f.name).cast("string"), F.lit("")),
                f.size,
                " ",
            ).substr(1, f.size)
            for f in fields
        ]
    )
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def write_manifold(
    dfs: dict[str, tuple[DataFrame, list[FixedField]]], path: str
) -> None:
    """ChoManifoldWriter analog (reference
    src/ChoETL/File/Manifold/ChoManifoldWriter.cs:14): heterogeneous
    record types to one output — each type rendered fixed-length with its
    type code prefix, then unioned."""
    rendered = None
    for type_code, (df, fields) in dfs.items():
        line = F.concat(
            F.lit(type_code),
            *[
                F.rpad(
                    F.coalesce(F.col(f.name).cast("string"), F.lit("")),
                    f.size,
                    " ",
                ).substr(1, f.size)
                for f in fields
            ],
        )
        part = df.select(line.alias("value"))
        rendered = part if rendered is None else rendered.unionAll(part)
    rendered.write.mode("overwrite").text(path)
