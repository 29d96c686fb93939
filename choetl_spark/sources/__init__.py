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
