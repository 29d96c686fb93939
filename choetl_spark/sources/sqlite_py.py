"""Executable SQLite staging bridge — ChoETL.Sqlite analog over the
Python stdlib ``sqlite3`` module (no JDBC driver jars needed).

Reference semantics (src/ChoETL.Sqlite/ChoETLSqlite.cs:24-59
``StageOnSQLite``; bulk load ``LoadDataToDb`` :80-170): materialize a
record stream into a REAL SQLite table (create-table from the record
shape, prepared inserts inside batched transactions), then hand back a
queryable over that table. This module re-expresses both halves
Spark-first:

- :func:`stage_sqlite` — DataFrame -> SQLite table. SQLite is a
  single-writer-per-file format, so the write is an explicit,
  documented DRIVER FUNNEL (``toLocalIterator`` keeps only one
  partition's rows in driver memory; inserts are batched
  ``executemany`` inside transactions, mirroring the reference's
  BatchSize/TurnOnTransaction discipline). This is the single-node
  parity path — for distributed durable staging use
  ``stage_durable`` (parquet / the encode engine).

- :func:`read_sqlite` — SQLite table -> DataFrame, DISTRIBUTED:
  SQLite supports unlimited concurrent read-only connections, so each
  Spark task opens the database file read-only (immutable URI) and
  scans its own ``rowid`` range — the same partitioned-read shape as
  Spark's JDBC source (``partitionColumn``/bounds), but on rowid so it
  needs no user-supplied numeric key. On a real cluster the .db file
  must live on storage visible to every executor (NFS/distributed FS);
  in local mode any path works.

Type mapping (both directions, lossless for the staging round-trip):
int/bigint <-> INTEGER, float/double <-> REAL, string <-> TEXT,
binary <-> BLOB, boolean <-> INTEGER 0/1, timestamp/date <-> TEXT
(ISO-8601), decimal <-> TEXT, array/map/struct <-> TEXT (JSON).
Non-primitive Spark types are serialized by the caller-visible
contract: pass ``schema`` (a DDL string) to :func:`read_sqlite` and the
TEXT columns are cast / ``from_json``-ed back to the declared types.
"""

from __future__ import annotations

import math
import sqlite3

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _ident(name: str) -> str:
    """Double-quoted SQLite identifier with embedded quotes doubled —
    Spark permits quotes in column names (backticked), so interpolating
    them raw would break the statement (or inject)."""
    return '"' + name.replace('"', '""') + '"'


_SQLITE_TYPE = {
    "tinyint": "INTEGER",
    "smallint": "INTEGER",
    "int": "INTEGER",
    "bigint": "INTEGER",
    "boolean": "INTEGER",
    "float": "REAL",
    "double": "REAL",
    "string": "TEXT",
    "binary": "BLOB",
    "date": "TEXT",
}


def _sqlite_decl(field: T.StructField) -> str:
    t = field.dataType
    name = t.simpleString()
    if name in _SQLITE_TYPE:
        return _SQLITE_TYPE[name]
    if name.startswith("timestamp") or name.startswith("decimal"):
        return "TEXT"
    # array / map / struct ride as JSON text
    return "TEXT"


def _to_storable(df: DataFrame) -> DataFrame:
    """Project every column to a sqlite3-bindable primitive, driver-side
    conversions kept trivial: complex -> JSON, timestamp/date/decimal ->
    ISO/decimal strings, bool -> 0/1. All JVM-side (codegen), so the
    funnel ships ready-to-bind values."""
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        t = f.dataType.simpleString()
        if t.startswith(("array", "map", "struct")):
            c = F.to_json(c)
        elif t.startswith("timestamp"):
            c = F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
        elif t == "date":
            c = c.cast("string")
        elif t.startswith("decimal"):
            c = c.cast("string")
        elif t == "boolean":
            c = c.cast("int")
        cols.append(c.alias(f.name))
    return df.select(*cols)


def stage_sqlite(
    df: DataFrame,
    db_path: str,
    table: str = "TmpTable",
    mode: str = "overwrite",
    batch_size: int = 10_000,
) -> None:
    """Materialize ``df`` into a real SQLite table (reference
    StageOnSQLite / LoadDataToDb, src/ChoETL.Sqlite/ChoETLSqlite.cs:
    24-59,80-170: create-table from record shape, prepared inserts,
    batched transactions; default table name "TmpTable" ibid:73-76).

    DRIVER FUNNEL by design — see module docstring. ``mode``:
    "overwrite" (DROP+CREATE, the reference's delete-db default) or
    "append".
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    if not table.replace("_", "").isalnum():
        raise ValueError(f"unsafe table name: {table!r}")
    storable = _to_storable(df)
    fields = df.schema.fields
    decls = ", ".join(
        f"{_ident(f.name)} {_sqlite_decl(f)}" for f in fields
    )
    placeholders = ", ".join("?" for _ in fields)
    names = ", ".join(_ident(f.name) for f in fields)
    insert = f'INSERT INTO "{table}" ({names}) VALUES ({placeholders})'

    con = sqlite3.connect(db_path)
    try:
        if mode == "overwrite":
            con.execute(f'DROP TABLE IF EXISTS "{table}"')
        con.execute(f'CREATE TABLE IF NOT EXISTS "{table}" ({decls})')
        con.commit()
        buf: list[tuple] = []
        # toLocalIterator: one partition resident at a time — bounded
        # driver memory, unlike collect()
        for row in storable.toLocalIterator(prefetchPartitions=True):
            vals = []
            for v in row:
                if isinstance(v, float) and math.isnan(v):
                    v = None
                vals.append(v)
            buf.append(tuple(vals))
            if len(buf) >= batch_size:
                con.executemany(insert, buf)
                con.commit()
                buf.clear()
        if buf:
            con.executemany(insert, buf)
        con.commit()
    finally:
        con.close()


def _storage_primitive(dt: T.DataType) -> str:
    """The sqlite3-cursor primitive a declared Spark type arrives as
    (mirrors :func:`_to_storable`'s write mapping)."""
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint", "boolean"):
        return "long"
    if s in ("float", "double"):
        return "double"
    if s == "binary":
        return "binary"
    return "string"  # timestamp/date/decimal/array/map/struct ride TEXT


def _probe(db_path: str, table: str) -> list[tuple[str, str]]:
    """(name, spark_primitive_ddl) per column via PRAGMA table_info."""
    con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    try:
        info = con.execute(f'PRAGMA table_info("{table}")').fetchall()
    finally:
        con.close()
    if not info:
        raise ValueError(f"no such table in {db_path}: {table!r}")
    out = []
    for _cid, name, decl, *_ in info:
        d = (decl or "").upper()
        if "INT" in d:
            t = "long"
        elif "REAL" in d or "FLOA" in d or "DOUB" in d:
            t = "double"
        elif "BLOB" in d or d == "":
            t = "binary"
        else:
            t = "string"
        out.append((name, t))
    return out


def _coerce(v, t: str):
    """Per-value cell coercion for SQLite's loose type affinity: a
    TEXT-declared column may hold ints, an INTEGER-declared one integral
    floats. Lossless conversions only; anything else surfaces as the
    Arrow type error it is."""
    if v is None:
        return None
    if isinstance(v, memoryview):
        return bytes(v)
    if t == "string" and not isinstance(v, str):
        return str(v)
    if t == "long" and isinstance(v, float) and v.is_integer():
        return int(v)
    return v


def read_sqlite(
    spark: SparkSession,
    db_path: str,
    table: str | None = None,
    query: str | None = None,
    num_partitions: int = 8,
    schema: str | None = None,
) -> DataFrame:
    """Distributed scan of a SQLite table: each task opens the file
    READ-ONLY (``immutable`` URI — no lock traffic between concurrent
    readers) and pulls its own contiguous ``rowid`` range, the
    stdlib-sqlite3 equivalent of Spark-JDBC partitioned reads
    (:func:`read_jdbc`). ``query=`` runs arbitrary SQL in a single
    task (no rowid to range-partition an arbitrary query by); without
    ``schema=`` the driver additionally executes the query once to
    probe column names/types, so pass ``schema=`` for expensive
    queries.

    ``schema`` (Spark DDL, e.g. ``"id bigint, ts timestamp, tags
    array<string>"``) restores non-primitive types the TEXT storage
    erased: timestamp/date/decimal/boolean columns are cast,
    array/map/struct columns are ``from_json``-ed. Without it you get
    the PRAGMA-derived primitive schema.
    """
    if (table is None) == (query is None):
        raise ValueError("pass exactly one of table= or query=")

    if table is not None:
        if not table.replace("_", "").isalnum():
            raise ValueError(f"unsafe table name: {table!r}")
        cols = _probe(db_path, table)
        con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
        try:
            lo_hi = con.execute(
                f'SELECT min(rowid), max(rowid) FROM "{table}"'
            ).fetchone()
        finally:
            con.close()
        lo, hi = lo_hi if lo_hi and lo_hi[0] is not None else (0, -1)
        n_rows = hi - lo + 1
        n_parts = max(1, min(num_partitions, n_rows))
        step = max(1, (n_rows + n_parts - 1) // n_parts) if n_rows > 0 else 1
        ranges = [
            (lo + i * step, min(lo + (i + 1) * step - 1, hi))
            for i in range(n_parts)
            if lo + i * step <= hi
        ] or [(0, -1)]
        names = ", ".join(_ident(n) for n, _ in cols)
        sql = f'SELECT {names} FROM "{table}" WHERE rowid BETWEEN ? AND ?'
    else:
        cols = None  # resolved from schema= or a driver-side probe below
        ranges = [(0, 0)]
        sql = query  # type: ignore[assignment]

    rdf = spark.createDataFrame(ranges, "lo long, hi long").repartition(
        len(ranges)
    )

    if cols is None and schema is not None:
        # schema given: storage primitives derive from it — NO probe,
        # the query runs exactly once (in the task)
        cols = [
            (f.name, _storage_primitive(f.dataType))
            for f in T.StructType.fromDDL(schema).fields
        ]
    elif cols is None:
        # no schema: probe names from the prepared statement and types
        # from the first rows' values (first non-null per column; 100-row
        # sample so a leading NULL doesn't mistype the column). NOTE this
        # executes the query driver-side IN ADDITION to the task's run —
        # pass schema= to skip the probe for expensive queries.
        con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
        try:
            cur = con.execute(sql)
            rows = cur.fetchmany(100)
            cols = []
            for i, d in enumerate(cur.description):
                v = next(
                    (r[i] for r in rows if r[i] is not None), None
                )
                if isinstance(v, (bool, int)):
                    t = "long"
                elif isinstance(v, float):
                    t = "double"
                elif isinstance(v, (bytes, memoryview)):
                    t = "binary"
                else:
                    t = "string"
                cols.append((d[0], t))
        finally:
            con.close()

    ddl = ", ".join(f"`{n}` {t}" for n, t in cols)
    col_names = [n for n, _ in cols]
    col_types = [t for _, t in cols]
    is_query = table is None

    def kernel(batches):
        import pyarrow as pa

        pa_type = {
            "long": pa.int64(),
            "double": pa.float64(),
            "binary": pa.binary(),
            "string": pa.string(),
        }
        out_schema = pa.schema(
            [(n, pa_type[t]) for n, t in zip(col_names, col_types)]
        )
        con = sqlite3.connect(
            f"file:{db_path}?mode=ro&immutable=1", uri=True
        )
        try:
            for batch in batches:
                for lo_, hi_ in zip(
                    batch.column("lo").to_pylist(),
                    batch.column("hi").to_pylist(),
                ):
                    cur = (
                        con.execute(sql)
                        if is_query
                        else con.execute(sql, (lo_, hi_))
                    )
                    while True:
                        rows = cur.fetchmany(65_536)
                        if not rows:
                            break
                        arrays = [
                            pa.array(
                                [
                                    _coerce(r[i], col_types[i])
                                    for r in rows
                                ],
                                type=out_schema.field(i).type,
                            )
                            for i in range(len(col_names))
                        ]
                        yield pa.RecordBatch.from_arrays(
                            arrays, schema=out_schema
                        )
        finally:
            con.close()

    out = rdf.mapInArrow(kernel, ddl)
    if schema is None:
        return out

    target = T.StructType.fromDDL(schema)
    restored = []
    for f in target.fields:
        t = f.dataType.simpleString()
        c = F.col(f.name)
        if t.startswith(("array", "map", "struct")):
            c = F.from_json(c, f.dataType)
        elif t != dict(cols).get(f.name, t):
            c = c.cast(f.dataType)
        restored.append(c.alias(f.name))
    return out.select(*restored)
