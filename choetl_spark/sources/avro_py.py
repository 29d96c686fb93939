"""Pure-Python Avro Object Container File bridge.

The primary Avro path is the spark-avro module (``read_avro`` /
``write_avro`` try it first — reference treats Avro as first-class:
src/ChoETL.Avro/ChoAvroReader.cs:21, ChoAvroWriter.cs:17). This module
is the FALLBACK for environments without the spark-avro jar (like this
sandbox): a from-scratch implementation of the public Avro 1.x
specification — container framing (magic, metadata map, sync-marked
blocks) and binary encoding (zigzag varints, IEEE little-endian floats,
length-prefixed strings/bytes, union index prefix) — restricted to FLAT
record schemas over null/boolean/int/long/float/double/string/bytes and
their nullable ``["null", T]`` unions, plus the timestamp-micros logical
type. That is exactly the record shape the reference's Avro tests use
(src/Test/ChoAvroReaderTest/Program.cs:73-96, flat POCO records).

The row encode/decode is per-row Python — acceptable here because this
is a format BRIDGE for jar-less environments, not a hot analytics path;
on a cluster spark-avro (JVM, vectorized) takes over via the same
``read_avro``/``write_avro`` entry points. Codecs: null and deflate
(raw DEFLATE per spec); snappy is not in this container.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from collections.abc import Iterable, Iterator

MAGIC = b"Obj\x01"
SYNC = b"\x9ap\x11\xc2choetlspark1"  # fixed 16-byte sync marker per spec
assert len(SYNC) == 16


# ---------------------------------------------------------------------------
# binary encoding primitives (Avro spec "Binary Encoding")
# ---------------------------------------------------------------------------


def _write_long(buf: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_long(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _write_bytes(buf: bytearray, b: bytes) -> None:
    _write_long(buf, len(b))
    buf += b


def _read_bytes(buf: memoryview, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(buf, pos)
    return bytes(buf[pos : pos + n]), pos + n


# ---------------------------------------------------------------------------
# schema <-> flat (name, avro_type, nullable) field list
# ---------------------------------------------------------------------------

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "string", "bytes"}


def _field_type(t) -> tuple[str, bool]:
    """Avro field type -> (primitive_name, nullable)."""
    if isinstance(t, str):
        return t, False
    if isinstance(t, dict):  # logical types ride on a primitive
        return str(t["type"]), False
    if isinstance(t, list):  # union; only ["null", T] supported
        others = [x for x in t if x != "null"]
        if len(others) != 1:
            raise ValueError(f"unsupported union {t}")
        prim, _ = _field_type(others[0])
        return prim, True
    raise ValueError(f"unsupported avro type {t!r}")


def parse_schema(schema: dict) -> list[tuple[str, str, bool]]:
    if schema.get("type") != "record":
        raise ValueError("only flat record schemas are supported")
    out = []
    for f in schema["fields"]:
        prim, nullable = _field_type(f["type"])
        if prim not in _PRIMITIVES:
            raise ValueError(f"unsupported field type {f['type']!r}")
        out.append((f["name"], prim, nullable))
    return out


def _encode_row(buf: bytearray, fields, row) -> None:
    for name, prim, nullable in fields:
        v = row[name]
        if nullable:
            if v is None:
                buf.append(0)  # union index 0 = null (<<1 zigzag = 0)
                continue
            buf.append(2)  # union index 1, zigzag-encoded
        if prim in ("long", "int"):
            _write_long(buf, int(v))
        elif prim == "string":
            _write_bytes(buf, v.encode("utf-8"))
        elif prim == "bytes":
            _write_bytes(buf, bytes(v))
        elif prim == "double":
            buf += struct.pack("<d", float(v))
        elif prim == "float":
            buf += struct.pack("<f", float(v))
        elif prim == "boolean":
            buf.append(1 if v else 0)
        elif prim == "null":
            pass
        else:  # pragma: no cover
            raise ValueError(prim)


def _decode_row(buf: memoryview, pos: int, fields) -> tuple[dict, int]:
    row = {}
    for name, prim, nullable in fields:
        if nullable:
            idx, pos = _read_long(buf, pos)
            if idx == 0:
                row[name] = None
                continue
        if prim in ("long", "int"):
            row[name], pos = _read_long(buf, pos)
        elif prim == "string":
            b, pos = _read_bytes(buf, pos)
            row[name] = b.decode("utf-8")
        elif prim == "bytes":
            row[name], pos = _read_bytes(buf, pos)
        elif prim == "double":
            row[name] = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif prim == "float":
            row[name] = struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        elif prim == "boolean":
            row[name] = bool(buf[pos])
            pos += 1
        elif prim == "null":
            row[name] = None
    return row, pos


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------


def write_container(
    out: io.BufferedIOBase,
    schema: dict,
    rows: Iterable[dict],
    codec: str = "deflate",
    block_rows: int = 4096,
) -> int:
    """Write an Avro Object Container File; returns rows written."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec} (null|deflate)")
    fields = parse_schema(schema)
    header = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(header, len(meta))
    for k, v in meta.items():
        _write_bytes(header, k.encode())
        _write_bytes(header, v)
    _write_long(header, 0)  # end of metadata map
    header += SYNC
    out.write(bytes(header))

    n_total = 0
    block = bytearray()
    n_block = 0

    def flush():
        nonlocal block, n_block
        if not n_block:
            return
        data = bytes(block)
        if codec == "deflate":
            c = zlib.compressobj(9, zlib.DEFLATED, -15)
            data = c.compress(data) + c.flush()
        frame = bytearray()
        _write_long(frame, n_block)
        _write_long(frame, len(data))
        out.write(bytes(frame))
        out.write(data)
        out.write(SYNC)
        block = bytearray()
        n_block = 0

    for row in rows:
        _encode_row(block, fields, row)
        n_block += 1
        n_total += 1
        if n_block >= block_rows:
            flush()
    flush()
    return n_total


def read_container(data: bytes) -> tuple[dict, Iterator[dict]]:
    """Parse an Avro Object Container File -> (schema, row iterator)."""
    view = memoryview(data)
    if bytes(view[:4]) != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(view, pos)
        if n == 0:
            break
        if n < 0:  # block with byte-size prefix
            _, pos = _read_long(view, pos)
            n = -n
        for _ in range(n):
            k, pos = _read_bytes(view, pos)
            v, pos = _read_bytes(view, pos)
            meta[k.decode()] = v
    sync = bytes(view[pos : pos + 16])
    pos += 16
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    fields = parse_schema(schema)

    def rows() -> Iterator[dict]:
        p = pos
        while p < len(view):
            count, p = _read_long(view, p)
            nbytes, p = _read_long(view, p)
            payload = view[p : p + nbytes]
            p += nbytes
            if bytes(view[p : p + 16]) != sync:
                raise ValueError("sync marker mismatch (corrupt container)")
            p += 16
            if codec == "deflate":
                payload = memoryview(zlib.decompress(bytes(payload), -15))
            elif codec != "null":
                raise ValueError(f"unsupported codec {codec}")
            q = 0
            for _ in range(count):
                row, q = _decode_row(payload, q, fields)
                yield row

    return schema, rows()


# ---------------------------------------------------------------------------
# Spark bridge
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "int": "int",
    "integer": "int",
    "bigint": "long",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
}
_AVRO_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
}


def avro_schema_for(df) -> dict:
    fields = []
    for f in df.schema.fields:
        s = f.dataType.simpleString()
        if s.startswith("timestamp"):
            t: object = {"type": "long", "logicalType": "timestamp-micros"}
        elif s in _SPARK_TO_AVRO:
            t = _SPARK_TO_AVRO[s]
        else:
            raise ValueError(f"flat-avro bridge: unsupported column type {s}")
        fields.append(
            {"name": f.name, "type": ["null", t] if f.nullable else t}
        )
    return {"type": "record", "name": "row", "fields": fields}


def _spark_ddl_for(schema: dict) -> str:
    cols = []
    for f in schema["fields"]:
        t = f["type"]
        nullable = isinstance(t, list)
        if nullable:
            t = [x for x in t if x != "null"][0]
        if isinstance(t, dict) and t.get("logicalType", "").startswith(
            "timestamp"
        ):
            ddl = "timestamp"
        else:
            prim, _ = _field_type(t)
            ddl = _AVRO_TO_SPARK[prim]
        cols.append(f"`{f['name']}` {ddl}")
    return ", ".join(cols)


def write_avro_py(df, path: str, codec: str = "deflate") -> None:
    """Distributed fallback writer: each task writes one container file
    under ``path`` (works against any task-visible filesystem).

    Overwrite semantics match the primary spark-avro path (stale part
    files cleared — see :mod:`choetl_spark.sources.partfiles`). Nulls
    come from Arrow validity (``to_pylist`` yields None), so float NaN
    stays a value and null timestamps take the Avro null branch — no
    pandas NaN/NaT ambiguity."""
    from choetl_spark.sources.partfiles import write_part_files

    schema = avro_schema_for(df)
    ts_cols = {
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString().startswith("timestamp")
    }
    names = [f.name for f in df.schema.fields]

    def encode_batches(batches, fh) -> int:
        import pyarrow as pa

        def rows():
            for batch in batches:
                cols = []
                for name in names:
                    col = batch.column(batch.schema.get_field_index(name))
                    if name in ts_cols:
                        # timestamp-micros as long; validity preserved
                        col = col.cast(pa.timestamp("us")).cast(pa.int64())
                    cols.append(col.to_pylist())
                for tup in zip(*cols):
                    yield dict(zip(names, tup))

        return write_container(fh, schema, rows(), codec=codec)

    write_part_files(df, path, "avro", encode_batches)


def read_avro_py(spark, path: str):
    """Distributed fallback reader: binaryFile scan + per-file container
    parse; schema from the first file's header."""
    import glob as _glob

    import pandas as pd

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.avro")))
        if not files:
            raise FileNotFoundError(
                f"no .avro part files under {path} (an empty write "
                "leaves none — the container carries the schema, so an "
                "empty dataset cannot be re-read from nothing)"
            )
    else:
        files = [path]
    with open(files[0], "rb") as fh:
        schema, _ = read_container(fh.read())
    ddl = _spark_ddl_for(schema)

    def _is_ts(ftype) -> bool:
        # the timestamp marker is a logicalType on the NON-null branch,
        # wherever it sits in the union; other logical types (uuid,
        # decimal...) ride their primitive and must NOT be converted
        if isinstance(ftype, list):
            ftype = next((x for x in ftype if x != "null"), "null")
        return isinstance(ftype, dict) and str(
            ftype.get("logicalType", "")
        ).startswith("timestamp")

    ts_cols = [f["name"] for f in schema["fields"] if _is_ts(f["type"])]
    names = [f["name"] for f in schema["fields"]]

    def parse(it):
        for pdf in it:
            for content in pdf["content"]:
                _, rows = read_container(bytes(content))
                recs = list(rows)
                # per-column object series, NOT pd.DataFrame(list(rows)):
                # a nullable long column with any null would be coerced to
                # float64, silently corrupting int64 values beyond 2^53
                # (same guard as bson_py.py; ADVICE r2)
                out = pd.DataFrame(
                    {
                        n: pd.Series(
                            [r.get(n) for r in recs], dtype=object
                        )
                        for n in names
                    },
                    columns=names,
                )
                for c in ts_cols:
                    # the container stores true UTC epoch micros
                    # (timestamp-micros); the series must be tz-AWARE or
                    # Spark reinterprets naive values in the session TZ
                    # and shifts every timestamp by the UTC offset
                    out[c] = pd.to_datetime(out[c], unit="us", utc=True)
                yield out

    binf = spark.read.format("binaryFile").load(
        os.path.join(path, "*.avro") if os.path.isdir(path) else path
    )
    return binf.select("content").mapInPandas(parse, ddl)
