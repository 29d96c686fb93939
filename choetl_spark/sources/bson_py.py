"""Pure-Python BSON bridge (flat documents).

The reference ships a BSON module (src/ChoETL.BSON/ChoBSONReader.cs:21,
MongoDB-driver-backed). No mongo/bson library exists in this container,
so — like the Avro bridge — this is a from-scratch implementation of the
public BSON spec (bsonspec.org, version 1.1) restricted to the flat
record shapes the reference's reader surfaces: double, string, binary,
bool, UTC datetime (ms), null, int32, int64; embedded documents and
arrays are carried as JSON strings. File layout is the standard BSON
dump: concatenated documents (what ``mongodump`` writes).

The per-row encode/decode is Python — a format bridge for the on-disk
interchange format, not an analytics hot path; query work happens after
the bridge lands rows in a DataFrame.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import struct
from collections.abc import Iterator

_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def _cstring(buf: memoryview, pos: int) -> tuple[str, int]:
    end = pos
    while buf[end] != 0:
        end += 1
    return bytes(buf[pos:end]).decode("utf-8"), end + 1


def decode_document(buf: memoryview, pos: int = 0) -> tuple[dict, int]:
    """Decode one BSON document starting at ``pos`` -> (dict, next_pos)."""
    total = struct.unpack_from("<i", buf, pos)[0]
    end = pos + total - 1  # position of trailing 0x00
    p = pos + 4
    out: dict = {}
    while p < end:
        etype = buf[p]
        p += 1
        name, p = _cstring(buf, p)
        if etype == 0x01:  # double
            out[name] = struct.unpack_from("<d", buf, p)[0]
            p += 8
        elif etype == 0x02:  # string
            slen = struct.unpack_from("<i", buf, p)[0]
            out[name] = bytes(buf[p + 4 : p + 4 + slen - 1]).decode("utf-8")
            p += 4 + slen
        elif etype in (0x03, 0x04):  # embedded doc / array -> JSON string
            sub, p2 = decode_document(buf, p)
            if etype == 0x04:
                out[name] = json.dumps(
                    [sub[str(i)] for i in range(len(sub))], default=str
                )
            else:
                out[name] = json.dumps(sub, default=str)
            p = p2
        elif etype == 0x05:  # binary
            blen = struct.unpack_from("<i", buf, p)[0]
            out[name] = bytes(buf[p + 5 : p + 5 + blen])  # skip subtype
            p += 5 + blen
        elif etype == 0x07:  # ObjectId -> 24-char hex string (mongodump
            # documents always carry one in _id)
            out[name] = bytes(buf[p : p + 12]).hex()
            p += 12
        elif etype == 0x08:  # bool
            out[name] = bool(buf[p])
            p += 1
        elif etype == 0x09:  # UTC datetime, int64 ms
            ms = struct.unpack_from("<q", buf, p)[0]
            out[name] = _EPOCH + _dt.timedelta(milliseconds=ms)
            p += 8
        elif etype == 0x0A:  # null
            out[name] = None
        elif etype == 0x10:  # int32
            out[name] = struct.unpack_from("<i", buf, p)[0]
            p += 4
        elif etype == 0x12:  # int64
            out[name] = struct.unpack_from("<q", buf, p)[0]
            p += 8
        else:
            raise ValueError(f"unsupported BSON element type 0x{etype:02x}")
    return out, end + 1


def iter_documents(data: bytes) -> Iterator[dict]:
    view = memoryview(data)
    pos = 0
    while pos < len(view):
        doc, pos = decode_document(view, pos)
        yield doc


def encode_document(doc: dict, type_hints: dict[str, str] | None = None) -> bytes:
    """Encode one flat dict as a BSON document. ``type_hints`` maps
    column -> spark type ddl to disambiguate int32/int64/timestamp."""
    hints = type_hints or {}
    body = bytearray()
    for name, v in doc.items():
        nb = name.encode("utf-8") + b"\x00"
        hint = hints.get(name, "")
        if v is None:
            body += b"\x0a" + nb
        elif isinstance(v, bool):
            body += b"\x08" + nb + (b"\x01" if v else b"\x00")
        elif isinstance(v, _dt.datetime):
            if v.tzinfo is None:
                v = v.replace(tzinfo=_dt.timezone.utc)
            # integer floor-division: float total_seconds() truncation
            # corrupted pre-epoch values by +1ms. BSON datetime is
            # ms-precision — sub-ms components round to the nearest ms
            # (documented loss, not silent float drift).
            us = (v - _EPOCH) // _dt.timedelta(microseconds=1)
            if us >= 0:
                ms = (us + 500) // 1000
            else:
                ms = -((-us + 500) // 1000)
            body += b"\x09" + nb + struct.pack("<q", ms)
        elif isinstance(v, float):
            body += b"\x01" + nb + struct.pack("<d", v)
        elif isinstance(v, int):
            if hint in ("int", "integer") and -(1 << 31) <= v < (1 << 31):
                body += b"\x10" + nb + struct.pack("<i", v)
            else:
                body += b"\x12" + nb + struct.pack("<q", v)
        elif isinstance(v, str):
            sb = v.encode("utf-8") + b"\x00"
            body += b"\x02" + nb + struct.pack("<i", len(sb)) + sb
        elif isinstance(v, (bytes, bytearray)):
            body += (
                b"\x05" + nb + struct.pack("<i", len(v)) + b"\x00" + bytes(v)
            )
        else:
            raise TypeError(f"flat-bson bridge: unsupported value {type(v)}")
    return struct.pack("<i", len(body) + 5) + bytes(body) + b"\x00"


# ---------------------------------------------------------------------------
# Spark bridge
# ---------------------------------------------------------------------------


def read_bson_py(spark, path: str, schema: str):
    """Distributed reader over a BSON dump directory/file: binaryFile
    scan + per-file document parse; ``schema`` (Spark DDL) declares the
    flat record shape (the reference's POCO equivalent)."""
    import pandas as pd

    from pyspark.sql.types import _parse_datatype_string

    names = [f.name for f in _parse_datatype_string(schema).fields]
    if os.path.isdir(path):
        import glob as _glob

        if not _glob.glob(os.path.join(path, "*.bson")):
            # empty write leaves no part files; schema is explicit here,
            # so an empty DataFrame is the faithful read
            return spark.createDataFrame([], schema)

    def parse(it):
        for pdf in it:
            for content in pdf["content"]:
                rows = list(iter_documents(bytes(content)))
                out = pd.DataFrame(
                    [{n: r.get(n) for n in names} for r in rows],
                    columns=names,
                    dtype=object,
                )
                yield out

    binf = spark.read.format("binaryFile").load(
        os.path.join(path, "*.bson") if os.path.isdir(path) else path
    )
    return binf.select("content").mapInPandas(parse, schema)


def write_bson_py(df, path: str) -> None:
    """Distributed writer: one ``.bson`` dump file per task under
    ``path``; overwrite clears stale part files."""
    from choetl_spark.sources.partfiles import write_part_files

    hints = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    names = [f.name for f in df.schema.fields]

    def encode_batches(batches, fh) -> int:
        n = 0
        for batch in batches:
            cols = [
                batch.column(batch.schema.get_field_index(c)).to_pylist()
                for c in names
            ]
            for tup in zip(*cols):
                fh.write(encode_document(dict(zip(names, tup)), hints))
                n += 1
        return n

    write_part_files(df, path, "bson", encode_batches)
