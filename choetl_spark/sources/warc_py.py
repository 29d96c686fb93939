"""Pure-Python WARC (ISO 28500) record codec + distributed Spark reader.

Common-Crawl web pages — the north-rule input — are shipped as WARC:
``response`` records whose block is a full HTTP response (status line,
headers, blank line, html body), and WET sidecar files of ``conversion``
records whose block is the extracted text. This module closes the loop
from raw crawl to the engine's input table shape
``(url, warc_ts, html, text, lang)``:

    read_warc(spark, "crawl/*.warc.gz")      -> one row per WARC record
    warc_webpages(records)                   -> the north-rule table

Reference analog: ChoETL's format-reader family (a new format = a new
reader exposing records as an enumerable —
reference src/ChoETL/File/Xml/ChoXmlReader.cs:22, same contract for
CSV/JSON/Avro); WARC is the format its web-crawl users would have
needed next. Implemented from the PUBLIC ISO 28500 / WARC 1.1
specification (iipc/warc-specifications) + Common Crawl's published
conventions; no reference code involved.

Execution shape (same recipe as :mod:`choetl_spark.direct`): the DRIVER
lists files (pure metadata, zero Spark jobs), ships one descriptor per
task, and each Python task streams its file through the parser —
payload bytes never cross the JVM->Python boundary on the way in; only
the parsed records cross (as Arrow batches). Per-RECORD Python is
inherent here (variable-length binary framing, like the multimodal
decoders); payload bytes themselves move as zero-copy slices. At
Common-Crawl scale files are ~1 GB and records-per-file ~100k, so the
per-record overhead amortizes against gzip + HTTP parsing, and the
file count (>100k per crawl) gives the cluster its parallelism.

gzip: Common Crawl compresses each record as its OWN gzip member so
byte-range splits can start at member boundaries. Python's ``gzip``
reads multi-member streams transparently; this reader decompresses a
FILE per task (the member-boundary split index is a cluster-side
optimization the sandbox cannot exercise — a file is already the unit
of parallelism here, exactly like :func:`read_kvp`'s file framing).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from datetime import datetime, timezone

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


# ---------------------------------------------------------------- codec


def _parse_warc_date(s: str) -> datetime | None:
    """WARC-Date: UTC ``YYYY-MM-DDTHH:MM:SSZ`` (1.0) with optional
    fractional seconds (1.1). Returns an aware UTC datetime."""
    s = s.strip()
    if not s:
        return None
    for fmt in ("%Y-%m-%dT%H:%M:%S.%fZ", "%Y-%m-%dT%H:%M:%SZ"):
        try:
            return datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
        except ValueError:
            continue
    return None


def _format_warc_date(dt: datetime) -> str:
    """Second precision when the value is whole-second (the WARC 1.0
    form Common Crawl emits), else 1.1 fractional form — both re-parse
    bit-identically."""
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    if dt.microsecond:
        return dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ")
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _split_http_response(block: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, Content-Type, body) from an ``application/http``
    response block. A malformed block degrades to (None, None, block)
    rather than raising — crawls contain garbage and one bad record
    must not kill a 1 GB task."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    head_end = block.find(b"\r\n\r\n")
    if head_end < 0:
        return None, None, block
    head = block[:head_end].decode("latin-1", errors="replace")
    lines = head.split("\r\n")
    try:
        status = int(lines[0].split(None, 2)[1])
    except (IndexError, ValueError):
        return None, None, block
    ctype = None
    for ln in lines[1:]:
        k, sep, v = ln.partition(":")
        if sep and k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, block[head_end + 4 :]


def parse_warc_stream(raw: bytes) -> Iterator[dict]:
    """Parse a (decompressed) WARC stream into record dicts.

    Yields ``{record_type, url, warc_ts, content_type, http_status,
    http_content_type, payload}`` where ``payload`` is the HTTP body for
    ``application/http`` response records and the raw block otherwise.
    Tolerant of leading/trailing junk between records (spec requires
    exactly two CRLFs; real crawls occasionally have more).
    """
    pos = 0
    n = len(raw)
    while pos < n:
        # seek the next version line
        start = raw.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = raw.find(b"\r\n\r\n", start)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for ln in raw[start:head_end].split(_CRLF)[1:]:
            k, sep, v = ln.partition(b":")
            if sep:
                headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                    "latin-1", errors="replace"
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            # unrecoverable framing: without Content-Length the block
            # boundary is unknown — stop rather than misattribute bytes
            return
        block_start = head_end + 4
        block = raw[block_start : block_start + length]
        pos = block_start + length
        ctype = headers.get("content-type", "")
        status: int | None = None
        http_ctype: str | None = None
        payload = block
        if ctype.startswith("application/http"):
            status, http_ctype, payload = _split_http_response(block)
        yield {
            "record_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri"),
            "warc_ts": _parse_warc_date(headers.get("warc-date", "")),
            "content_type": ctype or None,
            "http_status": status,
            "http_content_type": http_ctype,
            # Common Crawl's WET language annotation (CLD2, comma list,
            # primary first) — fills the north-rule `lang` column
            "lang": headers.get("warc-identified-content-language"),
            "payload": payload,
        }


def build_warc_record(
    record_type: str,
    url: str | None,
    warc_ts: datetime | None,
    payload: bytes,
    http_content_type: str = "text/html; charset=utf-8",
    http_status: int = 200,
    lang: str | None = None,
) -> bytes:
    """One spec-form WARC record. ``response`` wraps the payload in an
    HTTP/1.1 response (the Common-Crawl .warc layout); every other type
    stores the payload as the raw block (``conversion`` = the WET
    layout). Record-ID derives from (type, url, ts) so identical logical
    records build identical bytes — the writer is deterministic."""
    if record_type == "response":
        http = (
            f"HTTP/1.1 {http_status} OK\r\n"
            f"Content-Type: {http_content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("ascii") + payload
        block, ctype = http, "application/http; msgtype=response"
    else:
        block = payload
        ctype = "text/plain" if record_type == "conversion" else (
            "application/octet-stream"
        )
    ts = warc_ts or datetime(1970, 1, 1, tzinfo=timezone.utc)
    import hashlib

    rid = hashlib.md5(
        f"{record_type}|{url}|{ts.isoformat()}".encode()
    ).hexdigest()
    head = [f"WARC/1.0\r\nWARC-Type: {record_type}\r\n"]
    if url is not None:
        head.append(f"WARC-Target-URI: {url}\r\n")
    if lang is not None:
        head.append(f"WARC-Identified-Content-Language: {lang}\r\n")
    head.append(
        f"WARC-Date: {_format_warc_date(ts)}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    )
    return "".join(head).encode("ascii") + block + _CRLF + _CRLF


def read_warc_file(path: str) -> Iterator[dict]:
    """Parse one .warc / .warc.gz / .wet.gz file (gzip sniffed by
    magic, multi-member streams handled by the stdlib)."""
    with open(path, "rb") as fh:
        raw = fh.read()
    if raw[:2] == _GZIP_MAGIC:
        raw = gzip.decompress(raw)
    yield from parse_warc_stream(raw)


def write_warc_member(fh: io.BufferedIOBase, record_bytes: bytes) -> None:
    """Append one record as its OWN gzip member (the Common-Crawl
    layout that makes member-boundary range splits possible)."""
    fh.write(gzip.compress(record_bytes, compresslevel=1))
