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


def _decode_header(b: bytes) -> str:
    """Header values are UTF-8 per WARC 1.1 (ISO 28500 §4; 1.0 files
    are ASCII, a strict subset); fall back to latin-1 for the garbage
    tail of a real crawl — never raise on one bad header."""
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1", errors="replace")


# A WARC header block larger than this is not a header block — resync
# past the bogus version line instead of buffering the file hunting for
# the terminating blank line.
_MAX_HEADER_BYTES = 1 << 20


def parse_warc_records(
    fh, chunk_bytes: int = 4 << 20
) -> Iterator[dict]:
    """Parse a (decompressed) WARC byte STREAM into record dicts,
    incrementally: peak memory is one record + one read chunk, never
    the file (a Common-Crawl .warc is ~1 GB gzip / ~4-5 GB raw — a
    full-file slurp per task would size executors to the file, not the
    record).

    Yields ``{record_type, url, warc_ts, content_type, http_status,
    http_content_type, lang, payload}`` where ``payload`` is the HTTP
    body for ``application/http`` response records and the raw block
    otherwise. Tolerant of junk between records (the spec requires
    exactly two CRLFs; real crawls occasionally have more) and of
    corrupt framing: a negative/garbled Content-Length or an oversized
    header resyncs to the next version line instead of looping or
    misattributing bytes — one bad record must not kill a 1 GB task.
    """
    buf = bytearray()
    eof = False

    def fill(need: int) -> None:
        nonlocal buf, eof
        while not eof and len(buf) < need:
            chunk = fh.read(max(chunk_bytes, need - len(buf)))
            if not chunk:
                eof = True
                return
            buf += chunk

    while True:
        # seek the next version line (marker may straddle a chunk edge:
        # keep a 4-byte tail when discarding an unmatched prefix)
        start = buf.find(b"WARC/")
        while start < 0:
            if eof:
                return
            del buf[: max(0, len(buf) - 4)]
            n_before = len(buf)
            fill(n_before + 1)
            if len(buf) == n_before and eof:
                return
            start = buf.find(b"WARC/")
        del buf[:start]
        # find the end of the header block, reading as needed
        head_end = buf.find(b"\r\n\r\n")
        while head_end < 0 and not eof and len(buf) <= _MAX_HEADER_BYTES:
            fill(len(buf) + chunk_bytes)
            head_end = buf.find(b"\r\n\r\n")
        if head_end < 0:
            if eof:
                return
            del buf[:5]  # oversized "header": bogus marker, resync
            continue
        headers: dict[str, str] = {}
        for ln in bytes(buf[:head_end]).split(_CRLF)[1:]:
            k, sep, v = ln.partition(b":")
            if sep:
                headers[_decode_header(k.strip()).lower()] = _decode_header(
                    v.strip()
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = -1
        if length > (1 << 31):
            length = -1  # absurd length = corrupt framing, resync
        if length < 0:
            # corrupt/absent Content-Length: the block boundary is
            # unknowable — skip this version line and resync forward
            # (never backward: a negative length must not re-find the
            # same record and loop forever)
            del buf[:5]
            continue
        total = head_end + 4 + length
        fill(total)
        block = bytes(buf[head_end + 4 : total])  # truncates at EOF
        del buf[:total]
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


def parse_warc_stream(raw: bytes) -> Iterator[dict]:
    """In-memory convenience wrapper over :func:`parse_warc_records`
    (tests, small buffers). Large files should stream through
    :func:`read_warc_file` instead."""
    yield from parse_warc_records(io.BytesIO(raw))


def _clean_header_value(v: str | None) -> str | None:
    """Strip CR/LF and other C0 controls from a header value: a url
    containing ``\\r\\n`` would otherwise inject headers and corrupt the
    record framing (same reason HTTP forbids them). Non-ASCII stays —
    headers are UTF-8 per WARC 1.1 and :func:`_decode_header` reads
    them back bit-exact."""
    if v is None:
        return None
    return "".join(ch for ch in v if ch >= " " or ch == "\t")


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
    url = _clean_header_value(url)
    lang = _clean_header_value(lang)
    http_content_type = _clean_header_value(http_content_type)
    if record_type == "response":
        http = (
            f"HTTP/1.1 {http_status} OK\r\n"
            f"Content-Type: {http_content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("utf-8") + payload
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
    return "".join(head).encode("utf-8") + block + _CRLF + _CRLF


def read_warc_file(path: str) -> Iterator[dict]:
    """Parse one .warc / .warc.gz / .wet.gz file (gzip sniffed by
    magic, multi-member streams handled by the stdlib), STREAMING:
    ``gzip.open`` decompresses incrementally into
    :func:`parse_warc_records`, so peak task memory is one record +
    one chunk — a 1 GB gzip / 5 GB raw crawl file never materializes
    in the worker."""
    with open(path, "rb") as fh:
        magic = fh.read(2)
        fh.seek(0)
        if magic == _GZIP_MAGIC:
            with gzip.open(fh, "rb") as gz:
                yield from parse_warc_records(gz)
        else:
            yield from parse_warc_records(fh)


def write_warc_member(fh: io.BufferedIOBase, record_bytes: bytes) -> None:
    """Append one record as its OWN gzip member (the Common-Crawl
    layout that makes member-boundary range splits possible)."""
    fh.write(gzip.compress(record_bytes, compresslevel=1))
