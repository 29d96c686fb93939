"""WARC/WET reader + writer (ISO 28500; Common-Crawl conventions).

The format the north-rule input actually arrives in: .warc.gz of HTTP
response records (html) + .wet.gz of conversion records (extracted
text). Round-trip discipline mirrors the reference's writer tests
(reference src/Test/ChoParquetWriterTest/Program.cs golden round-trips):
bytes out == bytes in, per url.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from pyspark.sql import functions as F


def test_warc_record_bytes_roundtrip():
    from choetl_spark.sources.warc_py import (
        build_warc_record,
        parse_warc_stream,
    )

    ts = datetime(2024, 5, 1, 12, 0, 3, tzinfo=timezone.utc)
    body = b"<html><body>\xe2\x9c\x93 ok</body></html>"
    raw = build_warc_record("response", "https://a.example.com/x", ts, body)
    raw += build_warc_record(
        "conversion", "https://a.example.com/x", ts, b"ok", "text/plain"
    )
    recs = list(parse_warc_stream(raw))
    assert [r["record_type"] for r in recs] == ["response", "conversion"]
    resp, conv = recs
    assert resp["url"] == "https://a.example.com/x"
    assert resp["warc_ts"] == ts
    assert resp["http_status"] == 200
    assert resp["http_content_type"] == "text/html; charset=utf-8"
    assert resp["payload"] == body  # byte-identical through the envelope
    assert conv["payload"] == b"ok"
    assert conv["content_type"] == "text/plain"


def test_warc_fractional_date_and_binary_payload_roundtrip():
    from choetl_spark.sources.warc_py import (
        build_warc_record,
        parse_warc_stream,
    )

    ts = datetime(2024, 5, 1, 12, 0, 3, 250000, tzinfo=timezone.utc)
    payload = bytes(range(256))  # every byte value, incl. \r\n\r\n inside
    raw = build_warc_record("response", "u", ts, payload + b"\r\n\r\n" + payload)
    (rec,) = parse_warc_stream(raw)
    assert rec["warc_ts"] == ts  # WARC 1.1 fractional form survives
    assert rec["payload"] == payload + b"\r\n\r\n" + payload


def test_warc_parser_tolerates_junk_and_malformed_http():
    from choetl_spark.sources.warc_py import (
        build_warc_record,
        parse_warc_stream,
    )

    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    good = build_warc_record("response", "u1", ts, b"A")
    # a record whose http block is garbage must degrade, not raise
    bad_http = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u2\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: 7\r\n\r\nnothttp\r\n\r\n"
    )
    raw = b"junk-before" + good + b"inter-record junk" + bad_http
    recs = list(parse_warc_stream(raw))
    assert len(recs) == 2
    assert recs[0]["payload"] == b"A"
    assert recs[1]["http_status"] is None
    assert recs[1]["payload"] == b"nothttp"  # raw block kept


def test_read_warc_end_to_end_and_webpages_join(spark, tmp_path):
    from choetl_spark.sources import read_warc, warc_webpages, write_warc

    pages = spark.createDataFrame(
        [
            (f"https://h{i % 3}.example.com/p/{i}",
             datetime(2024, 5, 1, 12, 0, i, tzinfo=timezone.utc),
             f"<html><p>page {i} é</p></html>".encode(),
             f"page {i} é",
             ["en", "de", "fr"][i % 3] + (",zho" if i % 5 == 0 else ""))
            for i in range(20)
        ],
        "url string, warc_ts timestamp, html binary, text string,"
        " langs string",
    ).repartition(3)

    warc_dir, wet_dir = f"{tmp_path}/warc", f"{tmp_path}/wet"
    write_warc(pages.select("url", "warc_ts", F.col("html").alias("payload")),
               warc_dir, record_type="response")
    write_warc(
        pages.select("url", "warc_ts",
                     F.encode("text", "utf-8").alias("payload"), "langs"),
        wet_dir, record_type="conversion", lang_col="langs",
    )

    recs = read_warc(spark, warc_dir).unionAll(read_warc(spark, wet_dir))
    web = warc_webpages(recs)
    joined = web.alias("w").join(pages.alias("s"), "url").select(
        (F.col("w.html") == F.col("s.html")).alias("html_ok"),
        (F.col("w.text") == F.col("s.text")).alias("text_ok"),
        (F.col("w.warc_ts") == F.col("s.warc_ts")).alias("ts_ok"),
        # primary language = first of the crawl's comma list
        (F.col("w.lang") == F.split("s.langs", ",").getItem(0)).alias(
            "lang_ok"
        ),
    ).collect()
    assert len(joined) == 20
    assert all(
        r.html_ok and r.text_ok and r.ts_ok and r.lang_ok for r in joined
    )

    # record_seq orders records within each part file
    seqs = (
        read_warc(spark, warc_dir)
        .groupBy("file")
        .agg(F.min("record_seq").alias("lo"),
             F.max("record_seq").alias("hi"),
             F.count("*").alias("n"))
        .collect()
    )
    for r in seqs:
        assert r.lo == 0 and r.hi == r.n - 1


def test_read_warc_max_file_bytes_guard(spark, tmp_path):
    from choetl_spark.sources import read_warc, write_warc

    pages = spark.createDataFrame(
        [("u", datetime(2024, 1, 1, tzinfo=timezone.utc), b"x" * 10000)],
        "url string, warc_ts timestamp, payload binary",
    )
    write_warc(pages, f"{tmp_path}/w")
    with pytest.raises(ValueError, match="max_file_bytes"):
        read_warc(spark, f"{tmp_path}/w", max_file_bytes=16)
    # explicit opt-out reads it
    assert read_warc(spark, f"{tmp_path}/w", max_file_bytes=None).count() == 1


def test_write_warc_is_deterministic(spark, tmp_path):
    """Identical logical records build identical member bytes — the
    record id derives from content, so reruns are diffable."""
    import glob
    import gzip

    from choetl_spark.sources import write_warc

    pages = spark.createDataFrame(
        [("u", datetime(2024, 1, 1, tzinfo=timezone.utc), b"abc")],
        "url string, warc_ts timestamp, payload binary",
    ).coalesce(1)
    write_warc(pages, f"{tmp_path}/a")
    write_warc(pages, f"{tmp_path}/b")
    [fa] = glob.glob(f"{tmp_path}/a/*.warc.gz")
    [fb] = glob.glob(f"{tmp_path}/b/*.warc.gz")
    assert gzip.decompress(open(fa, "rb").read()) == gzip.decompress(
        open(fb, "rb").read()
    )


def test_encode_job_warc_input_mode(spark, tmp_path, capsys):
    """jobs/encode_job.py --input-format warc: raw crawl dir (+ WET
    sidecar) straight into the encoded store, one job. In-process
    main() call (the spark-submit artifact itself is covered by
    test_submit_job); asserts the store scans back the exact pages."""
    import importlib.util
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "encode_job", os.path.join(repo, "jobs", "encode_job.py")
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)
    main = job.main

    from choetl_spark.ledger import scan_encoded
    from choetl_spark.sources import write_warc

    pages = spark.createDataFrame(
        [
            (f"https://h{i % 2}.example.com/{i}",
             datetime(2024, 5, 1, 12, 0, i % 60, tzinfo=timezone.utc),
             f"<html><p>doc {i}</p></html>".encode(),
             f"doc {i}")
            for i in range(50)
        ],
        "url string, warc_ts timestamp, html binary, text string",
    ).repartition(2)
    write_warc(pages.select("url", "warc_ts", F.col("html").alias("payload")),
               f"{tmp_path}/crawl", record_type="response")
    write_warc(
        pages.select("url", "warc_ts",
                     F.encode("text", "utf-8").alias("payload")),
        f"{tmp_path}/wet", record_type="conversion",
    )

    rc = main([
        "--input", f"{tmp_path}/crawl", "--input-format", "warc",
        "--wet", f"{tmp_path}/wet",
        "--output", f"{tmp_path}/store",
        "--partitions", "4", "--chunk-rows", "1024",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["partitions_encoded_this_run"] > 0

    back = scan_encoded(spark, f"{tmp_path}/store",
                        columns=["url", "text"])
    got = {r.url: r.text for r in back.collect()}
    want = {r.url: r.text for r in pages.select("url", "text").collect()}
    assert got == want


def test_warc_codec_property_roundtrip():
    """Property: any (type, url, ts, payload) round-trips bit-exact
    through build -> parse, for arbitrary binary payloads (including
    ones containing WARC/CRLF framing markers) and any microsecond
    timestamp."""
    from hypothesis import given, settings, strategies as st

    from choetl_spark.sources.warc_py import (
        build_warc_record,
        parse_warc_stream,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        rtype=st.sampled_from(["response", "conversion", "metadata"]),
        url=st.text(
            # printable, incl. non-ASCII (UTF-8 headers per WARC 1.1);
            # no surrogates, no controls/space (builder strips CR/LF
            # and the parser byte-strips header edges)
            alphabet=st.characters(
                min_codepoint=33, blacklist_categories=("Cs",)
            ),
            min_size=1, max_size=64,
        ),
        us=st.integers(min_value=0, max_value=4_102_444_800_000_000),
        payload=st.binary(max_size=2048),
        lang=st.none() | st.sampled_from(["en", "de,zho", "fr"]),
    )
    def check(rtype, url, us, payload, lang):
        ts = datetime.fromtimestamp(us / 1e6, tz=timezone.utc)
        raw = build_warc_record(rtype, url, ts, payload, lang=lang)
        (rec,) = parse_warc_stream(raw)
        assert rec["record_type"] == rtype
        assert rec["url"] == url
        assert rec["warc_ts"] == ts
        assert rec["payload"] == payload
        assert rec["lang"] == lang
        # two concatenated copies parse as exactly two records
        assert len(list(parse_warc_stream(raw + raw))) == 2

    check()


def test_warc_corrupt_framing_resync():
    """A negative Content-Length (or a bogus WARC/ marker with no
    header terminator) must RESYNC forward — never loop or kill the
    stream — and the following good record still parses."""
    from datetime import datetime, timezone

    from choetl_spark.sources.warc_py import (
        build_warc_record,
        parse_warc_stream,
    )

    ts = datetime(2026, 1, 2, tzinfo=timezone.utc)
    good = build_warc_record("conversion", "https://ok.example.org", ts, b"hi")
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: -1000\r\n\r\njunk"
    )
    huge = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: 99999999999999\r\n\r\n"
    )
    stray = b"garbage WARC/ not-a-header "
    recs = list(parse_warc_stream(bad + stray + huge + good))
    assert len(recs) == 1
    assert recs[0]["url"] == "https://ok.example.org"
    assert recs[0]["payload"] == b"hi"


def test_warc_nonascii_url_and_header_injection():
    """Non-ASCII URLs round-trip bit-exact (UTF-8 headers, WARC 1.1);
    CR/LF smuggled into a url must be stripped, not injected as
    headers."""
    from datetime import datetime, timezone

    from choetl_spark.sources.warc_py import (
        build_warc_record,
        parse_warc_stream,
    )

    ts = datetime(2026, 1, 2, tzinfo=timezone.utc)
    iri = "https://exämple.org/über?q=中文"
    raw = build_warc_record("conversion", iri, ts, b"x", lang="de")
    (rec,) = parse_warc_stream(raw)
    assert rec["url"] == iri
    assert rec["lang"] == "de"
    evil = "https://a.example.org/x\r\nWARC-Type: smuggled"
    raw2 = build_warc_record("conversion", evil, ts, b"y")
    (rec2,) = parse_warc_stream(raw2)
    assert rec2["record_type"] == "conversion"  # not smuggled
    assert "\r" not in rec2["url"] and "\n" not in rec2["url"]


def test_warc_incremental_parse_matches_slurp():
    """parse_warc_records with a tiny read chunk (every marker and
    header straddles chunk edges) yields byte-identical records to the
    in-memory wrapper."""
    import io
    from datetime import datetime, timezone

    from choetl_spark.sources.warc_py import (
        build_warc_record,
        parse_warc_records,
        parse_warc_stream,
    )

    ts = datetime(2026, 3, 4, 5, 6, 7, tzinfo=timezone.utc)
    raw = b"junk-prefix" + b"".join(
        build_warc_record(
            "response", f"https://h{i}.example.org/p", ts,
            b"<html>" + bytes([65 + i]) * (i * 37 % 300) + b"</html>",
        )
        for i in range(20)
    ) + b"tail-junk"
    slurp = list(parse_warc_stream(raw))
    stream = list(parse_warc_records(io.BytesIO(raw), chunk_bytes=7))
    assert len(slurp) == len(stream) == 20
    for a, b in zip(slurp, stream):
        assert a == b
