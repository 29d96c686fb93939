"""Deterministic synthesis of the Common-Crawl-style web-page table.

Input shape mandated by BASELINE.json's input_hint:
    (url string, warc_ts timestamp, html binary, text string, lang string)

Properties (all derived purely from the row id via vectorized integer
mixing, so the table is identical regardless of partitioning/parallelism):

- skewed host distribution: a few hot domains hold a large share of rows
  (exercises the salted-repartition path);
- long-tail html sizes: most pages small, a heavy tail of oversized blobs
  (exercises size-capped chunking);
- ``text`` is derived deterministically from ``html`` (it is exactly the
  body words of the html), so the byte-identical-text-per-url invariant
  is checkable end to end;
- ``lang`` is low-NDV categorical (dictionary-codec natural fit).

Mirrors the reference's inline fixture synthesis style
(reference src/Test/ChoParquetWriterTest/Program.cs:38-51) but seeded and
distributed: generation happens in a vectorized ``mapInArrow`` over
``spark.range`` — no driver-side loops, scales with the range.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

SCHEMA_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"

_LANGS = np.array(["en", "de", "fr", "es", "zh", "ru", "ja"])
_LANG_CDF = np.cumsum([0.55, 0.10, 0.10, 0.08, 0.07, 0.05, 0.05])
_N_HOSTS = 200
_HOT_SHARE = 0.35  # hosts 0..2 jointly take ~35% of rows
_VOCAB = np.array(
    (
        "the of and to in is was he for it with as his on be at by had this "
        "page data web site news link home search about contact image time "
        "world story coffee mountain river quiet sudden yellow window "
        "market garden silver stone paper little large public system value "
        "order group number water sound place work part take know good new "
        "first last long great own other old right big high small different "
        "archive crawl robot index query token parse render script style"
    ).split()
)
_BASE_TS_US = 1_690_000_000_000_000  # 2023-07-22 UTC, microseconds


def _mix(ids: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64-style vectorized hash of row ids, uint64."""
    golden = (0x9E3779B97F4A7C15 * (salt + 1)) & 0xFFFFFFFFFFFFFFFF
    z = (ids.astype(np.uint64) + np.uint64(golden)).copy()
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def _unit(ids: np.ndarray, salt: int) -> np.ndarray:
    return (_mix(ids, salt) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _host_idx(ids: np.ndarray) -> np.ndarray:
    u = _unit(ids, 1)
    hot = u < _HOT_SHARE
    out = np.empty(len(ids), dtype=np.int64)
    out[hot] = (u[hot] / _HOT_SHARE * 3).astype(np.int64)  # hosts 0..2
    out[~hot] = 3 + ((u[~hot] - _HOT_SHARE) / (1 - _HOT_SHARE) * (_N_HOSTS - 3)).astype(
        np.int64
    )
    return np.clip(out, 0, _N_HOSTS - 1)


_VOCAB_BYTES = [w.encode() for w in _VOCAB]
_VOCAB_LENS = np.array([len(w) for w in _VOCAB_BYTES], dtype=np.int64)


def _texts_array(ids: np.ndarray, n_words: np.ndarray) -> pa.Array:
    """Assemble all texts of a batch as one scatter-built byte blob —
    zero per-row Python (same scatter trick as the FSST decoder)."""
    n = len(ids)
    total = int(n_words.sum())
    row_of = np.repeat(np.arange(n, dtype=np.int64), n_words)
    row_start_word = np.cumsum(n_words) - n_words
    pos_in_row = np.arange(total, dtype=np.int64) - np.repeat(row_start_word, n_words)
    widx = (
        _mix(ids[row_of].astype(np.uint64) * np.uint64(1315423911)
             + pos_in_row.astype(np.uint64), 5)
        % np.uint64(len(_VOCAB))
    ).astype(np.int64)

    word_lens = _VOCAB_LENS[widx] + 1  # + trailing space
    row_last = np.cumsum(n_words) - 1
    word_lens[row_last] -= 1  # last word of each row: no trailing space
    out_off = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(word_lens, out=out_off[1:])
    blob = np.empty(out_off[-1], dtype=np.uint8)

    order = np.argsort(widx, kind="stable")
    counts = np.bincount(widx, minlength=len(_VOCAB))
    starts = np.cumsum(counts) - counts
    for i, wb in enumerate(_VOCAB_BYTES):
        pos = order[starts[i] : starts[i] + counts[i]]
        if len(pos) == 0:
            continue
        base = out_off[pos]
        for k, bv in enumerate(wb):
            blob[base + k] = bv
    # spaces after every non-row-last word
    space_mask = np.ones(total, dtype=bool)
    space_mask[row_last] = False
    sp = np.flatnonzero(space_mask)
    blob[out_off[sp] + _VOCAB_LENS[widx[sp]]] = 0x20

    row_lens = out_off[np.cumsum(n_words)] - out_off[row_start_word]
    from choetl_spark.codecs.core import _strings_from_blob

    return _strings_from_blob(blob.tobytes(), row_lens, pa.string())


def synth_batch(ids: np.ndarray) -> pa.RecordBatch:
    import pyarrow.compute as pc
    host = _host_idx(ids)
    lang_idx = np.searchsorted(_LANG_CDF, _unit(ids, 2), side="right")
    lang_idx = np.clip(lang_idx, 0, len(_LANGS) - 1)
    langs = pa.array(_LANGS[lang_idx].tolist(), type=pa.string())

    # word counts: lognormal-ish body, heavy tail of big docs (~1% huge)
    u = _unit(ids, 3)
    n_words = (20 + (u * 14) ** 3).astype(np.int64)  # 20 .. ~2700
    huge = _unit(ids, 4) < 0.01
    n_words[huge] *= 40

    texts = _texts_array(ids, n_words)

    host_str = pc.utf8_lpad(
        pc.cast(pa.array(host), pa.string()), 3, padding="0"
    )
    id_str = pc.cast(pa.array(ids), pa.string())
    urls = pc.binary_join_element_wise(
        "https://www.host", host_str, ".example.com/", langs, "/page/",
        id_str, "?crawl=cc", "",
    )
    titles = pc.utf8_slice_codeunits(texts, 0, 32)
    htmls = pc.cast(
        pc.binary_join_element_wise(
            '<html><head><meta charset="utf-8"><title>', titles,
            '</title></head><body lang="', langs, '"><p>', texts,
            "</p></body></html>", "",
        ),
        pa.binary(),
    )
    ts = _BASE_TS_US + ids * 37_000_000 + (
        _mix(ids, 6) % np.uint64(1_000_000)
    ).astype(np.int64)
    return pa.RecordBatch.from_arrays(
        [urls, pa.array(ts.astype("datetime64[us]")), htmls, texts, langs],
        names=["url", "warc_ts", "html", "text", "lang"],
    )


def extract_text_from_html(html: bytes) -> str:
    """The deterministic 'extraction' the invariant checks: body words."""
    s = html.decode("utf-8")
    start = s.index("<p>") + 3
    end = s.index("</p>")
    return s[start:end]


def webpages(spark: SparkSession, n_rows: int, partitions: int = 32) -> DataFrame:
    """Distributed deterministic web-page table of ``n_rows`` rows."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = np.asarray(batch.column(0))
            # bound per-output-batch size: huge docs make big batches
            step = 2048
            for i in range(0, len(ids), step):
                yield synth_batch(ids[i : i + step])

    return (
        spark.range(0, n_rows, numPartitions=partitions)
        .mapInArrow(gen, SCHEMA_DDL)
    )


def webpages_from_documents(
    spark: SparkSession, sf_dir: str, repeat_html: int = 1
) -> DataFrame:
    """Derive a web-page table from the driver's ``documents`` parquet.

    Keeps inputs tied to /root/testdata (per driver contract) while
    conforming to the BASELINE.json input_hint shape. ``text`` is carried
    verbatim from documents.text so the byte-identity invariant is
    anchored to driver data; url/warc_ts/html derive deterministically.
    """
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    html = F.concat(
        F.lit("<html><head><title>d"),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body><p>"),
        F.repeat(F.col("text"), repeat_html),
        F.lit("</p></body></html>"),
    )
    return docs.select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/"),
            F.col("lang"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.timestamp_micros(
            F.lit(_BASE_TS_US) + F.col("doc_id") * F.lit(37_000_000)
        ).alias("warc_ts"),
        F.encode(html, "utf-8").cast("binary").alias("html"),
        F.repeat(F.col("text"), repeat_html).alias("text"),
        F.col("lang"),
    )
