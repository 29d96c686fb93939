"""Chunk-stats predicate skipping (engine analog of row-group stats)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from choetl_spark.engine import (
    EncodeConfig,
    decode_dataframe,
    encode_dataframe,
    prune_partitions_by_stats,
)
from choetl_spark.synth import webpages


@pytest.fixture(scope="module")
def enc(spark):
    pages = webpages(spark, 1500, partitions=4)
    cfg = EncodeConfig(num_partitions=6, chunk_rows=128, chunk_bytes=1 << 20)
    e = encode_dataframe(pages, cfg).cache()
    e.count()
    return e


def test_prune_keeps_matching_rows(spark, enc):
    full = decode_dataframe(enc, columns=["url", "warc_ts"]).cache()
    lo_ts = full.agg(F.min("warc_ts")).collect()[0][0]
    lo = int(lo_ts.timestamp() * 1_000_000)
    pruned = prune_partitions_by_stats(enc, "warc_ts", lo, lo + 10**9)
    assert pruned.select("part_id").distinct().count() <= enc.select(
        "part_id"
    ).distinct().count()
    # every row in the target range survives pruning
    dec = decode_dataframe(pruned, columns=["url", "warc_ts"])
    want = full.filter(
        F.col("warc_ts").cast("long") * 1_000_000 <= lo + 10**9
    ).count()
    got = dec.filter(
        F.col("warc_ts").cast("long") * 1_000_000 <= lo + 10**9
    ).count()
    assert got == want


def test_prune_drops_out_of_range(spark, enc):
    pruned = prune_partitions_by_stats(enc, "warc_ts", 0, 1)  # epoch ~1970
    assert pruned.count() == 0


def test_prune_string_zone_map(spark, enc):
    """String predicates prune on the 64-char min_str/max_str zone map:
    a url-range query keeps every matching row, an impossible range
    drops everything, and a truncated max never causes a false skip."""
    full = decode_dataframe(enc, columns=["url"]).cache()
    lo, hi = "https://www.host0", "https://www.host1￿"
    pruned = prune_partitions_by_stats(enc, "url", lo, hi)
    dec = decode_dataframe(pruned, columns=["url"])
    in_range = (F.col("url") >= lo) & (F.col("url") <= hi)
    assert dec.filter(in_range).count() == full.filter(in_range).count()
    # impossible range: nothing sorts above "~" (0x7E) in these urls
    assert prune_partitions_by_stats(enc, "url", "~~~", "~~~~").count() == 0


def test_prune_string_truncated_max_is_unbounded(spark):
    """A >64-char max is stored truncated + flagged; a predicate above
    the truncated prefix must still KEEP the partition (the full value
    may match even though its prefix sorts below lo)."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(k=i, s="prefix-" + "x" * 100 + f"-{i}") for i in range(64)]
    ).repartition(2)
    cfg = EncodeConfig(shuffle="none", key_col="k")
    e = encode_dataframe(df, cfg)
    # lo sorts ABOVE the 64-char truncated prefix but BELOW the full
    # values — a pruner trusting the truncated max would false-skip
    lo = "prefix-" + "x" * 57 + "y"
    assert prune_partitions_by_stats(e, "s", lo, "q").count() > 0


def test_prune_string_missing_zone_map_keeps_partitions(spark, enc):
    """Stores encoded before the string zone map existed have no
    min_str/max_str in their stats JSON — pruning must KEEP those
    partitions (it is an optimization), not null-filter them away."""
    legacy = enc.withColumn(
        "stats", F.lit('{"min_val": null, "max_val": null}')
    )
    pruned = prune_partitions_by_stats(legacy, "url", "a", "b")
    assert (
        pruned.select("part_id").distinct().count()
        == enc.select("part_id").distinct().count()
    )


def test_bloom_point_lookup_pruning(spark):
    """Opt-in per-chunk Blooms prune equality probes the zone map
    can't: a present url keeps (at least) its own partition and the
    decoded result still contains it; an absent url prunes most
    partitions; legacy stats without blooms keep everything."""
    from choetl_spark.engine import prune_partitions_by_bloom
    from choetl_spark.synth import webpages

    pages = webpages(spark, 1200, partitions=5)
    cfg = EncodeConfig(
        num_partitions=6, chunk_rows=128, bloom_columns=("url",)
    )
    e = encode_dataframe(pages, cfg).cache()
    n_parts = e.select("part_id").distinct().count()
    target = pages.select("url").limit(1).collect()[0][0]

    hit = prune_partitions_by_bloom(e, "url", target)
    dec = decode_dataframe(hit, columns=["url"])
    assert dec.filter(F.col("url") == target).count() == 1

    miss = prune_partitions_by_bloom(
        e, "url", "https://definitely.absent.example/nope"
    )
    assert miss.select("part_id").distinct().count() < n_parts

    legacy = e.withColumn("stats", F.lit('{"min_val": null}'))
    kept = prune_partitions_by_bloom(legacy, "url", "anything")
    assert kept.select("part_id").distinct().count() == n_parts


def test_bloom_probe_rejects_non_string_value(spark, enc):
    """A non-str/bytes probe must never silently hash garbage
    (bytes(123) is 123 NUL bytes — the bloom would rule the value out of
    every chunk and over-SKIP, dropping rows the residual filter's cast
    semantics would have matched). The raw hash raises; the pruning
    entry point SKIPS pruning instead (equals on an int/timestamp
    column stays a kernel-pushdown + residual predicate)."""
    from choetl_spark.bloom import _hash_value, bloom_maybe_contains
    from choetl_spark.engine import prune_partitions_by_bloom

    for bad in (123, 1.5, None, ["x"]):
        with pytest.raises(TypeError, match="str or bytes"):
            _hash_value(bad)
    n_parts = enc.select("part_id").distinct().count()
    for bad in (123, 1.5, None, [123]):
        kept = prune_partitions_by_bloom(enc, "url", bad)
        assert kept.select("part_id").distinct().count() == n_parts
    # bytes-like probes are fine; a LIST of str/bytes is a batch probe
    assert bloom_maybe_contains(None, b"abc") is True
    assert _hash_value(bytearray(b"abc")) == _hash_value(b"abc")
    assert prune_partitions_by_bloom(enc, "url", ["a", "b"]) is not None


def test_prune_timestamp_date_bounds_use_manifest_dtype(spark, tmp_path):
    """datetime.date bounds against a TIMESTAMP column must convert to
    micros, not days — days-vs-micros used to prune away every
    partition (silent empty result). scan_encoded passes the manifest
    dtype; a bare date bound without the hint raises instead of
    guessing the zone-map unit."""
    import datetime as dt

    from choetl_spark.ledger import encode_with_resume, scan_encoded
    from choetl_spark.synth import webpages

    pages = webpages(spark, 400, partitions=2)
    out = str(tmp_path / "store_dates")
    encode_with_resume(
        spark, pages, out, EncodeConfig(num_partitions=2, shuffle="none")
    )
    lo_ts, hi_ts = pages.agg(
        F.min("warc_ts"), F.max("warc_ts")
    ).collect()[0]
    lo_d, hi_d = lo_ts.date(), hi_ts.date() + dt.timedelta(days=1)
    got = scan_encoded(
        spark, out, ["url"], ranges={"warc_ts": (lo_d, hi_d)}
    ).count()
    # Spark casts date bounds to midnight timestamps in the residual
    # filter; the full range must keep every row
    want = pages.filter(
        (F.col("warc_ts") >= F.lit(lo_d)) & (F.col("warc_ts") <= F.lit(hi_d))
    ).count()
    assert got == want == pages.count()
    # datetime bounds (the pre-existing path) still work unchanged
    assert scan_encoded(
        spark, out, ["url"],
        ranges={"warc_ts": (lo_ts, hi_ts)},
    ).count() == pages.count()
    # no dtype hint + date bound = ambiguous zone-map unit -> raise
    with pytest.raises(TypeError, match="zone-map unit"):
        prune_partitions_by_stats(
            spark.read.parquet(out + "/chunks"), "warc_ts", lo_d, hi_d
        )


def test_bloom_jvm_probe_matches_python_reference(spark):
    """The codegen'd SQL probe (substring/hex/conv/shiftright over the
    base64 words) must agree bit-for-bit with bloom_maybe_contains for
    present, absent, unicode, and empty probe values."""
    import json

    from choetl_spark.bloom import bloom_maybe_contains
    from choetl_spark.engine import prune_partitions_by_bloom
    from choetl_spark.synth import webpages

    pages = webpages(spark, 600, partitions=3)
    cfg = EncodeConfig(
        num_partitions=4, chunk_rows=64, bloom_columns=("url",)
    )
    e = encode_dataframe(pages, cfg).cache()
    meta = [
        (r["part_id"], json.loads(r["stats"]).get("bloom"))
        for r in e.filter(F.col("column") == "url")
        .select("part_id", "stats")
        .collect()
    ]
    probes = [
        pages.select("url").limit(1).collect()[0][0],
        "https://absent.example/none",
        "日本語/パス?q=1",
        "",
    ]
    for value in probes:
        want = sorted(
            {p for p, bl in meta if bloom_maybe_contains(bl, value)}
        )
        got = sorted(
            r["part_id"]
            for r in prune_partitions_by_bloom(e, "url", value)
            .select("part_id")
            .distinct()
            .collect()
        )
        assert got == want, (value, got, want)
