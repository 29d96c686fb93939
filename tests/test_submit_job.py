"""The ship-it surface: the real ``spark-submit --py-files`` artifact.

The north rule requires the job to run via spark-submit with the
package shipped as a zip (the analog of deploying to a multi-executor
cluster, where only the driver script and --py-files reach the
executors). This builds ``choetl_spark.zip`` with the repo tool, then
runs ``jobs/encode_job.py`` twice through an actual spark-submit
subprocess: the first run encodes, the second must resume from the
ledger and encode zero partitions.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_pyfiles_encode_and_resume(spark, tmp_path):
    src = str(tmp_path / "pages.parquet")
    out = str(tmp_path / "encoded")
    from choetl_spark.synth import webpages

    webpages(spark, 600, partitions=2).write.parquet(src)

    subprocess.run(
        ["sh", os.path.join(REPO, "tools", "make_pyfiles_zip.sh")],
        check=True, capture_output=True,
    )
    zip_path = os.path.join(REPO, "choetl_spark.zip")
    assert os.path.exists(zip_path)

    # env WITHOUT the repo on PYTHONPATH: executors must get the package
    # from --py-files alone, as they would on a real cluster
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    cmd = [
        "spark-submit", "--master", "local[2]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "encode_job.py"),
        "--input", src, "--output", out,
        "--partitions", "4", "--chunk-rows", "256",
        "--chunk-bytes", str(1 << 20),
    ]

    def run() -> dict:
        r = subprocess.run(
            cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True,
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        report = [l for l in r.stdout.splitlines() if l.startswith("{")]
        assert report, r.stdout[-2000:]
        return json.loads(report[-1])

    first = run()
    assert first["partitions_encoded_this_run"] == 4
    assert {c["column"] for c in first["columns"]} == {
        "url", "warc_ts", "html", "text", "lang"
    }
    assert all(c["encoded_bytes"] < c["raw_bytes"] for c in first["columns"]
               if c["raw_bytes"] > 1000)

    second = run()
    assert second["partitions_already_done"] == 4
    assert second["partitions_encoded_this_run"] == 0


def test_curate_job_pipeline(spark, tmp_path):
    """End-to-end curation pipeline (jobs/curate_job.py logic, in
    session): exact dedup kills planted copies, filters apply, PII is
    redacted in the curated store, and the encoded output decodes to
    exactly the filtered row set."""
    import importlib.util

    from pyspark.sql import functions as F

    spec = importlib.util.spec_from_file_location(
        "curate_job", os.path.join(REPO, "jobs", "curate_job.py")
    )
    curate_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(curate_job)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with_pii = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" contact bob@example.com")),
        ).otherwise(F.col("text")),
    )
    planted = with_pii.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    src = str(tmp_path / "docs_in.parquet")
    with_pii.unionByName(planted).write.parquet(src)
    out = str(tmp_path / "curated")

    args = curate_job.build_parser().parse_args([
        "--input", src, "--output", out, "--min-quality", "0.1",
        "--max-dup-2gram", "0.95", "--near-dedup",
        "--minhash-hashes", "32", "--minhash-bands", "8",
        "--minhash-threshold", "0.9", "--partitions", "4",
        "--chunk-rows", "256", "--chunk-bytes", str(1 << 20),
    ])
    result = curate_job.curate(spark, args)
    c = result["counts"]
    n_planted = planted.count()
    assert c["after_exact_dedup"] == c["input"] - n_planted
    assert c["after_near_dedup"] <= c["after_exact_dedup"]
    assert 0 < c["after_filters"] <= c["after_near_dedup"]

    from choetl_spark.engine import decode_dataframe
    from choetl_spark.ledger import read_encoded, read_manifest

    decoded = decode_dataframe(
        read_encoded(spark, out), manifest=read_manifest(out)
    )
    assert decoded.count() == c["after_filters"]
    assert decoded.filter(F.col("text").contains("@example.com")).count() == 0
    assert decoded.filter(F.col("text").contains("<EMAIL>")).count() > 0


def test_curate_job_full_web_stages(spark, tmp_path):
    """The full web-curation variant: line-level boilerplate removal,
    benchmark decontamination, and token-budget shard assignment all
    active. Boilerplate header/footer lines vanish from the curated
    text, decontaminated docs are dropped, and every surviving row
    carries a (writer, shard) assignment."""
    import importlib.util

    from pyspark.sql import functions as F

    spec = importlib.util.spec_from_file_location(
        "curate_job", os.path.join(REPO, "jobs", "curate_job.py")
    )
    curate_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(curate_job)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    boiler = docs.withColumn(
        "text",
        F.concat_ws(
            "\n", F.lit("COOKIE BANNER"), F.col("text"), F.lit("FOOTER")
        ),
    )
    src = str(tmp_path / "docs_in.parquet")
    boiler.write.parquet(src)
    # eval set: prefixes of every 9th doc -> those docs get dropped
    evals = docs.filter(F.col("doc_id") % 9 == 0).select(
        F.concat_ws(
            " ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 12)
        ).alias("text")
    )
    eval_p = str(tmp_path / "evals.parquet")
    evals.write.parquet(eval_p)
    out = str(tmp_path / "curated")

    args = curate_job.build_parser().parse_args([
        "--input", src, "--output", out, "--min-quality", "0.0",
        "--max-dup-2gram", "1.0", "--dedup-lines-max-docs", "5",
        "--decontaminate", eval_p, "--shard-budget", "1000",
        "--shard-writers", "4", "--partitions", "4",
        "--chunk-rows", "256", "--chunk-bytes", str(1 << 20),
    ])
    result = curate_job.curate(spark, args)
    c = result["counts"]
    assert c["after_line_dedup"] <= c["after_exact_dedup"]
    assert c["after_decontaminate"] < c["after_filters"]  # eval docs dropped

    from choetl_spark.engine import decode_dataframe
    from choetl_spark.ledger import read_encoded, read_manifest

    decoded = decode_dataframe(
        read_encoded(spark, out), manifest=read_manifest(out)
    )
    rows = decoded.collect()
    assert len(rows) == c["after_decontaminate"]
    for r in rows[:50]:
        assert "COOKIE BANNER" not in r["text"] and "FOOTER" not in r["text"]
    assert all(r["writer"] is not None and r["shard"] is not None
               for r in rows[:50])


def test_curate_job_sampling_stages(spark, tmp_path):
    """The ingestion/sampling variant: incremental dedup against a
    prior store drops exactly the planted already-seen docs, the
    per-domain quota holds, mixture sampling keeps per-source subsets,
    and every curated row carries a deterministic split assignment."""
    import importlib.util

    from pyspark.sql import functions as F

    spec = importlib.util.spec_from_file_location(
        "curate_job", os.path.join(REPO, "jobs", "curate_job.py")
    )
    curate_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(curate_job)

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).withColumn(
        "url",
        F.concat(
            F.lit("https://h"), F.col("doc_id") % 5,
            F.lit(".example.com/p/"), F.col("doc_id"),
        ),
    )
    src = str(tmp_path / "docs_in.parquet")
    docs.write.parquet(src)
    # prior store: every 4th doc, whitespace-mangled (normalized-equal)
    store = docs.filter(F.col("doc_id") % 4 == 0).select(
        F.concat(F.lit(" "), F.regexp_replace("text", " ", "  ")).alias(
            "text"
        )
    )
    store_p = str(tmp_path / "store.parquet")
    store.write.parquet(store_p)
    out = str(tmp_path / "curated")

    args = curate_job.build_parser().parse_args([
        "--input", src, "--output", out, "--min-quality", "0.0",
        "--max-dup-2gram", "1.0", "--dedup-against", store_p,
        "--max-per-domain", "60", "--mixture", "src0=1.0,src1=0.5",
        "--mixture-default", "0.25", "--val-frac", "0.1",
        "--test-frac", "0.1", "--partitions", "4",
        "--chunk-rows", "256", "--chunk-bytes", str(1 << 20),
    ])
    result = curate_job.curate(spark, args)
    c = result["counts"]
    n_seen = docs.filter(F.col("doc_id") % 4 == 0).count()
    assert c["after_dedup_against"] == c["after_exact_dedup"] - n_seen
    assert c["after_domain_cap"] <= min(c["after_filters"], 5 * 60)
    assert c["after_mixture"] < c["after_domain_cap"]

    from choetl_spark.engine import decode_dataframe
    from choetl_spark.ledger import read_encoded, read_manifest

    decoded = decode_dataframe(
        read_encoded(spark, out), manifest=read_manifest(out)
    )
    rows = decoded.collect()
    assert len(rows) == c["after_mixture"] > 0
    # every survivor satisfies the mixture bucket rule and carries the
    # exactly-expected deterministic split (recomputed in pure Python)
    MOD, KNUTH = 1000003, 2654435761
    rates = {"src0": 1.0, "src1": 0.5}

    def bucket(i: int, seed: int) -> int:
        return ((i % MOD) * KNUTH + seed) % MOD

    for r in rows:
        assert bucket(r["doc_id"], 0) < rates.get(r["source"], 0.25) * MOD
        b = bucket(r["doc_id"], 17)
        expect = (
            "val" if b < 0.1 * MOD
            else "test" if b < 0.2 * MOD
            else "train"
        )
        assert r["split"] == expect, (r["doc_id"], r["split"], expect)


def test_curate_job_ppl_and_bpe_stages(spark, tmp_path):
    """The LM-perplexity band filter and the BPE tokenizer stage: the
    band drops the planted gibberish doc, shard budgets count BPE
    tokens, and the trained merge table ships as a sidecar the output
    can re-apply."""
    import importlib.util
    import json

    from pyspark.sql import functions as F

    spec = importlib.util.spec_from_file_location(
        "curate_job", os.path.join(REPO, "jobs", "curate_job.py")
    )
    curate_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(curate_job)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # a 1-token doc carries NULL perplexity (no bigram evidence) and is
    # deterministically dropped by any band — the stage's no-evidence
    # rule, independent of the corpus's ppl distribution
    stub = docs.limit(1).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.lit("x").alias("text"),
        F.col("lang"), F.col("source"), F.lit(1).cast("long").alias("n_chars"),
    )
    src = str(tmp_path / "docs_in.parquet")
    docs.unionByName(stub).write.parquet(src)
    out = str(tmp_path / "curated")

    args = curate_job.build_parser().parse_args([
        "--input", src, "--output", out, "--min-quality", "0.0",
        "--max-dup-2gram", "1.0", "--ppl-band", "0.001,1000000",
        "--bpe-merges", "6", "--shard-budget", "2000",
        "--shard-writers", "4", "--partitions", "4",
        "--chunk-rows", "256", "--chunk-bytes", str(1 << 20),
    ])
    result = curate_job.curate(spark, args)
    c = result["counts"]
    # exactly the no-evidence stub is cut; every real doc's ppl lies in
    # the wide band
    assert c["after_ppl_filter"] == c["after_filters"] - 1
    assert c["after_ppl_filter"] > 0

    merges = json.load(open(os.path.join(out, "_bpe_merges.json")))
    assert len(merges) == 6 and all(len(m) == 2 for m in merges)

    from choetl_spark.engine import decode_dataframe
    from choetl_spark.ledger import read_encoded, read_manifest
    from choetl_spark.operators.bpe import with_bpe_tokens_fast

    decoded = decode_dataframe(
        read_encoded(spark, out), manifest=read_manifest(out)
    )
    assert decoded.count() == c["after_ppl_filter"]
    assert {"writer", "shard"} <= set(decoded.columns)
    assert decoded.filter(F.col("doc_id") >= 2000000).count() == 0
    # the sidecar re-applies on the curated store
    toks = with_bpe_tokens_fast(
        decoded.limit(5), [tuple(m) for m in merges]
    ).collect()
    assert all(r["n_bpe_tokens"] > 0 for r in toks)


def test_analyze_job_metadata_report(spark, tmp_path, capsys):
    """analyze_job: partition rollups + approx NDV + approx quantiles
    from chunk metadata only, honest 'unavailable' for sketch-less
    columns. Direct main() call (the spark-submit plumbing is already
    proven by the encode-job test)."""
    import json as _json

    from choetl_spark.engine import EncodeConfig
    from choetl_spark.ledger import encode_with_resume
    from choetl_spark.synth import webpages

    sys.path.insert(0, os.path.join(REPO, "jobs"))
    import analyze_job

    out = str(tmp_path / "astore")
    pages = webpages(spark, 1_000, partitions=2)
    encode_with_resume(
        spark, pages, out,
        EncodeConfig(
            num_partitions=2, chunk_rows=256,
            ndv_columns=("lang",), quantile_columns=("warc_ts",),
        ),
        run_id="a1",
    )
    rep_path = str(tmp_path / "stats.json")
    rc = analyze_job.main([
        "--store", out, "--ndv", "lang,url", "--quantiles", "warc_ts",
        "--probs", "0.5", "--report", rep_path,
    ])
    assert rc == 0
    rep = _json.loads(open(rep_path).read())
    assert rep["partitions"]["live_rows"] == 1000
    assert rep["partitions"]["n_partitions"] == 2
    # url has no sketches -> the whole ndv block reports unavailable
    # (approx_ndv refuses partial estimates); lang-only asks succeed
    assert "unavailable" in rep["ndv"]
    rc2 = analyze_job.main(["--store", out, "--ndv", "lang"])
    captured = capsys.readouterr().out.strip().splitlines()[-1]
    rep2 = _json.loads(captured)
    n_langs = pages.select("lang").distinct().count()
    assert rc2 == 0 and abs(rep2["ndv"]["lang"] - n_langs) <= 1
    med = rep["quantiles"]["warc_ts"]["0.5"]
    import pyspark.sql.functions as F

    exact = pages.agg(
        F.expr("percentile(cast(warc_ts as long), 0.5)")
    ).collect()[0][0]
    assert abs(med - float(exact) * 1e6) < 86400 * 370 * 1e6 * 0.05


def test_curate_job_chunking_stage(spark, tmp_path):
    """--chunk-tokens: curated docs become overlapping context windows
    with chunk-unique ids, parent lineage, and inherited split; the
    encoded store holds exactly the chunk rows."""
    import pyspark.sql.functions as F

    from choetl_spark.engine import decode_dataframe
    from choetl_spark.ledger import read_encoded

    sys.path.insert(0, os.path.join(REPO, "jobs"))
    import curate_job

    src = str(tmp_path / "docs.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "curated_chunks")
    args = curate_job.build_parser().parse_args([
        "--input", src, "--output", out,
        "--min-quality", "0.0", "--max-dup-2gram", "1.0",
        "--val-frac", "0.1",
        "--chunk-tokens", "32", "--chunk-overlap", "8",
        "--partitions", "4", "--shuffle", "none",
    ])
    rep = curate_job.curate(spark, args)
    counts = rep["counts"]
    assert counts["after_chunking"] >= counts["after_filters"]

    dec = decode_dataframe(read_encoded(spark, out))
    assert dec.count() == counts["after_chunking"]
    # chunk ids unique; every chunk ≤32 whitespace tokens; parent
    # lineage intact; all chunks of a doc share its split
    assert dec.select("doc_id").distinct().count() == dec.count()
    toks = dec.select(
        F.size(F.filter(F.split("text", r"\s+"), lambda t: t != ""))
        .alias("n")
    )
    assert toks.filter(F.col("n") > 32).count() == 0
    assert toks.filter(F.col("n") < 1).count() == 0
    per_parent = dec.groupBy("parent_doc_id").agg(
        F.countDistinct("split").alias("nsplits")
    )
    assert per_parent.filter(F.col("nsplits") > 1).count() == 0


def test_diagnose_skew_report(spark):
    import pyspark.sql.functions as F

    from choetl_spark.partitioning import diagnose_skew

    # 10k rows on one key + 100 spread keys
    df = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit("hot.example.com"))
        .otherwise(F.concat(F.lit("h"), (F.col("id") % 100).cast("string")))
        .alias("host")
    )
    rep = diagnose_skew(df, "host", num_partitions=16)
    assert rep["total_rows"] == 10_000 and rep["skewed"]
    assert rep["top"][0]["key"] == {"host": "hot.example.com"}
    assert abs(rep["top"][0]["share"] - 0.9) < 0.01
    # salting the hot key across the recommended buckets brings its
    # per-bucket share back under the hot threshold
    assert 9_000 / rep["recommended_salt_buckets"] <= rep[
        "hot_threshold_rows"
    ]
    flat = diagnose_skew(
        spark.range(1_000).select((F.col("id") % 500).alias("k")),
        "k", num_partitions=8,
    )
    assert not flat["skewed"] and flat["recommended_salt_buckets"] == 1


def test_export_job_pruned_slice(spark, tmp_path):
    """export_job: a lang-filtered, column-pruned export of the encoded
    store round-trips exactly the matching rows to plain parquet (and a
    TSV export writes readable lines)."""
    import pyspark.sql.functions as F

    from choetl_spark.engine import EncodeConfig
    from choetl_spark.ledger import encode_with_resume
    from choetl_spark.synth import webpages

    sys.path.insert(0, os.path.join(REPO, "jobs"))
    import export_job

    store = str(tmp_path / "estore")
    pages = webpages(spark, 800, partitions=2).cache()
    encode_with_resume(
        spark, pages, store,
        EncodeConfig(num_partitions=2, chunk_rows=256,
                     bloom_columns=("lang",)),
        run_id="e1",
    )
    out = str(tmp_path / "export_pq")
    rc = export_job.main([
        "--store", store, "--output", out, "--format", "parquet",
        "--columns", "url,lang", "--equals", "lang=en",
    ])
    assert rc == 0
    got = spark.read.parquet(out)
    assert set(got.columns) == {"url", "lang"}
    want = pages.filter(F.col("lang") == "en").select("url", "lang")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    tsv_out = str(tmp_path / "export_tsv")
    rc = export_job.main([
        "--store", store, "--output", tsv_out, "--format", "tsv",
        "--columns", "url,lang", "--equals", "lang=de",
        "--repartition", "1",
    ])
    assert rc == 0
    lines = spark.read.text(tsv_out).collect()
    n_de = pages.filter(F.col("lang") == "de").count()
    assert len(lines) == n_de + 1  # header
    assert "\t" in lines[0]["value"]


def test_export_job_timestamp_range_coercion(spark, tmp_path):
    """--range on a timestamp column coerces CLI strings to datetimes so
    zone-map pruning + kernel pushdown engage (not just the residual
    filter), and exports exactly the slice."""
    import pyspark.sql.functions as F

    from choetl_spark.engine import EncodeConfig
    from choetl_spark.ledger import encode_with_resume
    from choetl_spark.synth import webpages

    sys.path.insert(0, os.path.join(REPO, "jobs"))
    import export_job

    store = str(tmp_path / "tstore")
    pages = webpages(spark, 600, partitions=2).cache()
    encode_with_resume(
        spark, pages, store,
        EncodeConfig(num_partitions=2, chunk_rows=128),
        run_id="t1",
    )
    lo, hi = "2023-07-22T04:50:00", "2023-07-22T05:30:00"
    out = str(tmp_path / "slice_pq")
    rc = export_job.main([
        "--store", store, "--output", out, "--format", "parquet",
        "--columns", "url,warc_ts", "--range", f"warc_ts={lo},{hi}",
    ])
    assert rc == 0
    import datetime as dt

    got = spark.read.parquet(out)
    want = pages.filter(
        (F.col("warc_ts") >= dt.datetime.fromisoformat(lo))
        & (F.col("warc_ts") <= dt.datetime.fromisoformat(hi))
    ).select("url", "warc_ts")
    assert got.count() == want.count() and want.count() > 0
    assert got.exceptAll(want).count() == 0


def test_linkgraph_job_pipeline(spark, tmp_path):
    """End-to-end link-graph job (jobs/linkgraph_job.py logic, in
    session): planted ring+chord links -> hashed edges -> PageRank ->
    per-url scores in the encoded store; rank mass conserved, frontier
    (non-crawled) targets flagged is_page=false, store decodes to the
    score table."""
    import importlib.util

    from pyspark.sql import functions as F

    spec = importlib.util.spec_from_file_location(
        "linkgraph_job", os.path.join(REPO, "jobs", "linkgraph_job.py")
    )
    lg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lg)

    n = 40
    rows = []
    for i in range(n):
        html = (
            f'<a href="https://h{(i + 1) % n}.example.org/p">n</a>'
            f"<a href='https://h{(i * 7 + 3) % n}.example.org/p'>c</a>"
            '<a href="https://frontier.example.net/only-linked">ext</a>'
            '<a href="/rel#frag">rel</a>'
        )
        rows.append((f"https://h{i}.example.org/p", html.encode()))
    src = str(tmp_path / "pages.parquet")
    spark.createDataFrame(rows, "url string, html binary").write.parquet(src)
    out = str(tmp_path / "linkrank")

    args = lg.build_parser().parse_args([
        "--input", src, "--output", out, "--n-iter", "5", "--hits",
        "--hits-iter", "3", "--partitions", "4",
        "--chunk-rows", "256", "--chunk-bytes", str(1 << 20),
    ])
    result = lg.run(spark, args)
    c = result["counts"]
    assert c["pages"] == n
    # ring + chord + external; /rel resolves to an absolute url per page
    assert c["nodes"] == n + 1 + n  # pages + frontier + per-page /rel
    assert abs(c["rank_mass"] - 1.0) < 1e-9

    from choetl_spark.engine import decode_dataframe
    from choetl_spark.ledger import read_encoded, read_manifest

    decoded = decode_dataframe(
        read_encoded(spark, out), manifest=read_manifest(out)
    )
    got = {r.url: r for r in decoded.collect()}
    assert len(got) == c["nodes"]
    frontier = got["https://frontier.example.net/only-linked"]
    assert frontier.is_page is False
    assert frontier.rank > 0  # everyone links it: real rank
    assert frontier.hub == 0.0  # no outlinks: never a hub
    # crawled pages are flagged and hold the ring's uniform-ish rank
    page0 = got["https://h0.example.org/p"]
    assert page0.is_page is True and page0.rank > 0


def test_curate_job_dsir_stage(spark, tmp_path):
    """--dsir-target keeps the approx top fraction of docs by
    target-likeness: with target = the 'en' slice, the surviving set
    must be en-enriched relative to the input pool, and the count
    respects the requested fraction (quantile tolerance)."""
    import importlib.util

    from pyspark.sql import functions as F

    spec = importlib.util.spec_from_file_location(
        "curate_job", os.path.join(REPO, "jobs", "curate_job.py")
    )
    curate_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(curate_job)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "docs_in.parquet")
    docs.write.parquet(src)
    target_p = str(tmp_path / "target.parquet")
    docs.filter(F.col("lang") == "en").write.parquet(target_p)
    out = str(tmp_path / "curated_dsir")

    args = curate_job.build_parser().parse_args([
        "--input", src, "--output", out, "--min-quality", "0.0",
        "--max-dup-2gram", "1.0", "--dsir-target", target_p,
        "--dsir-frac", "0.5", "--dsir-buckets", "512",
        "--partitions", "4", "--chunk-rows", "256",
        "--chunk-bytes", str(1 << 20),
    ])
    result = curate_job.curate(spark, args)
    c = result["counts"]
    pool = c["after_filters"]
    kept = c["after_dsir"]
    assert 0 < kept <= pool
    assert abs(kept - 0.5 * pool) <= 0.15 * pool  # quantile tolerance

    from choetl_spark.engine import decode_dataframe
    from choetl_spark.ledger import read_encoded, read_manifest

    decoded = decode_dataframe(
        read_encoded(spark, out), manifest=read_manifest(out)
    )
    en_in = docs.filter(F.col("lang") == "en").count() / docs.count()
    en_out = (
        decoded.filter(F.col("lang") == "en").count() / decoded.count()
    )
    assert en_out > en_in  # the kept set is target(en)-enriched
