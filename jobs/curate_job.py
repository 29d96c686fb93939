"""spark-submit entry point for the web-text CURATION pipeline.

    spark-submit --py-files choetl_spark.zip jobs/curate_job.py \
        --input  /path/to/documents.parquet \
        --output /path/to/curated            (encoded chunks + ledger) \
        [--id-col doc_id --text-col text] \
        [--min-quality 0.3] [--max-dup-2gram 0.9] [--langs en,de] \
        [--near-dedup] [--profile speed] [--partitions 256]

The standard training-data sequence, every stage a scale-shaped
operator from ``choetl_spark.operators``:

    exact dedup (normalized fingerprint, keep lowest id)
      -> optional incremental dedup against a prior store
         (--dedup-against PATH: anti-join on normalized fingerprints,
         the batch-vs-store step of a continuously-ingesting pipeline)
      -> optional line-level boilerplate removal (--dedup-lines-max-docs:
         lines shared by more docs than the threshold are stripped,
         RefinedWeb-style)
      -> optional MinHash-LSH near-dedup (banded candidates ->
         connected components -> keep component min)
      -> quality floor + Gopher repetition ceiling + optional lang-ID
         allowlist (all JVM codegen expressions)
      -> optional per-domain page quota (--max-per-domain K: keep the K
         highest-quality pages per registered domain; needs --url-col)
      -> optional benchmark decontamination (--decontaminate PATH: drop
         docs sharing any 8-word gram with the eval parquet)
      -> optional deterministic mixture sampling (--mixture
         "web=0.3,wiki=1.0" over --source-col: per-source keep rates by
         id hash, reproducible across reruns/resume)
      -> PII redaction (emails/phones/IPs/cards -> tokens)
      -> optional train/val/test split column (--val-frac/--test-frac:
         hash-based, documents never migrate as the corpus grows)
      -> optional context-window chunking (--chunk-tokens N
         [--chunk-overlap K]: docs become overlapping N-token windows;
         id_col is rewritten chunk-unique, parent_doc_id keeps the doc;
         chunks inherit their doc's split so train/val never share a
         source document)
      -> optional token-budget shard assignment (--shard-budget: adds
         writer/shard columns via per-writer next-fit packing)
      -> resumable encode into the engine's chunk store (ledger commit,
         re-running the same command after a crash skips completed
         partitions)

Prints ONE JSON line of per-stage row counts so the drop rate of every
filter is observable (the curation analog of the reference writer's
RowsWritten notification hooks).
"""

from __future__ import annotations

import argparse
import json
import sys


def curate(spark, args) -> dict:
    from pyspark.sql import functions as F

    from choetl_spark.engine import EncodeConfig
    from choetl_spark.ledger import encode_with_resume
    from choetl_spark.operators import (
        cap_per_domain,
        decontaminate,
        dedup_against,
        dedup_exact_normalized,
        dedup_lines,
        dedup_minhash,
        pack_shards,
        sample_mixture,
        with_lang_id,
        with_pii_redacted,
        with_quality_score,
        with_repetition_stats,
        with_split,
    )

    id_col, text_col = args.id_col, args.text_col
    df = spark.read.parquet(args.input)
    counts = {"input": df.count()}

    df = dedup_exact_normalized(df, text_col, id_col)
    counts["after_exact_dedup"] = df.count()

    if args.dedup_against:
        reference = spark.read.parquet(args.dedup_against)
        df = dedup_against(df, reference, text_col)
        counts["after_dedup_against"] = df.count()

    if args.dedup_lines_max_docs:
        cleaned = dedup_lines(
            df, id_col, text_col, max_docs=args.dedup_lines_max_docs
        ).select(id_col, "text_clean")
        df = (
            df.drop(text_col)
            .join(cleaned, id_col)
            .withColumnRenamed("text_clean", text_col)
            .filter(F.length(F.col(text_col)) > 0)
        )
        counts["after_line_dedup"] = df.count()

    if args.near_dedup:
        df = dedup_minhash(
            df, text_col, id_col,
            n_hashes=args.minhash_hashes, bands=args.minhash_bands,
            threshold=args.minhash_threshold,
        )
        counts["after_near_dedup"] = df.count()

    df = with_quality_score(df, text_col)
    df = with_repetition_stats(df, text_col)
    df = df.filter(
        (F.col("quality") >= args.min_quality)
        & (F.col("dup_2gram_frac") <= args.max_dup_2gram)
    )
    if args.langs:
        allowed = [s.strip() for s in args.langs.split(",") if s.strip()]
        df = with_lang_id(df, text_col).filter(
            F.col("lang_pred").isin(allowed)
        )
    counts["after_filters"] = df.count()

    if args.ppl_band:
        # CCNet-style LM-perplexity band: self-train the bigram LM on
        # the surviving corpus and cut BOTH tails (low = boilerplate
        # soup memorized verbatim, high = gibberish/wrong-language).
        # Docs with <2 tokens carry NULL ppl and are dropped with the
        # tails (no evidence of fluency).
        from choetl_spark.operators import with_lm_perplexity

        lo, hi = (float(x) for x in args.ppl_band.split(","))
        scored = with_lm_perplexity(
            df.select(id_col, text_col), text_col, id_col
        ).select(id_col, "ppl")
        df = (
            df.join(scored, id_col)
            .filter(
                F.col("ppl").isNotNull()
                & (F.col("ppl") >= lo)
                & (F.col("ppl") <= hi)
            )
            .drop("ppl")
        )
        counts["after_ppl_filter"] = df.count()

    if args.max_per_domain:
        # quality is still a live column here — use it as the keep
        # preference so the quota retains each domain's best pages
        df = cap_per_domain(
            df, k=args.max_per_domain, url_col=args.url_col,
            id_col=id_col, order_col="quality",
        ).drop("registered_domain")
        counts["after_domain_cap"] = df.count()

    if args.decontaminate:
        evals = spark.read.parquet(args.decontaminate)
        df = decontaminate(
            df, evals, id_col, text_col, eval_text_col=text_col
        ).filter(~F.col("contaminated")).drop("n_matched", "contaminated")
        counts["after_decontaminate"] = df.count()

    if args.dsir_target:
        # DSIR importance weighting (Xie et al. NeurIPS 2023): score
        # every surviving doc by how target-like its hashed-n-gram
        # distribution is and keep the top --dsir-frac fraction via an
        # approx-quantile weight threshold (scale-safe: no global sort,
        # no driver-side top-k of millions of rows).
        from choetl_spark.operators import dsir_model, dsir_weights

        target = spark.read.parquet(args.dsir_target)
        model = dsir_model(
            target, df, text_col=text_col,
            buckets=args.dsir_buckets, id_col=id_col,
        )
        df = dsir_weights(
            df, model, text_col=text_col, id_col=id_col,
            buckets=args.dsir_buckets,
        )
        qs = df.approxQuantile(
            "log_weight", [1.0 - args.dsir_frac], 0.001
        )
        # approxQuantile returns [] on an empty frame (everything
        # culled by the earlier dedup/decontaminate stages) — there is
        # nothing to rank, so skip the threshold filter instead of
        # crashing on qs[0]
        if qs:
            df = df.filter(F.col("log_weight") >= qs[0])
        df = df.drop("log_weight")
        counts["after_dsir"] = df.count()

    if args.mixture:
        rates = {}
        for part in args.mixture.split(","):
            part = part.strip()
            if not part:
                continue  # tolerate trailing/double commas
            src, eq, rate = part.partition("=")
            # strip around '=' too: 'web = 0.3' must key as 'web', not
            # 'web ' (a silently-never-matching source gets default_rate)
            src, rate = src.strip(), rate.strip()
            if not eq or not src:
                raise SystemExit(
                    f"--mixture: expected 'source=rate', got {part!r}"
                )
            try:
                rates[src] = float(rate)
            except ValueError:
                raise SystemExit(
                    f"--mixture: bad rate for {src!r}: {rate!r}"
                ) from None
        df = sample_mixture(
            df, rates, source_col=args.source_col, id_col=id_col,
            default_rate=args.mixture_default,
        )
        counts["after_mixture"] = df.count()

    input_cols = spark.read.parquet(args.input).columns  # metadata only
    df = with_pii_redacted(df, text_col)
    # the redacted text REPLACES the raw text in the curated store
    df = df.withColumn(text_col, F.col("redacted")).select(*input_cols)

    if args.val_frac or args.test_frac:
        df = with_split(
            df, id_col, val_frac=args.val_frac, test_frac=args.test_frac
        )

    if args.chunk_tokens:
        # context-window chunking: each doc becomes ceil(n/stride)
        # overlapping token windows, in ONE zero-shuffle pass (the
        # non-text columns ride through carry_cols — no join back, no
        # double evaluation of the curation lineage). id_col becomes
        # the collision-FREE composite "<doc>#<chunk>" string
        # (downstream stages and the encode key need uniqueness; a
        # 64-bit hash id would birthday-collide at corpus scale); the
        # original doc id survives as parent_doc_id.
        from choetl_spark.operators import chunk_documents

        df = (
            chunk_documents(
                df, text_col, id_col,
                max_tokens=args.chunk_tokens,
                overlap=args.chunk_overlap,
                carry_cols=[
                    c for c in df.columns if c not in (id_col, text_col)
                ],
            )
            .withColumn(text_col, F.col("chunk_text"))
            .drop("chunk_text", "n_tokens")
            .withColumn("parent_doc_id", F.col(id_col))
            .withColumn(
                id_col,
                F.concat_ws(
                    "#", F.col(id_col).cast("string"), F.col("chunk_idx")
                ),
            )
        )
        counts["after_chunking"] = df.count()

    merges = None
    if args.bpe_merges:
        # train the tokenizer ON the curated corpus (the standard
        # sequence: curate first, then fit the vocab) and budget the
        # shards in REAL tokenizer tokens instead of whitespace words
        from choetl_spark.operators.bpe import bpe_train

        merges = bpe_train(df, text_col, n_merges=args.bpe_merges)

    if args.shard_budget:
        if merges is not None:
            from choetl_spark.operators.bpe import with_bpe_tokens_fast

            tokens = with_bpe_tokens_fast(
                df.select(id_col, text_col), merges, text_col
            ).select(id_col, F.col("n_bpe_tokens").alias("_tok"))
        else:
            tokens = df.select(
                id_col,
                F.size(
                    F.split(F.trim(F.col(text_col)), r"\s+")
                ).alias("_tok"),
            )
        shards = pack_shards(
            tokens, "_tok", budget=args.shard_budget,
            id_col=id_col, n_writers=args.shard_writers,
        ).select(id_col, "writer", "shard")
        df = df.join(shards, id_col)

    cfg = EncodeConfig(
        num_partitions=args.partitions,
        chunk_rows=args.chunk_rows,
        chunk_bytes=args.chunk_bytes,
        key_col=id_col,
        shuffle=args.shuffle,
        optimize_for=args.profile,
        partition_by_host=False,  # documents carry no url/host column
    )
    summary = encode_with_resume(spark, df, args.output, cfg)
    if merges is not None:
        # tokenizer sidecar: the trained merge table ships WITH the
        # curated store so downstream consumers tokenize identically
        import json as _json
        import os as _os

        with open(
            _os.path.join(args.output, "_bpe_merges.json"), "w"
        ) as fh:
            _json.dump([list(m) for m in merges], fh)
    counts["encoded_rows"] = list(counts.values())[-1]
    return {"counts": counts, "encode": summary}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-quality", type=float, default=0.3)
    p.add_argument("--max-dup-2gram", type=float, default=0.9)
    p.add_argument("--langs", default=None,
                   help="comma allowlist of predicted langs; default all")
    p.add_argument("--near-dedup", action="store_true")
    p.add_argument("--dedup-against", default=None,
                   help="parquet of a prior curated store; drop incoming "
                        "docs whose normalized text already exists there")
    p.add_argument("--dedup-lines-max-docs", type=int, default=0,
                   help="strip lines shared by more than N docs; 0=off")
    p.add_argument("--max-per-domain", type=int, default=0,
                   help="keep at most K highest-quality pages per "
                        "registered domain; 0=off (needs --url-col)")
    p.add_argument("--url-col", default="url")
    p.add_argument("--decontaminate", default=None,
                   help="parquet of eval docs; drop 8-gram overlaps")
    p.add_argument("--dsir-target", default=None,
                   help="parquet of target-domain docs; keep the docs "
                        "most distributionally similar to it (DSIR "
                        "hashed-n-gram importance weights)")
    p.add_argument("--dsir-frac", type=float, default=0.5,
                   help="fraction of docs to keep under --dsir-target "
                        "(approx-quantile weight threshold)")
    p.add_argument("--dsir-buckets", type=int, default=4096)
    p.add_argument("--mixture", default=None,
                   help='per-source keep rates, e.g. "web=0.3,wiki=1.0"')
    p.add_argument("--mixture-default", type=float, default=0.0,
                   help="keep rate for sources absent from --mixture")
    p.add_argument("--source-col", default="source")
    p.add_argument("--val-frac", type=float, default=0.0)
    p.add_argument("--test-frac", type=float, default=0.0)
    p.add_argument("--ppl-band", default=None,
                   help="LO,HI — keep docs whose self-trained bigram-LM "
                        "perplexity lies in the band (CCNet-style "
                        "two-tail cut)")
    p.add_argument("--chunk-tokens", type=int, default=0,
                   help="split curated docs into N-token context "
                        "windows before packing; 0=off")
    p.add_argument("--chunk-overlap", type=int, default=0,
                   help="tokens shared by consecutive windows")
    p.add_argument("--bpe-merges", type=int, default=0,
                   help="train a BPE tokenizer with N merges on the "
                        "curated corpus; shard budgets then count BPE "
                        "tokens and the merge table ships as "
                        "_bpe_merges.json")
    p.add_argument("--shard-budget", type=int, default=0,
                   help="tokens per training shard; 0=no shard columns")
    p.add_argument("--shard-writers", type=int, default=32)
    p.add_argument("--minhash-hashes", type=int, default=64)
    p.add_argument("--minhash-bands", type=int, default=16)
    p.add_argument("--minhash-threshold", type=float, default=0.8)
    p.add_argument("--partitions", type=int, default=256)
    p.add_argument("--chunk-rows", type=int, default=65536)
    p.add_argument("--chunk-bytes", type=int, default=8 << 20)
    p.add_argument("--shuffle", default="salted", choices=["salted", "none"])
    p.add_argument("--profile", default="speed",
                   choices=["ratio", "balanced", "speed"])
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("choetl-curate").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    out = curate(spark, args)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
