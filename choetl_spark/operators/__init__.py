"""Operator surface: relational record ops + training-data pipeline ops."""

from choetl_spark.operators.relational import (  # noqa: F401
    compare_tables,
    except_keys,
    left_join,
    top_k,
    with_seq_no,
)
from choetl_spark.operators.dedup import (  # noqa: F401
    dedup_against,
    dedup_embedding_cosine,
    dedup_exact,
    dedup_exact_normalized,
    dedup_semantic,
    semantic_neardup_pairs,
    connected_components,
    dedup_minhash,
    embedding_neardup_pairs,
    minhash_lsh_candidates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_signatures,
)
from choetl_spark.operators.temporal import (  # noqa: F401
    asof_join,
    point_in_interval_join,
    sessionize,
    time_window_pairs,
)
from choetl_spark.operators.corpus import (  # noqa: F401
    chunk_documents,
    decontaminate,
    dedup_lines,
    dedup_spans,
    pack_shards,
    top_ngrams,
)
from choetl_spark.operators.importance import (  # noqa: F401
    dsir_model,
    dsir_select,
    dsir_weights,
    hashed_gram_buckets,
)
from choetl_spark.operators.sampling import (  # noqa: F401
    cap_per_domain,
    sample_mixture,
    with_split,
)
from choetl_spark.operators.graph import (  # noqa: F401
    hits,
    pagerank,
)
from choetl_spark.operators.weburl import (  # noqa: F401
    domain_stats,
    sniff_charset,
    with_anchor_texts,
    with_html_decoded,
    with_outlinks,
    with_url_canonical,
    with_url_parts,
)
from choetl_spark.operators.similarity import (  # noqa: F401
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
    ivf_train_centroids,
    knn_join_brute,
    with_ivf_cluster,
)
from choetl_spark.operators.langmodel import (  # noqa: F401
    score_lm,
    train_bigram_lm,
    with_lm_perplexity,
)
from choetl_spark.operators.quantize import (  # noqa: F401
    cosine_topk_quantized,
    with_dequantized_embedding,
    with_quantized_embedding,
)
from choetl_spark.operators.search import (  # noqa: F401
    bm25_topk,
    build_postings,
)
from choetl_spark.operators.textstats import (  # noqa: F401
    winnowing_fingerprints,
    with_fingerprint,
    with_lang_id,
    with_html_text,
    with_text_normalized,
    with_pii_redacted,
    with_quality_score,
    with_repetition_stats,
    with_token_count,
)
