"""DataFrame-in/DataFrame-out operators: the reference's §2 inventory
plus the training-data pipeline ops (dedup, similarity, text, media)."""

from news_crawler_spark.operators.asof import asof_join
from news_crawler_spark.operators.classifier import (
    dsir_logratio,
    hashed_classifier_scores,
)
from news_crawler_spark.operators.components import (
    connected_components,
    dedup_clusters,
)
from news_crawler_spark.operators.dedup import (
    exact_dedup,
    first_wins_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_buckets,
    winnowing_fingerprints,
)
from news_crawler_spark.operators.hits import hits_scores
from news_crawler_spark.operators.kmeans import kmeans_fit
from news_crawler_spark.operators.linkrank import pagerank
from news_crawler_spark.operators.mixture import domain_mixture, training_shuffle
from news_crawler_spark.operators.quality import (
    bloom_contamination,
    bm25_scores,
    boilerplate_profile,
    c4_clean,
    perplexity_buckets,
    contamination_overlap,
    gopher_gate,
    lm_cross_entropy,
    repetition_profile,
)
from news_crawler_spark.operators.packing import pack_sequences
from news_crawler_spark.operators.pq import (
    ivf_pq_topk,
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
    pq_topk,
)
from news_crawler_spark.operators.paragraphs import (
    paragraph_dedup,
    span_dedup,
)
from news_crawler_spark.operators.rangejoin import interval_join_bucketed
from news_crawler_spark.operators.redirects import resolve_redirects
from news_crawler_spark.operators.recrawl import recrawl_intervals
from news_crawler_spark.operators.sketches import (
    cms_counters,
    cms_lookup,
    hll_count_distinct,
    hll_estimate,
    hll_registers,
)
from news_crawler_spark.operators.similarity import (
    cosine_topk_bruteforce,
    ivf_topk,
    kmeans_refine,
    lsh_ann_topk,
    semantic_dedup,
)
from news_crawler_spark.operators.substr import duplicate_ngram_spans
from news_crawler_spark.operators.spanops import (
    document_links,
    flatten_text,
    span_stats,
)
from news_crawler_spark.operators.wsample import (
    stratified_budget_sample,
    weighted_sample_k,
)
from news_crawler_spark.operators.topk import (
    global_row_number,
    salted_agg,
    salted_join,
    salted_join_hot,
    top_k_global,
    top_k_per_group,
)

__all__ = [
    "asof_join",
    "semantic_dedup",
    "dsir_logratio",
    "hashed_classifier_scores",
    "domain_mixture",
    "training_shuffle",
    "duplicate_ngram_spans",
    "bloom_contamination",
    "bm25_scores",
    "c4_clean",
    "perplexity_buckets",
    "boilerplate_profile",
    "contamination_overlap",
    "gopher_gate",
    "lm_cross_entropy",
    "repetition_profile",
    "connected_components",
    "dedup_clusters",
    "cms_counters",
    "cms_lookup",
    "exact_dedup",
    "first_wins_dedup",
    "hll_count_distinct",
    "hll_estimate",
    "hll_registers",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "hits_scores",
    "pagerank",
    "simhash_buckets",
    "winnowing_fingerprints",
    "interval_join_bucketed",
    "pack_sequences",
    "paragraph_dedup",
    "recrawl_intervals",
    "resolve_redirects",
    "stratified_budget_sample",
    "weighted_sample_k",
    "span_dedup",
    "global_row_number",
    "salted_agg",
    "salted_join",
    "salted_join_hot",
    "top_k_global",
    "top_k_per_group",
    "cosine_topk_bruteforce",
    "ivf_pq_topk",
    "ivf_topk",
    "pq_adc_topk",
    "pq_codebooks",
    "pq_encode",
    "pq_topk",
    "kmeans_fit",
    "kmeans_refine",
    "lsh_ann_topk",
    "document_links",
    "flatten_text",
    "span_stats",
]
