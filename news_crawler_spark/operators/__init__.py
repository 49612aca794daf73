"""DataFrame-in/DataFrame-out operators: the reference's §2 inventory
plus the training-data pipeline ops (dedup, similarity, text, media)."""

from news_crawler_spark.operators.dedup import (
    exact_dedup,
    first_wins_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_buckets,
)
from news_crawler_spark.operators.topk import top_k_global, top_k_per_group
from news_crawler_spark.operators.similarity import (
    cosine_topk_bruteforce,
    lsh_ann_topk,
)
from news_crawler_spark.operators.spanops import (
    document_links,
    flatten_text,
    span_stats,
)

__all__ = [
    "exact_dedup",
    "first_wins_dedup",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_buckets",
    "top_k_global",
    "top_k_per_group",
    "cosine_topk_bruteforce",
    "lsh_ann_topk",
    "document_links",
    "flatten_text",
    "span_stats",
]
