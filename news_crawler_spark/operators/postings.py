"""Inverted-index construction: the term → postings map a search tier
builds from a crawled corpus (the reference only ever greps pages at
query time — news.py keyword filters rescan text; an index is what
makes the 10^10-page version of that query answerable).

Shape: ONE posexplode of the token stream (positions come free from
the explode ordinal — no window), one groupBy (term, doc) that
aggregates positions map-side, then one groupBy term for the posting
lists. Both aggregations are partial-combinable; the shuffle keys are
exactly the index's physical layout (term-sharded), so at 100 TB the
output writes directly as bucketed index shards. Postings and
positions are ordered and comma-joined to scalars so the structure is
hash-comparable across engines (the driver gate cannot canonicalize
nested arrays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_SPLIT = "[^a-z0-9]+"  # RE2- and Java-identical


def build_postings(docs: DataFrame, doc_col: str = "doc_id",
                   text_col: str = "text", min_len: int = 2,
                   min_df: int = 1) -> DataFrame:
    """(term, df, postings) from (doc_id, text): df = document
    frequency, postings = 'doc:pos,pos;doc:pos' with docs ordered by
    id and positions ascending — deterministic, scalar, and exactly
    the layout a positional index serializes. ``min_df`` prunes
    hapax terms (at corpus scale most of the vocabulary — the classic
    index-size lever)."""
    toks = docs.select(
        F.col(doc_col).alias("doc"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT)
        ).alias("pos", "term"),
    ).where(F.length("term") >= min_len)
    per_doc = toks.groupBy("term", "doc").agg(
        F.array_join(F.array_sort(F.collect_list("pos")), ",")
         .alias("_positions"))
    per_term = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("doc"), F.col("_positions").alias("p")))),
                lambda s: F.concat(s.getField("doc"), F.lit(":"),
                                   s.getField("p"))),
            ";").alias("postings"))
    return per_term.where(F.col("df") >= min_df)
