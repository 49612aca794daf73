"""Exact-substring duplicate span detection (ExactSubstr-style).

Generalizes the reference's exact dedup (D-family; reference
``src/secbot/asec.py`` dedups whole articles by URL/title) to the
*sub-document* level used by LLM training pipelines: find every
maximal token span that is covered by some k-token n-gram occurring
at least ``min_count`` times in the corpus (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better" — the
ExactSubstr criterion, re-expressed relationally instead of with a
suffix array).

Scale shape (100 TB):
- Tokenization and k-gram construction are **row-local** — the gram
  list is built with ``transform(sequence(...), slice(...))`` over the
  token array, so there is no per-token window and no shuffle until
  the corpus-wide duplicate count.
- Duplicate counting is **one shuffle on the 60-bit gram hash**
  (a count window over the hash partition — a single exchange, versus
  groupBy-then-join-back which would shuffle the occurrence table
  twice). k >= 8 makes hot grams rare; AQE skew handling covers the
  residue.
- Span merging is **one shuffle on doc_id** (islands via lag + running
  sum, partitions are per-document and stay small), and the final
  per-(doc, island) aggregate reuses that partitioning — Catalyst
  plans no third exchange.

Nothing is all-pairs and nothing is proportional to corpus size
squared: cost is O(total tokens) rows through two exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def duplicate_ngram_spans(
    documents: DataFrame,
    *,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal duplicated token spans per document.

    A token position is *covered* when some k-gram starting at it (or
    overlapping it) occurs ``min_count``+ times corpus-wide (including
    repeats inside one document, per ExactSubstr). Overlapping or
    adjacent covered intervals merge into one span.

    Returns ``(doc_id, span_start, span_end, span_tokens)`` with
    0-based inclusive token offsets into the whitespace-token sequence
    of ``lower(trim(text))``. Documents with no duplicated span (or
    fewer than k tokens, or NULL text) produce no rows.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )
    # Row-local gram list: one slice per start offset; empty when the
    # document is shorter than k (sequence() would otherwise count
    # down). The token array is bound once through a singleton-array
    # transform — referencing `toks` directly inside the per-offset
    # lambda would re-tokenize the document per gram (CollapseProject
    # re-inlines the alias and HOF lambdas re-evaluate their body),
    # turning an O(tokens) row into O(tokens^2).
    grams = F.element_at(
        F.transform(
            F.array(toks),
            lambda t: F.when(
                F.size(t) >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - k),
                    lambda i: F.concat_ws(" ", F.slice(t, i + 1, k)),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
        1,
    )

    from news_crawler_spark.operators.par import spread_scan

    occ = spread_scan(documents).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(grams).alias("pos", "gram"),
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        # 60-bit sha256 prefix: engine-portable (the DuckDB oracle
        # replays it as ('0x' || substr(sha256(g),1,15))::BIGINT).
        F.conv(F.substring(F.sha2(F.col("gram"), 256), 1, 15), 16, 10)
        .cast("long")
        .alias("gh"),
    )

    # One exchange on the gram hash; count-only window (no ordering).
    dup = occ.withColumn(
        "_cnt", F.count(F.lit(1)).over(Window.partitionBy("gh"))
    ).filter(F.col("_cnt") >= min_count)

    # Gaps-and-islands on doc_id: a new island starts when the previous
    # covered interval [lag, lag+k-1] neither overlaps nor touches
    # [pos, pos+k-1], i.e. pos - lag > k.
    by_doc = Window.partitionBy("doc_id").orderBy("pos")
    flagged = dup.select(
        "doc_id",
        "pos",
        F.when(
            F.lag("pos").over(by_doc).isNull()
            | ((F.col("pos") - F.lag("pos").over(by_doc)) > k),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_brk"),
    ).withColumn(
        "island",
        F.sum("_brk").over(by_doc.rowsBetween(Window.unboundedPreceding, 0)),
    )

    return (
        flagged.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
            (F.max("pos") + F.lit(k) - F.min("pos")).cast("long").alias(
                "span_tokens"
            ),
        )
        .select("doc_id", "span_start", "span_end", "span_tokens")
    )
