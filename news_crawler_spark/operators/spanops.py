"""Operators over the interleaved span documents (the input_hint
table): flatten, link harvest, per-kind stats. All native array
functions — `spans` never leaves the JVM.

Column pruning matters here (SURVEY.md §4): `spans` is the fat
column; these operators project it away as early as possible so scans
that only need doc ids never read it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_text(documents: DataFrame) -> DataFrame:
    """P3 (reference asec.py:97-98 get_text): join all text-bearing
    span texts in offset order → (doc_id, text).

    A document with NO text-bearing spans flattens to NULL, not '' —
    "no text" and "empty text" must stay distinguishable, and SQL
    engines (string_agg over zero rows) agree on NULL, so digests like
    sha2(text) stay replayable by the DuckDB oracle."""
    ordered = F.array_sort(
        F.col("spans"),
        lambda a, b: F.when(a.getField("offset") < b.getField("offset"), -1)
        .when(a.getField("offset") > b.getField("offset"), 1)
        .otherwise(0),
    )
    texts = F.filter(ordered, lambda s: s.getField("text") != "")
    return documents.select(
        "doc_id",
        F.nullif(
            F.concat_ws(" ", F.transform(texts, lambda s: s.getField("text"))),
            F.lit(""),
        ).alias("text"),
    )


def document_links(documents: DataFrame) -> DataFrame:
    """X3: harvest link/media refs in document order."""
    return (
        documents.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind").isin("link", "media") & (F.col("s.media_ref") != ""))
        .select(
            "doc_id",
            F.col("s.kind").alias("kind"),
            F.col("s.media_ref").alias("ref"),
            F.col("s.offset").alias("offset"),
        )
    )


def span_stats(documents: DataFrame) -> DataFrame:
    """Per-doc span profile: counts per kind + total text length,
    computed without exploding (aggregate over the array in place)."""

    def count_kind(kind: str) -> F.Column:
        return F.size(F.filter("spans", lambda s: s.getField("kind") == F.lit(kind)))

    text_len = F.aggregate(
        "spans", F.lit(0),
        lambda acc, s: acc + F.length(s.getField("text")),
    )
    return documents.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        count_kind("text").alias("n_text"),
        count_kind("link").alias("n_link"),
        count_kind("media").alias("n_media"),
        text_len.alias("text_chars"),
    )
