"""Anchor-text aggregation over the link graph.

The reference harvests anchor hrefs for frontier expansion but drops
the anchor TEXT (reference: src/secbot/fetchers/news.py:122 —
extraction keeps NewsItem(title, link, published) only for display). At web scale the anchor
text pointing AT a page is one of the highest-signal descriptions of
it — search engines rank with it, and pretraining pipelines mine it
as human-written summaries of the target. This operator builds the
per-target anchor-term profile.

Scale shape: one Generate (term explode), one map-side-combinable
groupBy on (dst, term), then a per-target top-k window — partitioned
by dst, so each target ranks its own bounded term list; no global
sort anywhere. Hot targets (every page links "home") are exactly the
keys AQE skew-split handles on the groupBy; the window input is
already the aggregated (dst, term) table, orders of magnitude smaller
than the edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TERM_SPLIT = "[^a-z0-9]+"  # RE2- and Java-identical on purpose


def anchor_text_profile(edges: DataFrame, top_terms: int = 5,
                        min_len: int = 2) -> DataFrame:
    """Per-target top anchor terms from (src, dst, anchor) edges.

    Returns (dst, term, n_links, rank): n_links counts link
    occurrences of the term (an anchor used by many links weighs more
    — the ranking signal), rank orders (n_links desc, term asc) so
    the profile is deterministic under ties.
    """
    toks = edges.select(
        "dst",
        F.explode(
            F.split(F.lower(F.col("anchor")), _TERM_SPLIT)).alias("term"),
    ).where(F.length("term") >= min_len)
    counts = toks.groupBy("dst", "term").agg(
        F.count(F.lit(1)).alias("n_links"))
    w = Window.partitionBy("dst").orderBy(F.col("n_links").desc(), "term")
    return (counts.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_terms))
