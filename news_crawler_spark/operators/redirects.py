"""Redirect-chain resolution by pointer doubling (path halving).

A crawl accumulates a redirect edge list — 301/302/canonical-link
hops (the reference follows them implicitly inside one requests call,
reference: src/secbot/fetchers/news.py:91 `requests.get` with default
allow_redirects; at archive scale the hops are DATA, recorded per
fetch) — and every downstream system (frontier dedup, PageRank,
anchor aggregation, CDX lookup) wants each URL mapped to its TERMINAL
target: the canonical URL at the end of its chain.

Serial resolution walks chains one hop at a time — O(max chain) joins.
This operator uses POINTER DOUBLING: each round every URL's pointer
jumps to its pointer's pointer, so after r rounds a pointer covers
2^r hops — chains up to 2^max_rounds resolve in max_rounds self-joins
(the classic Wyllie/parallel list-ranking primitive, the same
log-round trick dedup_clusters' alternating star uses). At web scale
redirect chains are short (browsers cap ~20; crawlers 5-10), so 4-5
rounds cover everything real, and each round is ONE equi-join of the
state table with itself on the pointer key — nothing all-pairs, the
state never exceeds one row per redirecting URL.

Semantics:

* the edge list is made FUNCTIONAL deterministically: if a src ever
  recorded multiple targets (re-crawls disagreeing), the minimum dst
  wins — replayable in any engine;
* ``resolved`` = the final pointer has no outgoing redirect (a true
  terminal). Cycles (A→B→A — redirect loops exist in the wild) never
  terminate: their pointer keeps cycling and stays inside the src
  set, so they report ``resolved = false`` with ``hops`` NULL — the
  signal a frontier uses to drop loop URLs outright;
* ``hops`` (for resolved chains) is the exact chain length, carried
  through the doubling as hops(x) += hops(ptr(x)).

Determinism: integer hop counts, min-dst functionalization, and a
fixed round count make the output a pure function of the edge list;
the DuckDB oracle replays the doubling by unrolling the rounds.
localCheckpoint per round resets the lineage (kmeans/components
pattern) so the plan can't double per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(edges: DataFrame, src_col: str = "src",
                      dst_col: str = "dst",
                      max_rounds: int = 4) -> DataFrame:
    """Resolve every redirecting URL to its terminal target.

    Returns ``(url, final_url, hops, resolved)`` — one row per
    distinct src in ``edges``; chains longer than ``2^max_rounds``
    (or cycles) come back ``resolved = false, hops = NULL`` with
    ``final_url`` the pointer reached so far.
    """
    # functionalize: one deterministic out-edge per src
    e = (edges.select(F.col(src_col).alias("url"),
                      F.col(dst_col).alias("ptr"))
         .groupBy("url").agg(F.min("ptr").alias("ptr")))

    state = e.select("url", "ptr", F.lit(1).cast("long").alias("hops"))
    state = state.localCheckpoint(eager=True)
    # the terminal test needs the src set — read it off the PINNED
    # initial state rather than re-executing e's scan + groupBy
    init = state
    for _ in range(max_rounds):
        jump = state.select(F.col("url").alias("_jurl"),
                            F.col("ptr").alias("_jptr"),
                            F.col("hops").alias("_jhops"))
        state = (
            state.join(jump, state.ptr == jump._jurl, "left")
            .select(
                "url",
                F.coalesce("_jptr", "ptr").alias("ptr"),
                (F.col("hops") + F.coalesce("_jhops", F.lit(0)))
                .alias("hops"))
            .localCheckpoint(eager=True)
        )
    # terminal test: the final pointer has no outgoing redirect
    srcs = init.select(F.col("url").alias("_s"), F.lit(True).alias("_in"))
    return (
        state.join(srcs, state.ptr == srcs._s, "left")
        .select(
            "url",
            F.col("ptr").alias("final_url"),
            F.when(F.col("_in").isNull(), F.col("hops")).alias("hops"),
            F.col("_in").isNull().alias("resolved"))
    )
