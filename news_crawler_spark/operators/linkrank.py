"""Link-graph authority scoring (PageRank power iteration).

The reference crawler's scheduling signal is recency + per-source
caps (``news.py`` per-source limits); at web scale the frontier
priority (see ``crawl/frontier.py``: freshness score × host budget)
wants a third term — host/page authority from the link graph itself.
This is the classic PageRank power iteration, expressed as DataFrame
algebra: one equi-join + one groupBy-sum per iteration, both
map-side combinable and co-partitionable on the node key at cluster
scale; nothing iterates driver-side except the (small, fixed)
iteration loop itself.

**Integer arithmetic, deliberately.** A float PageRank sums
double contributions in shuffle order — non-deterministic across
engines (and across runs at different parallelism). Ranks here are
scaled BIGINT "micro-ranks" (``scale`` = 1e12): each edge
contribution is ``(r·damping_pct) div (100·outdeg)`` in exact
integer division, so partial sums commute and a SQL oracle (or a
re-run at any partitioning) reproduces every rank bit-for-bit. The
cost is a ≤ outdeg·1e-12 truncation per node per iteration —
irrelevant for ranking, decisive for testability. Dangling nodes
keep the teleport base (their mass is *not* redistributed; at
frontier scale the ranking, not the exact distribution, is the
product).

Max |rank| ≤ scale, edges ≤ 2^63/(100·scale) — no ANSI overflow for
any graph with < ~9e6 aggregate in-degree mass at the default scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iterations: int = 3, damping_pct: int = 85,
             scale: int = 10**12, checkpoint_every: int = 6) -> DataFrame:
    """Iterate ``r' = (100-d)%·scale/N + Σ_in (r·d%) div (100·outdeg)``.

    Returns (node, rank_micro). ``checkpoint_every``: eager
    localCheckpoint cadence — iterative plans grow multiplicatively
    and Catalyst analysis goes super-linear past ~6 stacked
    iterations (see spark4 notes in operators/components.py); short
    unrolls stay pure-lazy so a SQL oracle's unrolled CTEs match the
    exact same computation.
    """
    if not 1 <= damping_pct <= 99:
        raise ValueError(f"damping_pct in [1, 99], got {damping_pct}")
    # loop-invariant tables pinned ONCE (eager localCheckpoint —
    # released by the ContextCleaner): e/nodes/outdeg are referenced
    # by every iteration of the unrolled plan, and without the pin
    # each reference re-executes the scan + distinct/agg subtree
    e = edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst")).localCheckpoint(eager=True)
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    outdeg = (e.groupBy("src").agg(F.count("*").alias("n_out"))
              .localCheckpoint(eager=True))
    n = nodes.count()  # cheap: counts the pinned RDD
    if n == 0:  # empty graph: empty ranks, not a ZeroDivisionError
        return nodes.withColumn("rank_micro", F.lit(0).cast("long"))
    base = ((100 - damping_pct) * scale) // (100 * n)
    init = scale // n
    ranks = nodes.withColumn("rank_micro", F.lit(init).cast("long"))
    for it in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"),
                    F.expr(f"(rank_micro * {damping_pct}) div "
                           f"(100 * n_out)").alias("c"))
            .groupBy("node").agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select("node",
                    (F.lit(base) + F.coalesce(F.col("in_mass"), F.lit(0)))
                    .cast("long").alias("rank_micro"))
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
