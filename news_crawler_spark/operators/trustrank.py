"""TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004): biased
PageRank whose teleport mass flows ONLY to a trusted seed set, so
trust attenuates with link distance from the seeds and link farms —
however densely self-connected — starve. This is the spam-demotion
term a frontier priority wants next to freshness × budget ×
authority (crawl/frontier.py; operators/linkrank.py is the unbiased
companion over the same edge shape).

Same integer-arithmetic contract as linkrank.pagerank, same reasons:
trust travels as scaled BIGINT "micro-trust" (``scale`` = 1e12), each
edge moves ``(t·damping_pct) div (100·outdeg)`` in exact integer
division, so partial sums commute, runs at any partitioning agree
bit-for-bit, and a SQL oracle replays the full trajectory. One
equi-join + one partial-agg groupBy per iteration; nothing driver-side
but the iteration loop and one seed count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trustrank(edges: DataFrame, seeds: DataFrame, src: str = "src",
              dst: str = "dst", iterations: int = 3,
              damping_pct: int = 85, scale: int = 10**12,
              checkpoint_every: int = 6) -> DataFrame:
    """Iterate ``t' = seed_base + Σ_in (t·d%) div (100·outdeg)`` where
    ``seed_base = (100-d)%·scale div (100·|seeds|)`` on seed nodes and
    ZERO elsewhere (the only difference from pagerank — and the whole
    algorithm). ``seeds``: one column ``node``. Returns
    (node, trust_micro, is_seed); nodes unreachable from the seed set
    hold exactly 0.
    """
    if not 1 <= damping_pct <= 99:
        raise ValueError(f"damping_pct in [1, 99], got {damping_pct}")
    # loop invariants pinned once — see linkrank.pagerank
    e = edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst")).localCheckpoint(eager=True)
    seed_set = (seeds.select(F.col("node")).distinct()
                .localCheckpoint(eager=True))
    # seeds OUTSIDE the edge list stay in the node set: they hold
    # their teleport share every iteration (no out-edges → dangling,
    # mass not redistributed, same policy as pagerank) instead of
    # silently vanishing while still diluting base/init for the rest
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .union(seed_set).distinct())
    outdeg = (e.groupBy("src").agg(F.count(F.lit(1)).alias("n_out"))
              .localCheckpoint(eager=True))
    n_seeds = seed_set.count()
    if n_seeds == 0:
        raise ValueError("trustrank needs a non-empty seed set")
    base = ((100 - damping_pct) * scale) // (100 * n_seeds)
    init = scale // n_seeds

    flagged = nodes.join(
        seed_set.withColumn("_s", F.lit(True)), "node", "left"
    ).localCheckpoint(eager=True)
    seed_base = F.when(F.col("_s"), F.lit(base)).otherwise(F.lit(0))
    trust = flagged.select(
        "node", "_s",
        F.when(F.col("_s"), F.lit(init)).otherwise(F.lit(0))
         .cast("long").alias("trust_micro"))
    for it in range(iterations):
        t = trust.select("node", "trust_micro")
        contrib = (
            e.join(t, e["src"] == t["node"])
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"),
                    F.expr(f"(trust_micro * {damping_pct}) div "
                           f"(100 * n_out)").alias("c"))
            .groupBy("node").agg(F.sum("c").alias("in_mass"))
        )
        trust = (
            flagged.join(contrib, "node", "left")
            .select("node", "_s",
                    (seed_base + F.coalesce(F.col("in_mass"), F.lit(0)))
                    .cast("long").alias("trust_micro"))
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            trust = trust.localCheckpoint(eager=True)
    return trust.select(
        "node", "trust_micro",
        F.coalesce(F.col("_s"), F.lit(False)).alias("is_seed"))
