"""HITS hubs-and-authorities over a link graph (Kleinberg 1999).

The companion signal to PageRank (operators/linkrank.py) a crawl
frontier actually wants both halves of: AUTHORITIES are pages many
good hubs point at (fetch-priority signal), HUBS are index/listing
pages whose outlinks are worth harvesting aggressively (the
reference's S3 listing scan, generalized). One iteration is

    auth(v) = sum of hub(u) over edges u->v,  then max-normalize
    hub(u)  = sum of auth(v) over edges u->v, then max-normalize

Scale shape per iteration: one equi-join of the edge list with the
current score table plus one map-side-combinable groupBy sum — the
same join+groupBy-per-iteration shape as pagerank — and a 1-row max
aggregate that broadcasts back for normalization. Nothing is
all-pairs; the edge list shuffles on its join key only.

Determinism (the kmeans_fit pattern, operators/kmeans.py): scores are
max-normalized and ROUNDED to 6 dp after every update, so the
iteration trajectory is engine-exact and the DuckDB oracle replays it
by unrolling the iterations in SQL — shuffle-order float-sum drift
(~1e-15) cannot survive the rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits_scores(edges: DataFrame, iterations: int = 2,
                src_col: str = "src", dst_col: str = "dst",
                round_to: int = 6) -> DataFrame:
    """Run ``iterations`` HITS updates from hub = 1.0 on every node
    and return ``(node, auth, hub)`` for EVERY node that holds either
    score after the final iteration: auth NULL for pure sources (no
    in-edges — their hub score is exactly what the module docstring
    says hubs surface: index/listing/seed pages), hub NULL for pure
    sinks (no out-edges). Callers rank by ``auth`` (NULLS LAST, ties
    on node id) for a deterministic top-k.
    """
    # r6: every normalization references its raw score table TWICE
    # (the 1-row max aggregate AND the normalize projection), and each
    # iteration's join references the edge list and the prior half-
    # iteration — without pins the duplication COMPOUNDS per
    # iteration (the lazy plan re-executes the edge join 2^k-ish
    # times). Pin the edge list once and each half-iteration's raw
    # sum table (eager localCheckpoint — node-sized, released by the
    # ContextCleaner); every double-reference then reads a pinned RDD.
    # Scores are unchanged: checkpointing moves no arithmetic, and the
    # 6-dp rounding already makes the trajectory engine-exact.
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")).localCheckpoint(eager=True)
    hub = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", F.lit(1.0).alias("h"))
    )
    auth = None
    for _ in range(iterations):
        a_raw = (
            e.join(hub, e.src == hub.node)
            .groupBy("dst").agg(F.sum("h").alias("ar"))
            .localCheckpoint(eager=True)
        )
        a_max = a_raw.agg(F.max("ar").alias("am"))
        auth = (
            a_raw.crossJoin(F.broadcast(a_max))
            .select(F.col("dst").alias("node"),
                    F.round(F.col("ar") / F.col("am"), round_to)
                    .alias("a"))
        )
        h_raw = (
            e.join(auth, e.dst == auth.node)
            .groupBy("src").agg(F.sum("a").alias("hr"))
            .localCheckpoint(eager=True)
        )
        h_max = h_raw.agg(F.max("hr").alias("hm"))
        hub = (
            h_raw.crossJoin(F.broadcast(h_max))
            .select(F.col("src").alias("node"),
                    F.round(F.col("hr") / F.col("hm"), round_to)
                    .alias("h"))
        )
    # full outer: a left join would drop src-only nodes (hub score but
    # no in-edge) — exactly the listing/seed pages hubs exist to rank
    return (
        auth.join(hub, "node", "full")
        .select("node", F.col("a").alias("auth"), F.col("h").alias("hub"))
    )
