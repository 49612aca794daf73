"""Label propagation communities (Raghavan, Albert & Kumara 2007):
near-linear community detection over the link graph — the standard
first pass for mirror-site / template-farm clustering, complementing
dup_clusters (operators/components.py finds CONNECTED components;
LPA finds DENSE ones inside a connected web graph, which is what a
mirror farm is).

Synchronous variant with a deterministic tie-break (most frequent
neighbor label, ties to the smallest label), so a fixed iteration
count is a pure function of the edge list — the same
replayable-trajectory contract as pagerank/hits/kmeans. Synchronous
LPA can oscillate on bipartite structures; callers wanting a fixed
point should read the labels as "after k rounds", which is also
exactly what the SQL oracle unrolls.

Per iteration: one equi-join (neighbor labels) + one partial-agg
groupBy on (node, label) + a per-node window (bounded per key, never
global). Undirected by construction — each edge votes both ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, src: str = "src",
                      dst: str = "dst", iterations: int = 2,
                      checkpoint_every: int = 4) -> DataFrame:
    """Returns (node, label) after ``iterations`` synchronous rounds,
    labels initialized to node ids. Deterministic: vote counts are
    integers and ties break to the smallest label."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    und = e.union(e.select(F.col("dst").alias("src"),
                           F.col("src").alias("dst")))
    nodes = und.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node"))
    for it in range(iterations):
        lab = labels.select(F.col("node").alias("_n"), "label")
        votes = (
            und.join(lab, und["dst"] == lab["_n"])
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("n_votes")))
        w = Window.partitionBy("node").orderBy(
            F.col("n_votes").desc(), F.col("label").asc())
        labels = (votes.withColumn("_r", F.row_number().over(w))
                  .where(F.col("_r") == 1).select("node", "label"))
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            labels = labels.localCheckpoint(eager=True)
    return labels


def community_sizes(labels: DataFrame, top: int = 20) -> DataFrame:
    """(label, size) for the ``top`` largest communities — the report
    a farm-detection pass actually reads (size desc, label asc)."""
    return (labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))
            .orderBy(F.col("size").desc(), "label").limit(top))
