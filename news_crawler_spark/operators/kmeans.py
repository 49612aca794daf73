"""Deterministic Lloyd k-means over embedding columns.

Training-data pipelines cluster embeddings constantly — SemDeDup
(Abbas et al. 2023) dedups within k-means cells, DSIR-style domain
analysis buckets by cluster, and IVF ANN indexes are k-means cells.
``kmeans_fit`` is the engine-level trainer behind those: Lloyd
iterations where the ASSIGNMENT step is the zero-shuffle literal-
centroid scan (``ivf_assign`` — Project/Generate only, no Exchange
over the corpus) and the UPDATE step is one map-side-combinable
groupBy mean over (cell, dim). Per iteration the corpus is scanned
once and shuffled only as (cell, dim, partial-sum) rows — k*dim keys,
trivially balanced — while the centroids (k rows) come back to the
driver to become the next iteration's literals, exactly the
cheap-side/heavy-side split a 100 TB run needs.

Everything is REPLAYABLE: init is the first ``k`` vectors by id (the
same deterministic seed rule as ``ivf_topk``), assignment ranks by
ROUNDED cosine (6 dp) with a cell-id tiebreak, and the updated
centroid means are rounded to the same precision before they become
literals — so any SQL engine (the DuckDB correctness oracle) can walk
the identical trajectory and land on the identical final assignment.
Swap the init for sampled ids and drop the rounding when you want
speed over replayability; the plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_crawler_spark.operators.similarity import ivf_assign


def kmeans_fit(df: DataFrame, k: int = 8, iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               round_to: int = 6) -> DataFrame:
    """Run ``iters`` Lloyd refinements from the first-``k``-by-id seed
    and return the final assignment ``(id_col, cell)``.

    A cell that loses all members in an iteration vanishes (its mean
    is undefined) — deterministic and replayed identically by the
    oracle; production pipelines typically reseed such cells from the
    farthest point, which would add one top-1 pass per iteration with
    the same plan shape.
    """
    centroids: list | DataFrame = (
        df.orderBy(id_col).limit(k)
        .select(
            F.col(id_col).cast("int").alias("cell"),
            F.transform(vec_col,
                        lambda x: F.round(x.cast("double"), round_to))
            .alias("cvec"))
    )
    for _ in range(iters):
        assigned = ivf_assign(df, centroids, id_col, vec_col, nprobe=1)
        means = (
            assigned.select("cell", F.posexplode(vec_col).alias("_d", "_x"))
            .groupBy("cell", "_d")
            .agg(F.avg(F.col("_x").cast("double")).alias("_m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("_d", "_m")))
                 .alias("_s"))
            .select(
                "cell",
                F.transform("_s", lambda s: F.round(s.getField("_m"),
                                                    round_to))
                .alias("cvec"))
        )
        # k rows — tiny by design; kept as a plain list so the next
        # assignment needs no createDataFrame + collect job pair
        centroids = [(int(r["cell"]), r["cvec"]) for r in means.collect()]
    return (ivf_assign(df, centroids, id_col, vec_col, nprobe=1)
            .select(id_col, "cell"))
