"""Weighted sampling WITHOUT replacement, exact k (Efraimidis &
Spirakis 2006, A-ES): each row draws key = u^(1/w) and the k largest
keys ARE a weighted sample without replacement — one projection plus
a TakeOrderedAndProject top-k, no rejection loop, no iteration. This
is the exact-k companion to quality_weighted_sample's accept/reject
(FineWeb-style) pass: mixtures that must hit a row budget exactly use
this one.

Determinism contract: u is the sha256 60-bit-prefix / 2^60 draw the
repo standardizes on (power-of-two divisor → the double is
engine-exact); the one transcendental (pow) is rounded to 12 dp with
an id tiebreak BEFORE ranking, so a last-ulp libm divergence between
engines cannot flip membership. Weights must be > 0 — zero-weight
rows are excluded by definition (their key is 0)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TWO_60 = float(1 << 60)


def es_key_col(id_col: str, weight_col: str, seed: str = "es") -> F.Column:
    """round(u^(1/w), 12) with u = sha2(seed|id) 60-bit / 2^60."""
    u = (
        F.conv(F.substring(
            F.sha2(F.concat(F.lit(seed + "|"),
                            F.col(id_col).cast("string")), 256),
            1, 15), 16, 10).cast("long").cast("double")
        / F.lit(_TWO_60))
    return F.round(F.pow(u, F.lit(1.0) / F.col(weight_col)), 12)


def weighted_sample_k(df: DataFrame, weight_col: str, k: int,
                      id_col: str, seed: str = "es") -> DataFrame:
    """The k rows with the largest A-ES keys (key desc, id asc):
    a weighted sample without replacement, deterministic in
    (seed, ids, weights). orderBy().limit() plans as
    TakeOrderedAndProject — per-partition partial top-k, never a
    global sort."""
    keyed = (df.where(F.col(weight_col) > 0)
             .withColumn("es_key", es_key_col(id_col, weight_col, seed)))
    return keyed.orderBy(F.col("es_key").desc(), id_col).limit(k)


def stratified_budget_sample(df: DataFrame, group_col: str,
                             weight_col: str, total_k: int, id_col: str,
                             floor: int = 1, seed: str = "es",
                             quantize: int = 1000) -> DataFrame:
    """Budgeted stratified sampling — the data-mixture draw a training
    recipe actually runs: given a GLOBAL row budget ``total_k``,
    (1) apportion it across groups by largest-remainder over each
    group's total weight mass (crawl/budget.py allocate_host_budget —
    exact sum, ``floor`` rows guaranteed per group so no domain/
    language vanishes, deterministic remainder ties), then
    (2) draw EXACTLY its allocation from every group by A-ES weighted
    sampling without replacement (:func:`es_key_col`).

    Scale shape: the mass aggregate is one map-side-combinable groupBy
    (per-row weights quantized to longs FIRST — ``ceil(w·quantize)``
    — so the sum is integer-exact at any partitioning; pass
    ``quantize=1`` for already-integral weights); the allocation table
    is |groups| rows and broadcasts back; the per-group rank windows
    partition on the group key (each group ranks its own rows, no
    global sort). Deterministic end to end, so the DuckDB oracle
    replays allocation AND membership.

    A group with fewer positive-weight rows than its allocation
    returns all of them — the output then sums below ``total_k``
    (under-filled strata are a data-supply problem; reallocating their
    slack is a policy loop the caller owns). Returns
    ``(group, id, weight, es_key, rnk, alloc)`` rows with
    ``rnk <= alloc`` per group."""
    from pyspark.sql import Window

    from news_crawler_spark.crawl.budget import allocate_host_budget

    pos = df.where(F.col(weight_col) > 0)
    mass = (pos.select(
        F.col(group_col),
        F.ceil(F.col(weight_col) * quantize).cast("long").alias("_qw"))
        .groupBy(group_col).agg(F.sum("_qw").alias("mass")))
    alloc = (
        allocate_host_budget(
            mass.select(F.col(group_col).alias("host"), "mass"),
            total_k, floor=floor)
        .select(F.col("host").alias(group_col), "alloc"))
    keyed = pos.withColumn("es_key", es_key_col(id_col, weight_col, seed))
    w = Window.partitionBy(group_col).orderBy(F.col("es_key").desc(),
                                              F.col(id_col))
    return (
        keyed.withColumn("rnk", F.row_number().over(w))
        .join(F.broadcast(alloc), group_col)
        .where(F.col("rnk") <= F.col("alloc"))
        .select(group_col, id_col, weight_col, "es_key", "rnk", "alloc")
    )
