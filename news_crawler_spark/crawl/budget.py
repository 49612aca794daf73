"""Per-host fetch-budget apportionment for the frontier scheduler.

The reference crawler caps each fetch round at a fixed article limit
(reference: src/secbot/fetchers/news.py:128-162 — `get(limit=10)`
truncates the merged feed list, every source treated equally). At web scale the budget is a
global resource: a fetch round has B slots and millions of hosts with
wildly different priority mass, so the scheduler needs a proportional
allocation that (a) sums to exactly B, (b) guarantees every live host
a floor (politeness-fair starvation avoidance), and (c) is
deterministic so resumed rounds recompute identical plans. That is
the classic largest-remainder (Hamilton) apportionment.

Scale shape: the input here is the PER-HOST aggregate (|hosts| «
|frontier| — the frontier never passes through this operator), totals
travel as 1-row broadcast cross-joins, and the one global ordering —
the remainder rank — uses the two-phase range-partition +
per-partition offsets pattern (operators/topk.py global_row_number),
NEVER a single-partition window. Integer masses keep the double
arithmetic order-independent (exact sums below 2^53), so the
allocation is bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _remainder_rank(scored: DataFrame, n_parts: int = 16) -> DataFrame:
    """Exact global 1-based rank by (_frac desc, host asc) without a
    SinglePartition exchange: range-repartition on (-_frac, host) —
    negation is FP-exact, so ascending (-_frac) IS descending _frac —
    rank within partitions, add per-partition offsets (a ≤ n_parts-row
    driver collect, bounded by partition count, not data). The eager
    localCheckpoint pins the sampled ranges so both passes see the
    same partition ids."""
    staged = (
        scored.withColumn("_nf", -F.col("_frac"))
        .repartitionByRange(n_parts, F.col("_nf"), F.col("host"))
        .sortWithinPartitions("_nf", "host")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        (r["_pid"], r["n"]) for r in
        staged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect())
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    if offsets:
        off = F.create_map(
            *[F.lit(x) for po in offsets.items() for x in po]
        )[F.col("_pid")].cast("long")
    else:
        off = F.lit(0).cast("long")
    w = Window.partitionBy("_pid").orderBy("_nf", "host")
    return (staged.withColumn("_rank", off + F.row_number().over(w))
            .drop("_pid", "_nf"))


def allocate_host_budget(hosts: DataFrame, total_budget: int,
                         floor: int = 1) -> DataFrame:
    """Largest-remainder split of ``total_budget`` fetch slots.

    ``hosts``: one row per host, columns (host:string, mass:long) with
    mass >= 0 — the host's aggregated priority (freshness × pending
    count, token mass, …). Returns (host, mass, alloc:long) with
    sum(alloc) == total_budget exactly, alloc >= floor per host, and
    alloc monotone in mass up to the ±1 remainder step. Ties in the
    fractional remainder break on host name, so the plan is a pure
    function of its inputs (the resume/replay invariant).

    Requires total_budget >= floor * n_hosts; raises otherwise rather
    than silently under-allocating (the caller should shrink the live
    host set or the floor — a policy decision). Also raises when
    remaining_budget × total_mass approaches 2^62: past that the
    exact-integer product the determinism guarantee rests on would
    overflow (ANSI) or silently round through the double cast —
    callers with byte/token-scale masses should pre-quantize to
    coarser units. An EMPTY hosts table yields an empty plan (there
    is nothing to allocate to, and a lazy plan cannot raise before an
    action) — the exact-sum invariant is scoped to non-empty inputs,
    so schedulers should treat an exhausted frontier upstream.
    """
    totals = hosts.agg(
        F.sum("mass").alias("_tot"),
        F.count(F.lit(1)).alias("_n"),
    )
    j = hosts.crossJoin(F.broadcast(totals))

    remaining = F.lit(int(total_budget)) - F.lit(int(floor)) * F.col("_n")
    # an all-zero-mass round degrades to equal shares (otherwise every
    # fractional remainder is 0 and the leftover L can exceed n,
    # breaking the exact-sum invariant)
    em = F.when(F.col("_tot") > 0, F.col("mass")).otherwise(F.lit(1))
    etot = F.when(F.col("_tot") > 0, F.col("_tot")).otherwise(F.col("_n"))
    # overflow sentinel, checked in doubles (the check itself must not
    # overflow): remaining*mass ≤ remaining*tot, so this bounds every
    # product the exactness guarantee depends on; ideal is gated on it
    # so ANSI never evaluates an overflowing multiply before the clean
    # raise_error below fires
    ovf = (remaining.cast("double") * etot.cast("double")
           >= F.lit(float(2 ** 62)))
    # exact-integer product, then ONE double division: the same
    # expression tree in any engine yields the same double, so the
    # floor/remainder split below can't diverge between replicas
    ideal = F.when(~ovf, (remaining * em).cast("double")
                   / etot.cast("double")).otherwise(F.lit(0.0))
    scored = j.select(
        "host", "mass",
        F.col("_n").alias("_nh"),
        F.floor(ideal).alias("_whole"),
        (ideal - F.floor(ideal)).alias("_frac"),
        remaining.alias("_rem"),
        ovf.alias("_ovf"),
    )

    ranked = _remainder_rank(scored)
    given = ranked.agg(F.sum("_whole").alias("_given"))
    w = ranked.crossJoin(F.broadcast(given))

    # leftover slots L = remaining - sum(floor(ideal)); 0 <= L < n
    alloc = (F.lit(int(floor)) + F.col("_whole")
             + F.when(F.col("_rank") <= (F.col("_rem") - F.col("_given")), 1)
                .otherwise(0))
    # loud infeasibility: checked inside the plan so the guard
    # distributes (no extra driver action) — a negative remaining
    # budget poisons every output row via raise_error
    guarded = F.when(
        F.col("_rem") < 0,
        F.raise_error(F.concat(
            F.lit("total_budget < floor * n_hosts ("),
            F.col("_nh").cast("string"), F.lit(" hosts)")))
    ).when(
        F.col("_ovf"),
        F.raise_error(F.lit(
            "remaining_budget x total_mass >= 2^62: exact-integer "
            "apportionment would overflow — pre-quantize masses to "
            "coarser units"))
    ).otherwise(alloc)
    return w.select("host", "mass", guarded.cast("long").alias("alloc"))
