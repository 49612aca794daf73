"""Top-k operators (reference L1-L4, ``news.py:151-163``).

The reference's "priority queue" is sort → first-wins dedup → limit;
the parallel forms here are the two that scale:

* per-group top-k: window rank with explicit tiebreaks (no global
  sort; each group ranks inside its shuffle partition),
* global top-k: ``orderBy().limit()`` which Catalyst executes as
  TakeOrderedAndProject — per-partition partial top-k, then a k-sized
  merge on the driver. Never a full global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(df: DataFrame, group_cols: list[str], order_cols: list,
                    k: int, rank_col: str = "rnk") -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def top_k_global(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    return df.orderBy(*order_cols).limit(k)


def global_row_number(df: DataFrame, key_col: str, out_col: str = "rn",
                      n_parts: int = 16) -> DataFrame:
    """Global 1-based row_number ordered by ``key_col`` WITHOUT any
    single-partition stage (the zipWithIndex algorithm, DataFrame-side).

    ``Window.orderBy(key)`` with no partitionBy funnels every row
    through one task — fine for per-round IOC batches, a scale-killer
    on big inputs. Two-phase instead: range-repartition on the key
    (partition i holds a contiguous key range, ranges ascend with
    partition id), row_number within each partition, then add
    per-partition cumulative offsets — the counts are one tiny
    driver-side collect (≤ n_parts rows, bounded by partition count,
    not data) folded into a literal map. The eager localCheckpoint
    pins the sampled range partitioning so the counts pass and the
    final pass see the same partition ids — localCheckpoint, not
    persist: a persist here leaked one pinned cache entry per call
    (RulesSink merges once per round), while checkpoint blocks are
    released by the ContextCleaner once the result is GC'd.

    Keys must be unique (caller dedups); result is the exact global
    rank in key order.
    """
    staged = (
        df.repartitionByRange(n_parts, F.col(key_col))
        .sortWithinPartitions(key_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        (r["_pid"], r["n"]) for r in
        staged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    w_local = Window.partitionBy("_pid").orderBy(F.col(key_col).asc())
    if offsets:
        off_map = F.create_map(
            *[F.lit(x) for pid_off in offsets.items() for x in pid_off])
        off = off_map[F.col("_pid")].cast("long")
    else:
        off = F.lit(0).cast("long")
    return (
        staged.withColumn("_lrn", F.row_number().over(w_local))
        .withColumn(out_col, off + F.col("_lrn"))
        .drop("_pid", "_lrn")
    )


def row_salt(salt_src: str, n_salts: int):
    """Deterministic row-level salt in [0, n_salts): sha2-derived so
    any SQL oracle replays it; the single definition both salted_agg
    and salted_join use. NULL salt_src values land in salt 0 — a NULL
    salt would silently unmatch join rows and split agg groups."""
    from pyspark.sql import functions as F

    h = F.pmod(
        F.conv(F.substring(F.sha2(F.col(salt_src).cast("string"), 256),
                           1, 8), 16, 10).cast("long"),
        F.lit(n_salts))
    return F.coalesce(h, F.lit(0).cast("long"))


def salted_agg(df, keys: list[str], value_col: str, salt_src: str,
               n_salts: int = 16):
    """Two-phase salted aggregation for skewed group keys.

    A plain groupBy on a power-law key (host, language, label) funnels
    the hottest key through one reducer. Phase 1 groups on
    (keys, salt) — the hot key fans out over ``n_salts`` reducers and
    partial sums/counts stay map-side combined; phase 2 merges the
    per-salt partials (tiny: |groups| x n_salts rows). Algebraic
    aggregates only (sum/count here; min/max compose the same way).

    ``salt_src`` is REQUIRED and must be a row-level column (a row id,
    url hash — anything with per-row variance): the salt derives from
    sha2 over it, deterministic so an oracle can replay the two-phase
    plan. A group-key-derived salt would be constant within the hot
    group — the exact funnel this function exists to prevent.
    """
    from pyspark.sql import functions as F

    if salt_src in keys:
        raise ValueError(
            "salt_src must be a row-level column, not a group key: a "
            "key-derived salt is constant within the hot group and the "
            "fan-out becomes a no-op")
    salt = row_salt(salt_src, n_salts)
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.sum(value_col).alias("_s"), F.count("*").alias("_n"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("_s").alias(f"sum_{value_col}"),
             F.sum("_n").alias("n"))
    )


def salted_join(big, small, key: str, salt_src: str, n_salts: int = 8,
                how: str = "inner"):
    """Skew-safe equi-join: the join-side twin of :func:`salted_agg`.

    A hash join on a power-law key funnels every row of the hot key
    through one task (AQE's skew split helps mid-shuffle but cannot
    split a single key's build side). This replicates the SMALL side
    once per salt (n_salts× a broadcast-scale table — cheap) and
    salts the BIG side from a row-level column, so the hot key's
    probe rows spread across ``n_salts`` tasks; each big row matches
    exactly one replica, so the result multiset equals the plain
    join's (the oracle runs the plain SQL join).

    ``salt_src`` must be a row-level big-side column (row id, url
    hash); sha2-derived so replays are deterministic, and NULL
    salt_src values salt to 0 (see :func:`row_salt`) so such rows
    still join — a NULL salt never equi-matches and would silently
    drop them. ``how``: 'inner' or 'left' (semantics preserved for
    both — a big row either matches its one replica or null-extends).
    """
    from pyspark.sql import functions as F

    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt_src == key:
        raise ValueError("salt_src must be row-level, not the join key")
    big_s = big.withColumn("_salt", row_salt(salt_src, n_salts))
    # sequence over BIGINT bounds so the exploded salt matches the
    # big side's long salt without casting the generator (casting a
    # generator expression is an analysis error)
    small_s = small.withColumn(
        "_salt", F.explode(F.expr(
            f"sequence(CAST(0 AS BIGINT), CAST({n_salts - 1} AS BIGINT))")))
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")


def salted_join_hot(big, small, key: str, freq_col: str, salt_src: str,
                    n_salts: int = 8, top_k: int = 1024,
                    how: str = "inner"):
    """Head/tail skew-safe equi-join: salt ONLY the hot keys.

    :func:`salted_join` replicates the whole small side ``n_salts``×
    — the right defense when the skew profile is unknown, but an
    unconditional fan-out of the count table (measured: +55% on
    lm_perplexity at sf0.1). When the small side carries each key's
    big-side frequency (``freq_col`` — true for the quality-family
    joins, whose count tables ARE the key frequencies), the Zipf head
    is identifiable in-plan: take the ``top_k`` keys by frequency
    (TakeOrderedAndProject — no global sort), broadcast-tag both
    sides, and salt just those keys. Replication drops to
    ``top_k × n_salts`` rows; the tail joins on salt 0 — effectively
    unsalted — but is skew-free by construction (any key hotter than
    the head's minimum frequency is IN the head). Single scan of the
    big side, one shuffle on (key, _salt); result multiset equals the
    plain join's, so SQL oracles replay the plain form.

    Ties at the boundary break on the key itself, so the head set is
    deterministic. ``how``: 'inner' or 'left' (a big row either
    matches its one salt replica or null-extends, same as
    :func:`salted_join`).
    """
    from pyspark.sql import functions as F

    if how not in ("inner", "left"):
        raise ValueError(f"salted_join_hot supports inner/left, got {how!r}")
    if salt_src == key:
        raise ValueError("salt_src must be row-level, not the join key")
    hot = (small
           .orderBy(F.col(freq_col).desc(), F.col(key))
           .limit(top_k)
           .select(key, F.lit(True).alias("_hot")))
    big_s = (
        big.join(F.broadcast(hot), key, "left")
        .withColumn("_salt",
                    F.when(F.col("_hot"), row_salt(salt_src, n_salts))
                    .otherwise(F.lit(0).cast("long")))
        .drop("_hot")
    )
    small_s = (
        small.join(F.broadcast(hot), key, "left")
        .withColumn(
            "_salt",
            F.explode(
                F.when(F.col("_hot"), F.expr(
                    f"sequence(CAST(0 AS BIGINT), "
                    f"CAST({n_salts - 1} AS BIGINT))"))
                .otherwise(F.array(F.lit(0).cast("long")))))
        .drop("_hot")
    )
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")
