"""Connected components over near-duplicate candidate pairs.

The missing last step of corpus dedup: LSH emits *pairs*, but the
keep/drop decision needs *clusters* (a near-dup of a near-dup is a
dup — transitive closure). At 100 TB the graph has ~10^10 edges, so
this is the alternating large-star / small-star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC 2014): each
phase is one groupBy + one join, and the alternation converges in
O(log n) rounds regardless of component diameter — unlike plain
min-label propagation, whose round count is the graph diameter.

Determinism: the component label is the minimum node id in the
component, so any engine (the DuckDB recursive-CTE oracle included)
reproduces the exact labels.

Scale notes:
- each iteration truncates lineage with an eager ``localCheckpoint``
  (swap for reliable ``checkpoint`` on a cluster). This is not
  optional hygiene: one star round references its input ~6 times
  (union + two join sides + aggregates), so without truncation the
  logical plan grows ~6× per iteration and Catalyst analysis goes
  exponential — iteration 5 spends minutes in the OPTIMIZER, not in
  tasks (measured here before the fix);
- convergence is detected by an O(1)-row aggregate (edge count +
  bit_xor of edge hashes), never a driver-side collect of edges;
- star-graph skew (one giant component ⇒ one hot root key) is the
  known worst case; AQE skew handling covers the join, and the
  groupBy side is a single min() partial-aggregated map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected canonical form: (big, small), no self-loops, distinct."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates()
    )


def _large_star(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u}).

    Output orientation is (src > dst) with no self-loops BY
    CONSTRUCTION: each emitted row is (dst, least(src, _mn)) under the
    ``dst > src`` filter, and least(src, _mn) <= src < dst — so the
    full ``_canon`` here reduces to a pure duplicate-elimination pass.
    ``dedup=False`` skips that exchange: the following small-star's
    groupBy-min is duplicate-insensitive and its own trailing
    ``_canon`` dedups the round's final edge set, so the edge SET (and
    the convergence digest, which is computed after that final canon)
    is identical either way. Used on small graphs, where one fewer
    aggregation exchange per round is a measurable share of the
    round's sequential stage-job latency; large graphs keep the dedup
    so duplicate (u, min) rows never fan through the next join."""
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = sym.groupBy("src").agg(F.min("dst").alias("_mn"))
    out = (
        sym.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"),
                F.least("src", "_mn").alias("dst"))
    )
    return out.dropDuplicates() if dedup else out


def _small_star(edges: DataFrame, canonical: bool = False) -> DataFrame:
    """Orient (big→small); connect u and its smaller neighbors to the min.

    ``canonical=True`` skips the input re-canonicalization (one
    dedup aggregation pass) when the caller guarantees ``edges`` is
    already (src > dst)-oriented with no self-loops — true for every
    ``_large_star`` output (duplicate rows are fine: the groupBy-min
    is duplicate-insensitive and the trailing ``_canon`` dedups)."""
    e = edges if canonical else _canon(edges)  # src > dst
    m = e.groupBy("src").agg(F.min("dst").alias("_mn"))
    with_min = e.join(m, "src")
    to_nbrs = with_min.select(F.col("dst").alias("src"), F.col("_mn").alias("dst"))
    to_self = m.select("src", F.col("_mn").alias("dst"))
    return _canon(to_nbrs.unionByName(to_self))


def _edge_digest(edges: DataFrame) -> tuple[int, int]:
    """O(1)-row convergence probe: (count, order-insensitive xor-hash).
    bit_xor, not sum — ANSI mode overflows summed xxhash64 longs."""
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).collect()[0]
    return row.n, row.h


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 50) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min id.

    Alternates large-star/small-star until the edge set is stable; at
    convergence the edge set is a star forest (u → component min).
    """
    from pyspark.sql import Observation

    def _ckpt_with_digest(df: DataFrame) -> tuple[DataFrame, tuple[int, int]]:
        """Eager localCheckpoint whose materialization job ALSO
        collects the convergence digest as an Observation — the
        separate _edge_digest action per round was one extra job of
        pure scheduling latency (the digest itself is O(1) rows)."""
        obs = Observation()
        out = df.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0))
            .alias("h"),
        ).localCheckpoint(eager=True)
        m = obs.get
        return out, (int(m["n"]), int(m["h"]))

    cur, digest = _ckpt_with_digest(
        _canon(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))))
    # DATA-ADAPTIVE codegen gate: each star round is a separate action,
    # so whole-stage codegen recompiles ~6 tiny stages per round — on
    # small graphs (bench/test scale) Janino compile time dominates the
    # actual work (measured ~25-50% of CC wall time at 5k edges). The
    # edge count is already known from the digest: below the threshold
    # run the loop interpreted (identical semantics, integer-only
    # expressions), above it keep codegen — at 10^9+ edges compiled
    # stages win by far. Restored in finally either way.
    spark = edges.sparkSession
    small_graph = digest[0] < 1_000_000
    prev_cg = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    converged = False
    try:
        if small_graph:
            spark.conf.set("spark.sql.codegen.wholeStage", "false")
        for _ in range(max_iter):
            # eager localCheckpoint every round — see module docstring;
            # _large_star output is canonical, so the small-star pass
            # skips its re-canonicalization aggregation
            nxt, nxt_digest = _ckpt_with_digest(
                _small_star(_large_star(cur, dedup=not small_graph),
                            canonical=True))
            cur = nxt
            if nxt_digest == digest:
                converged = True
                break
            digest = nxt_digest
    finally:
        if small_graph:
            spark.conf.set("spark.sql.codegen.wholeStage", prev_cg)
    if not converged:
        # an unconverged edge set is NOT a star forest: a node can
        # appear both as a root and as a member with different labels,
        # and an arbitrary-keep dedup would return silently
        # nondeterministic components. Fail loudly — O(log n) rounds
        # suffice for any practical graph, so this means max_iter was
        # set far too low for the input.
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} alternating star rounds (edge digest still "
            "changing) — raise max_iter")
    roots = cur.select(F.col("dst").alias("node"))
    members = cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    # groupBy-min instead of dropDuplicates(['node']): deterministic
    # label even if an input row pattern ever yields a node as both
    # root and member (belt-and-braces given the convergence check)
    return (
        roots.dropDuplicates()
        .withColumn("component", F.col("node"))
        .unionByName(members)
        .groupBy("node").agg(F.min("component").alias("component"))
    )


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id",
                   a_col: str = "id_a", b_col: str = "id_b") -> DataFrame:
    """Per-document dedup verdict from candidate pairs.

    Returns (doc_id, canon_id, cluster_size, is_canonical) for EVERY
    document — singletons are their own canon. This is the keep-list a
    training pipeline consumes: keep ``is_canonical``, drop the rest.
    """
    from pyspark.sql import Window

    cc = connected_components(pairs, src=a_col, dst=b_col)
    lab = (
        docs.select(id_col)
        .join(cc, F.col(id_col) == F.col("node"), "left")
        .select(F.col(id_col),
                F.coalesce("component", F.col(id_col)).alias("canon_id"))
    )
    # cluster_size as a count window over canon_id, NOT a
    # groupBy+join-back: the join form re-executed the whole docs⋈cc
    # label subtree on BOTH join sides (Spark has no common-subplan
    # reuse across join inputs) and paid two exchanges; the window
    # computes labels once behind a single canon_id exchange. Bonus:
    # consumers that drop cluster_size (training_pipeline keeps only
    # is_canonical) get the window pruned by Catalyst and skip the
    # exchange entirely, and consumers that re-window on canon_id
    # (cluster_quality_keep) reuse the partitioning.
    w = Window.partitionBy("canon_id")
    return (
        lab.select(
            id_col, "canon_id",
            F.count(F.lit(1)).over(w).alias("cluster_size"),
            (F.col(id_col) == F.col("canon_id")).alias("is_canonical"))
    )
