"""Mergeable distinct-count sketches (HyperLogLog) as native-op algebra.

The reference has no sketch layer (its dedup is an in-memory Python
set, ``scheduler.py``); at 100 TB a pipeline needs cardinality
estimates that are (a) one shuffle, (b) mergeable across segments,
(c) cheap to store. This module implements HyperLogLog [Flajolet et
al. 2007] as a pure DataFrame composition — no UDF, whole-stage
codegen end to end — with two deliberate design choices:

1. **Deterministic, oracle-replayable hashing.** The 60-bit register
   hash derives from ``sha2`` hex substrings (the engine-wide trick,
   see operators/dedup.py), so DuckDB replays the entire sketch via
   ``('0x' || substr(sha256(x), 1, 15))::BIGINT`` and the driver's
   value-hash check covers a *sketch*, not just its API shape.
   (One caveat: the linear-counting branch uses ``ln``, which JVM and
   libm each compute to ~1 ulp, not correctly rounded — a divergence
   requires the estimate to land within an ulp of an x.5 boundary
   before the final integer round; the register table and all sums
   are exact regardless.)
2. **Exact integer register sums.** The harmonic mean Σ 2^-ρ is the
   classic float-nondeterminism trap: double addition is
   order-sensitive and Spark's partition order is not DuckDB's scan
   order. Instead each term is scaled to the exact integer
   ``2^(suffix_bits+1-ρ)`` (ρ ≤ suffix_bits+1, so every term and the
   whole sum fit a BIGINT: m·2^(suffix+1) = 2^61 < 2^63) and summed
   exactly; floats appear only in the final per-group estimate, which
   is a fixed sequence of correctly-rounded IEEE ops on identical
   integer inputs in both engines.

Scale shape: ``hll_registers`` is one groupBy on (group, bucket) with
a map-side-combinable ``max`` — each input row shuffles at most one
(bucket, ρ) pair per group, and the register table is ≤ m rows per
group regardless of input size. Registers are the *mergeable* state:
union two segments' register tables and re-run ``max`` to sketch the
union without re-reading data (tested in test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_BITS = 60  # 15 hex chars of sha256 → fits BIGINT in both engines


def _alpha(m: int) -> float:
    """Bias-correction constant α_m (Flajolet et al. 2007, fig. 3)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, value_col: str,
                  group_cols: list[str] | None = None,
                  p: int = 12) -> DataFrame:
    """Per-group HLL register table: (group..., bucket, r).

    bucket = top ``p`` bits of the 60-bit sha2-derived hash; r is the
    max over the group of ρ = 1-indexed position of the leftmost
    1-bit in the (60-p)-bit suffix (suffix 0 → ρ = suffix_bits + 1).
    ρ computes exactly via ``length(bin(suffix))`` — no float log2,
    whose last-ulp behaviour differs between JVM and C math libs.
    """
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    groups = list(group_cols or [])
    suffix_bits = HASH_BITS - p
    h = (F.conv(F.substring(F.sha2(F.col(value_col).cast("string"), 256),
                            1, 15), 16, 10).cast("long"))
    bucket = F.shiftright(h, suffix_bits)
    suffix = h.bitwiseAND(F.lit((1 << suffix_bits) - 1))
    rho = F.when(suffix == 0, F.lit(suffix_bits + 1)).otherwise(
        F.lit(suffix_bits) - F.length(F.bin(suffix)) + 1)
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*groups, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(registers: DataFrame,
                 group_cols: list[str] | None = None,
                 p: int = 12, out_col: str = "ndv_hll") -> DataFrame:
    """Collapse a register table to one estimate row per group.

    Raw estimator α_m·m²/Σ2^-ρ with the small-range linear-counting
    correction (E ≤ 2.5m and empty registers exist → m·ln(m/V));
    the HLL++ mid-range bias table is intentionally omitted (raw HLL,
    σ ≈ 1.04/√m — ~1.6% at p=12). The Σ is exact BIGINT arithmetic
    (module docstring), so the raw-branch estimate is a fixed IEEE op
    sequence on identical integers in every engine; the linear-count
    branch carries the ~1-ulp ``ln`` caveat noted in the module
    docstring.
    """
    groups = list(group_cols or [])
    m = 1 << p
    suffix_bits = HASH_BITS - p
    s_exp = suffix_bits + 1  # scale: term = 2^(s_exp - rho), empty = 2^s_exp
    per_group = registers.groupBy(*groups).agg(
        F.count("*").alias("_nreg"),
        # coalesce: an UNGROUPED estimate over an empty register table
        # still emits one row (global groupBy), and sum-over-nothing is
        # NULL — 0 here flows to zeros=m → linear count m·ln(m/m) = 0,
        # the correct empty-input answer instead of a NULL estimate
        F.coalesce(
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {s_exp} - r)")),
            F.lit(0).cast("long"),
        ).alias("_s_obs"),
    )
    s_total = (F.col("_s_obs")
               + (F.lit(m) - F.col("_nreg")) * F.lit(1 << s_exp))
    zeros = (F.lit(m) - F.col("_nreg")).cast("double")
    e_raw = (F.lit(_alpha(m) * m * m * float(1 << s_exp))
             / s_total.cast("double"))
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(e_raw)
    return per_group.select(
        *groups, F.round(est, 0).cast("long").alias(out_col))


def hll_count_distinct(df: DataFrame, value_col: str,
                       group_cols: list[str] | None = None,
                       p: int = 12, out_col: str = "ndv_hll") -> DataFrame:
    """One-call sketch: registers + estimate (see the two stages)."""
    return hll_estimate(hll_registers(df, value_col, group_cols, p),
                        group_cols, p, out_col)


def histogram_counts(df: DataFrame, value_col: str,
                     group_cols: list[str] | None = None,
                     lo: float = 0.0, hi: float = 1.0,
                     n_bins: int = 64) -> DataFrame:
    """Fixed-bin histogram: (group..., bin, cnt) — the mergeable
    quantile/distribution state (merge = sum matching bins). Out-of-
    range values clamp into the edge bins (documented estimator bias
    at the extremes; pick [lo, hi) from domain knowledge or a first
    min/max pass). The bin index is floor((v-lo)/width) — a fixed
    IEEE double op sequence, so engines agree bit-for-bit."""
    if n_bins < 2 or not hi > lo:
        raise ValueError(f"need n_bins >= 2 and hi > lo, got "
                         f"{n_bins}, [{lo}, {hi})")
    groups = list(group_cols or [])
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*groups, b.alias("bin"))
        .groupBy(*groups, "bin").agg(F.count("*").alias("cnt"))
    )


def histogram_quantiles(hist: DataFrame, percents: list[int],
                        group_cols: list[str] | None = None,
                        lo: float = 0.0, hi: float = 1.0,
                        n_bins: int = 64) -> DataFrame:
    """Per-group quantile estimates from a histogram_counts table:
    for each integer percent p, the LEFT EDGE of the first bin whose
    cumulative count reaches ceil(p·N/100) — thresholds are pure
    integer arithmetic ((p·N + 99) div 100), so the selected bin is
    engine-exact; only the final edge value is a float. Estimate
    error ≤ one bin width, the classic mergeable-histogram bound.

    The window/cumsum here runs over the AGGREGATED histogram
    (≤ n_bins rows per group), not the data — per-group sequential
    work is O(n_bins) regardless of input size."""
    from pyspark.sql import Window

    groups = list(group_cols or [])
    width = (hi - lo) / n_bins
    w = (Window.partitionBy(*groups).orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, 0))
    wn = Window.partitionBy(*groups)
    cum = (hist
           .withColumn("cum", F.sum("cnt").over(w))
           .withColumn("n", F.sum("cnt").over(wn)))
    p = F.explode(F.array(*[F.lit(int(x)) for x in percents])).alias("pct")
    return (
        cum.select(*groups, "bin", "cum", "n", p)
        .where(F.col("cum") >= F.expr("(pct * n + 99) div 100"))
        .groupBy(*groups, "pct")
        .agg(F.min("bin").alias("_b"),
             F.max("n").alias("n"))
        .select(*groups, "pct", "n",
                (F.lit(lo) + F.col("_b") * F.lit(width)).alias("est"))
    )


def _cms_col(value: F.Column, i: F.Column, w: int) -> F.Column:
    """Row-i counter column for ``value``: 60-bit sha2-substring hash
    of "i|value" mod width. Non-negative (h < 2^60), so pmod == DuckDB
    ``%`` — both engines land on the same counter."""
    digest = F.sha2(F.concat(i.cast("string"), F.lit("|"), value), 256)
    h = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(w))


def cms_counters(df: DataFrame, value_col: str, d: int = 4,
                 w: int = 2048, weight_col: str | None = None) -> DataFrame:
    """Count-min sketch [Cormode & Muthukrishnan 2005] counter table:
    (i, col, cnt) with d·w cells total, regardless of input size.

    Scale shape: each input row fans to d (i, col) pairs (one
    Generate) and the counters come from a single map-side-combinable
    groupBy — the partial agg caps the shuffle at ≤ d·w cells per
    input partition however large the input, and two segments'
    sketches merge by summing matching cells (the whole point:
    frequency state that ships in KB). Deterministic sha2 hashing, so
    a SQL oracle rebuilds the identical table.

    ``weight_col``: weighted insert — pass a pre-aggregated
    (value, count) table to fold counts in without re-streaming the
    raw rows (cell values are identical to raw insertion; standard
    CMS practice when an aggregate already exists upstream).
    """
    if d < 1 or w < 8:
        raise ValueError(f"need d >= 1, w >= 8, got d={d}, w={w}")
    v = F.col("_v")
    base = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(value_col).cast("string").alias("_v"),
                *( [F.col(weight_col).cast("long").alias("_wt")]
                   if weight_col else [] ))
        .select("_v", *(["_wt"] if weight_col else []),
                F.explode(F.expr(f"sequence(0, {d - 1})")).alias("i"))
        .select(*(["_wt"] if weight_col else []),
                "i", _cms_col(v, F.col("i"), w).alias("col"))
    )
    agg = F.sum("_wt") if weight_col else F.count("*")
    return base.groupBy("i", "col").agg(agg.alias("cnt"))


def cms_lookup(counters: DataFrame, queries: DataFrame, value_col: str,
               d: int = 4, w: int = 2048,
               out_col: str = "cms_est") -> DataFrame:
    """Point-frequency estimates for ``queries``: min over the d
    counters each query item hashes to. Never underestimates; the
    overcount is bounded by collisions (≈ e·N/w with prob 1-e^-d).
    The probe is a broadcast-sized equi-join on (i, col) against the
    ≤ d·w-row counter table — no pass over the original data.

    ``queries`` rows must be distinct (the result groups by all query
    columns, so duplicates collapse to one output row); a query
    column named i/col/cnt is fine — the counter side is renamed to
    reserved names before the join.
    """
    cnt = counters.select(F.col("i").alias("_cms_i"),
                          F.col("col").alias("_cms_col"),
                          F.col("cnt").alias("_cms_cnt"))
    probes = (
        queries
        .withColumn("_cms_qi", F.explode(F.expr(f"sequence(0, {d - 1})")))
        .withColumn("_cms_qcol",
                    _cms_col(F.col(value_col).cast("string"),
                             F.col("_cms_qi"), w))
    )
    joined = probes.join(
        cnt,
        (probes["_cms_qi"] == cnt["_cms_i"])
        & (probes["_cms_qcol"] == cnt["_cms_col"]),
        "left")
    return (
        joined
        .groupBy(*queries.columns)
        .agg(F.min(F.coalesce(F.col("_cms_cnt"), F.lit(0))).alias(out_col))
    )
