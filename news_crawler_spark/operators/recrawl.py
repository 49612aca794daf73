"""Adaptive recrawl scheduling from observed change history.

A crawl frontier at 10^10 URLs cannot afford a fixed refetch period:
pages that never change waste fetch budget, hot pages go stale. The
classic policy (Cho & Garcia-Molina 2003, "Estimating frequency of
change") models per-page changes as a Poisson process and estimates
the change rate from n fetches of which x observed a change with the
bias-corrected estimator

    r_hat = -ln((n - x + 0.5) / (n + 0.5))        [changes per fetch]

which stays finite even at x = n (every fetch saw a change). Divided
by the mean observed fetch gap it becomes changes/second, and the
next recrawl interval is ``clamp(1 / rate, min_interval,
max_interval)`` — exactly the ``not_before`` input the frontier's
freshness-decay priority (crawl/frontier.py) consumes.

Scale shape: ONE map-side-combinable groupBy over the fetch log —
count / sum / min / max partials — no window, no join, no Python.
The fetch log is the crawl engine's own resolved table; at 100 TB of
history the aggregation shuffles one row per URL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recrawl_intervals(history: DataFrame, id_col: str = "url_id",
                      sec_col: str = "fetch_sec",
                      changed_col: str = "changed",
                      min_interval: float = 3600.0,
                      max_interval: float = 604800.0) -> DataFrame:
    """Per-URL change-rate estimate and next recrawl interval.

    ``history`` rows are fetch observations: ``(id_col, sec_col``
    (epoch seconds), ``changed_col`` (bool — this fetch saw new
    content)). Returns ``(id_col, n_fetches, n_changes, change_rate,
    next_interval_sec)``; ``change_rate`` (changes/sec, 9 dp) is NULL
    — and the interval defaults to ``max_interval`` — when the rate
    is inestimable: a single fetch, a zero observation span, or zero
    observed changes (never-seen-to-change pages are crawled least
    often, the Cho policy's cold branch).

    Determinism: the interval is computed as ``1.0 / (r_hat /
    avg_gap)`` — the oracle must replay the same expression SHAPE
    (not the algebraically-equal ``avg_gap / r_hat``), because the
    two differ in floating-point rounding.
    """
    agg = history.groupBy(id_col).agg(
        F.count("*").alias("n_fetches"),
        F.sum(F.col(changed_col).cast("long")).alias("n_changes"),
        F.max(sec_col).alias("_mx"),
        F.min(sec_col).alias("_mn"),
    )
    n, x = F.col("n_fetches"), F.col("n_changes")
    span = (F.col("_mx") - F.col("_mn")).cast("double")
    estimable = (n > 1) & (span > 0) & (x > 0)
    avg_gap = span / (n - 1).cast("double")
    r_hat = -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5)))
    rate = r_hat / avg_gap
    interval = F.lit(1.0) / rate
    return agg.select(
        id_col, "n_fetches", "n_changes",
        F.when(estimable, F.round(rate, 9)).alias("change_rate"),
        F.round(
            F.when(
                estimable,
                F.least(F.greatest(interval, F.lit(float(min_interval))),
                        F.lit(float(max_interval))))
            .otherwise(F.lit(float(max_interval))), 6)
        .alias("next_interval_sec"),
    )
