"""As-of join — the time-series join Spark lacks natively.

Implemented as the scalable union-window algorithm, NOT a range cross
join: tag both sides, union, and per key take the last reference row
at-or-before each probe row's time with ``last(..., ignorenulls)``
over an ordered window. One shuffle on the key, no row explosion —
the shape that survives 100 TB (a range join would be quadratic per
key; ``pd.merge_asof`` per group via applyInPandas is the fallback
only when the window order can't express the semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(probe: DataFrame, reference: DataFrame, key: str,
              probe_time: str, ref_time: str, value_cols: list[str],
              direction: str = "backward") -> DataFrame:
    """For each probe row, the reference row with the greatest
    ``ref_time`` <= ``probe_time`` on the same ``key`` (direction
    'backward'; 'forward' mirrors it). Reference must be unique per
    (key, ref_time) — pre-aggregate otherwise; ties would be
    nondeterministic in any engine.
    """
    asc = direction == "backward"
    p = probe.select(
        F.col(key).alias("_k"), F.col(probe_time).alias("_t"),
        F.lit(1).alias("_is_probe"), "*",
        *[F.lit(None).cast(reference.schema[c].dataType).alias(f"_v_{c}")
          for c in value_cols],
    )
    r = reference.select(
        F.col(key).alias("_k"), F.col(ref_time).alias("_t"),
        F.lit(0).alias("_is_probe"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in probe.schema.fields],
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    both = p.unionByName(r)
    order = [F.col("_t").asc() if asc else F.col("_t").desc(),
             F.col("_is_probe").asc()]  # ref row wins ties at equal time
    w = (Window.partitionBy("_k").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = both.select(
        "*", *[F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
               for c in value_cols],
    )
    return (
        filled.filter(F.col("_is_probe") == 1)
        .drop("_k", "_t", "_is_probe", *[f"_v_{c}" for c in value_cols])
    )
