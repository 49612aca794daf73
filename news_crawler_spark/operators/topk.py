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
