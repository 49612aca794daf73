"""The reference's end-to-end news job as one declarative plan.

``job()`` (reference ``main.py:27-68`` + ``news.py:126-163``) is:
today-filter (F1) → keyword any-match (F3) → sort published desc,
None last (L1) → first-wins dedup on link (D1) → head-limit (L2).

One DataFrame expression; Catalyst orders the cheap date filter before
the regex scan on its own (§4 predicate ordering). The serial
first-wins loop becomes the deterministic window-rank form with the
same tiebreaks the reference's stable sort implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def news_digest(items: DataFrame, keywords: list[str], today,
                limit: int = 10) -> DataFrame:
    """items(title, link, published:timestamp|null) → the digest rows,
    newest first, one per link, at most ``limit``."""
    kw_pattern = "(?i)(" + "|".join(keywords) + ")"
    filtered = (
        items
        .filter(F.to_date("published") == F.lit(today))       # F1
        .filter(F.col("title").rlike(kw_pattern))              # F3 (J2 semi)
    )
    # D1: first-wins per link under the L1 order (published desc,
    # nulls last, title tiebreak for determinism)
    order = [F.col("published").desc_nulls_last(), F.col("title").asc(),
             F.col("link").asc()]
    w = Window.partitionBy("link").orderBy(*order)
    deduped = (
        filtered.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).drop("_rn")
    )
    return deduped.orderBy(*order).limit(limit)              # L1 + L2
