"""Range (interval-containment) join, bucket-decomposed for scale.

Spark has no native range join: a bare ``p.ts >= i.start AND
p.ts < i.end`` predicate plans as BroadcastNestedLoopJoin (or a
cartesian product) — O(points × intervals) comparisons, a scale
killer the moment the intervals side outgrows a broadcast.

The classic fix (Databricks' range-join "bin" optimization, DuckDB/
kdb interval indexes — same idea everywhere): decompose time into
fixed-width buckets, explode each interval onto every bucket it
overlaps, bucket each point once, equi-join on the bucket id, then
apply the exact containment predicate as a post-filter. One shuffle
on the bucket key; comparisons drop to O(matches + interval_spans).

Bucket width trades explode fan-out (long intervals → many rows)
against post-filter selectivity (wide buckets → more false pairs);
set it near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_bucketed(points: DataFrame, intervals: DataFrame,
                           p_sec: str = "p_sec", s_sec: str = "s_sec",
                           e_sec: str = "e_sec",
                           bucket_sec: int = 600) -> DataFrame:
    """Join point rows to interval rows with ``s <= p < e`` semantics.

    ``points`` carries an epoch-seconds column ``p_sec``; ``intervals``
    carry ``s_sec``/``e_sec`` (half-open). All other columns pass
    through. A point lands in exactly one bucket and an interval's
    bucket list is distinct, so the bucket equi-join cannot duplicate
    a (point, interval) pair — no dedup pass needed.

    Empty/inverted intervals (``e_sec <= s_sec``) are dropped up
    front: a half-open interval with ``e <= s`` can never contain a
    point, so the filter is semantics-preserving — and without it a
    single corrupt inverted interval makes ``sequence(floor(s/b),
    floor((e-1)/b))`` auto-generate a DESCENDING bucket list, exploding
    O(span) junk rows into the join input (the post-filter would still
    reject them, but only after paying for the blowup).
    """
    b = F.lit(bucket_sec)
    pb = points.withColumn("_bk", F.floor(F.col(p_sec) / b))
    intervals = intervals.filter(F.col(e_sec) > F.col(s_sec))
    ib = intervals.withColumn(
        "_bk",
        F.explode(F.sequence(F.floor(F.col(s_sec) / b),
                             F.floor((F.col(e_sec) - 1) / b))),
    )
    return (
        pb.join(ib, "_bk")
        .filter((F.col(p_sec) >= F.col(s_sec)) & (F.col(p_sec) < F.col(e_sec)))
        .drop("_bk")
    )
