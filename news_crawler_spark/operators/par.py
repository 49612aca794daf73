"""Scan-parallelism guard for compute-heavy single-pass operators.

A parquet file is splittable only at row-group boundaries, so a small
input (one row group) plans as ONE scan partition — and an operator
whose expensive work (tokenize, explode, hash, fold) happens before
its first exchange then runs single-threaded no matter how many cores
the session has. At cluster scale inputs span thousands of row
groups and this module is a no-op; at bench/test scale it restores
the parallelism the guide's partial-aggregation shapes assume.

``spread_scan`` is deliberately conservative: a keyless round-robin
repartition (deterministic row placement — Spark sorts before
round-robin repartition, SPARK-23207) applied ONLY when the input has
fewer partitions than the session's default parallelism. Callers must
only use it where results are partition-invariant: exact-integer
aggregates (min/count/sum of longs), per-row projections, or
aggregations whose float accumulation order is confined to one row or
one document (explode keeps a document's rows contiguous in one
partition, and documents are never split by a row-wise repartition of
the pre-explode table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism iff it currently has fewer partitions — a no-op on
    any input already wide enough (every real cluster scan)."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    return df.repartition(p)
