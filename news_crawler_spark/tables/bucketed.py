"""Bucketed state tables: the shuffle-free join layout for 10^10 scale.

SURVEY.md §4/§7: the scale-critical joins (pending ⟂ resolved,
candidates ⟂ frontier) hash on ``url_hash``; if both sides are
bucketed by ``url_hash`` into the same bucket count, Spark's
bucketed-scan join needs NO Exchange on either side — the join is
co-located by layout. This module materializes snapshot-table data as
bucketed managed tables (local spark-warehouse in the sandbox, a real
catalog on a cluster) and is the layout the engine's tables adopt
when rounds get large enough that shuffle dominates.

tests/test_plans.py::test_bucketed_join_has_no_exchange proves the
plan property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, table_name: str, bucket_col: str = "url_hash",
                  n_buckets: int = 32, sort_col: str | None = None) -> None:
    """Materialize as a bucketed (optionally sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two identically-bucketed tables — planner skips the
    shuffle when both sides' bucketing matches the join keys."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
