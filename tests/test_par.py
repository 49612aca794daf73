"""spread_scan: the small-input parallelism guard (operators/par.py)."""

import pytest
from pyspark.sql import functions as F

from news_crawler_spark.operators.par import spread_scan


@pytest.fixture(scope="module")
def spark():
    from news_crawler_spark.session import get_spark

    return get_spark("test-par", cpus=4, shuffle_partitions=4)


def test_widens_narrow_input_preserving_rows(spark):
    df = spark.range(1000).coalesce(1).select(
        F.col("id"), (F.col("id") % 7).alias("k"))
    out = spread_scan(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # row multiset unchanged
    assert out.count() == 1000
    assert (out.agg(F.bit_xor(F.xxhash64("id", "k"))).collect()[0][0]
            == df.agg(F.bit_xor(F.xxhash64("id", "k"))).collect()[0][0])


def test_noop_on_wide_input(spark):
    p = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(p + 3)
    out = spread_scan(df)
    # already wide: returned untouched (same plan object, no new node)
    assert out is df


def test_deterministic_placement(spark):
    """Round-robin repartition sorts before placing (SPARK-23207), so
    the same input lands identically across runs — per-partition
    digests must be stable."""
    df = spark.range(500).coalesce(1)

    def layout():
        return sorted(
            spread_scan(df)
            .select(F.spark_partition_id().alias("p"), "id")
            .groupBy("p").agg(F.bit_xor(F.xxhash64("id")).alias("h"))
            .collect())

    assert layout() == layout()
