"""Host fetch-budget apportionment (crawl/budget.py): serial
largest-remainder replay, exact-sum invariant, floor, infeasibility."""

from __future__ import annotations

import math

import pytest
from pyspark.sql.utils import AnalysisException  # noqa: F401 (doc import)

from news_crawler_spark.crawl.budget import allocate_host_budget


def serial_alloc(masses: dict[str, int], budget: int, floor: int = 1):
    """Reference Hamilton apportionment, same float expression tree."""
    n = len(masses)
    rem = budget - floor * n
    tot = sum(masses.values())
    if tot == 0:  # equal shares when no host carries mass
        ideal = {h: (rem * 1) / n for h in masses}
    else:
        ideal = {h: (rem * m) / tot for h, m in masses.items()}
    whole = {h: math.floor(v) for h, v in ideal.items()}
    left = rem - sum(whole.values())
    order = sorted(masses, key=lambda h: (-(ideal[h] - whole[h]), h))
    return {h: floor + whole[h] + (1 if i < left else 0)
            for i, h in enumerate(order)}


CASES = [
    ({"a": 10, "b": 10, "c": 10}, 10, 1),          # even split + remainder
    ({"a": 97, "b": 3, "c": 0, "d": 1}, 1000, 1),  # heavy skew, zero mass
    ({"x": 1}, 7, 2),                              # single host
    ({f"h{i:03d}": (i * 37) % 101 for i in range(50)}, 1234, 1),
    ({"a": 0, "b": 0}, 5, 1),                      # all-zero mass
]


@pytest.mark.parametrize("masses,budget,floor", CASES)
def test_matches_serial_model_and_sums_exactly(spark, masses, budget, floor):
    df = spark.createDataFrame(list(masses.items()), "host string, mass long")
    got = {r.host: r.alloc for r in
           allocate_host_budget(df, budget, floor=floor).collect()}
    assert got == serial_alloc(masses, budget, floor)
    assert sum(got.values()) == budget
    assert all(v >= floor for v in got.values())


def test_monotone_up_to_remainder_step(spark):
    masses = {f"h{i}": i * i for i in range(1, 20)}
    df = spark.createDataFrame(list(masses.items()), "host string, mass long")
    got = {r.host: r.alloc for r in allocate_host_budget(df, 500).collect()}
    ordered = sorted(masses, key=masses.get)
    for lo, hi in zip(ordered, ordered[1:]):
        assert got[hi] >= got[lo] - 1  # ±1 is the Hamilton step


def test_infeasible_budget_raises(spark):
    df = spark.createDataFrame(
        [("a", 5), ("b", 5), ("c", 5)], "host string, mass long")
    with pytest.raises(Exception, match="total_budget < floor"):
        allocate_host_budget(df, 2, floor=1).collect()


def test_mass_scale_overflow_raises_cleanly(spark):
    # remaining x total_mass past 2^62 must fail with the pre-quantize
    # message, never an ANSI ArithmeticException from the raw multiply
    df = spark.createDataFrame(
        [("a", 10**13), ("b", 10**13)], "host string, mass long")
    with pytest.raises(Exception, match="pre-quantize"):
        allocate_host_budget(df, 1_000_000).collect()


def test_empty_hosts_yields_empty_plan(spark):
    df = spark.createDataFrame([], "host string, mass long")
    assert allocate_host_budget(df, 500).collect() == []


def test_no_single_partition_exchange(spark):
    df = spark.createDataFrame(
        [(f"h{i}", i) for i in range(100)], "host string, mass long")
    plan = allocate_host_budget(df, 1000)._jdf.queryExecution() \
        .executedPlan().toString()
    for i, ln in enumerate(lines := plan.splitlines()):
        if "Exchange SinglePartition" in ln:
            feeder = next((l for l in lines[i + 1:] if l.strip()), "")
            assert "partial_" in feeder, f"one-task funnel: {feeder.strip()}"
