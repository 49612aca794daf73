"""TrustRank (operators/trustrank.py) and snapshot diff
(tables/diff.py): serial replay, attenuation/starvation properties,
time-travel table diffs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_crawler_spark.operators.trustrank import trustrank
from news_crawler_spark.tables.diff import diff_summary, snapshot_diff, table_diff


def serial_trustrank(edges, seeds, iterations=3, d=85, scale=10**12):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    base = ((100 - d) * scale) // (100 * len(seeds))
    t = {n: (scale // len(seeds) if n in seeds else 0) for n in nodes}
    for _ in range(iterations):
        mass = {n: 0 for n in nodes}
        for s, dst in edges:
            mass[dst] += (t[s] * d) // (100 * out[s])
        t = {n: (base if n in seeds else 0) + mass[n] for n in nodes}
    return t


EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 2),
         # a link farm: 10..13 densely interlinked, no path from seeds
         (10, 11), (11, 12), (12, 13), (13, 10), (10, 12), (11, 13)]
SEEDS = {0, 1}


def _graph(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    s = spark.createDataFrame([(n,) for n in SEEDS], "node long")
    return e, s


def test_matches_serial_model(spark):
    e, s = _graph(spark)
    got = {r.node: r.trust_micro for r in trustrank(e, s, iterations=3).collect()}
    assert got == serial_trustrank(EDGES, SEEDS, 3)


def test_link_farm_starves_and_seeds_flagged(spark):
    e, s = _graph(spark)
    rows = {r.node: r for r in trustrank(e, s, iterations=3).collect()}
    assert all(rows[n].trust_micro == 0 for n in (10, 11, 12, 13))
    assert rows[2].trust_micro > 0  # reachable from both seeds
    assert rows[0].is_seed and rows[1].is_seed and not rows[2].is_seed


def test_out_of_graph_seed_keeps_its_teleport_mass(spark):
    e, _ = _graph(spark)
    s = spark.createDataFrame([(0,), (99,)], "node long")  # 99 unlinked
    rows = {r.node: r for r in trustrank(e, s, iterations=2).collect()}
    base = ((100 - 85) * 10**12) // (100 * 2)
    assert rows[99].trust_micro == base and rows[99].is_seed
    assert rows[0].trust_micro >= base  # in-graph seed gains in-mass too


def test_empty_seed_set_raises(spark):
    e, _ = _graph(spark)
    empty = e.sparkSession.createDataFrame([], "node long")
    with pytest.raises(ValueError, match="non-empty seed"):
        trustrank(e, empty)


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [("a", "d1"), ("b", "d2"), ("c", "d3")], "doc_id string, digest string")
    new = spark.createDataFrame(
        [("b", "d2"), ("c", "dX"), ("d", "d4")], "doc_id string, digest string")
    got = {r.doc_id: r.status for r in
           snapshot_diff(old, new, "doc_id").collect()}
    assert got == {"a": "removed", "b": "unchanged", "c": "changed",
                   "d": "added"}
    summary = {r.status: r.n for r in
               diff_summary(old, new, "doc_id").collect()}
    assert summary == {"removed": 1, "unchanged": 1, "changed": 1, "added": 1}


def test_snapshot_diff_null_digest_is_a_value_not_absence(spark):
    # flatten_text yields NULL digests for media-only docs: a key
    # present on both sides with one NULL digest is changed, not
    # added/removed; NULL on both sides is unchanged
    old = spark.createDataFrame(
        [("a", None), ("b", None), ("c", "d3")], "doc_id string, digest string")
    new = spark.createDataFrame(
        [("a", "dX"), ("b", None), ("d", None)], "doc_id string, digest string")
    got = {r.doc_id: r.status for r in
           snapshot_diff(old, new, "doc_id").collect()}
    assert got == {"a": "changed", "b": "unchanged", "c": "removed",
                   "d": "added"}


def test_table_diff_over_time_travel(spark, tmp_path):
    from pyspark.sql import types as T

    from news_crawler_spark.tables.snapshot import SnapshotTable

    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("text", T.StringType(), False)])
    tbl = SnapshotTable(spark, str(tmp_path), "docs", schema)
    v1 = tbl.append(spark.createDataFrame(
        [("a", "one"), ("b", "two")], schema))
    tbl.overwrite(spark.createDataFrame(
        [("a", "one"), ("b", "TWO"), ("c", "three")], schema))
    d = {r.doc_id: r.status for r in
         table_diff(tbl, v1, None, "doc_id",
                    F.sha2(F.col("text"), 256)).collect()}
    assert d == {"a": "unchanged", "b": "changed", "c": "added"}
