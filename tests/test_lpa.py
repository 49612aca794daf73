"""Label propagation (operators/lpa.py): serial replay, two-clique
separation, determinism under repartitioning."""

from __future__ import annotations

from collections import Counter

from news_crawler_spark.operators.lpa import community_sizes, label_propagation


def serial_lpa(edges, iterations=2):
    und = edges + [(b, a) for a, b in edges]
    nodes = sorted({s for s, _ in und})
    nbrs: dict = {}
    for s, d in und:
        nbrs.setdefault(s, []).append(d)
    lab = {n: n for n in nodes}
    for _ in range(iterations):
        new = {}
        for n in nodes:
            c = Counter(lab[m] for m in nbrs[n])
            best = max(c.values())
            new[n] = min(l for l, k in c.items() if k == best)
        lab = new
    return lab


# two 4-cliques joined by one bridge edge
CLIQUE_A = [(a, b) for a in range(4) for b in range(4) if a < b]
CLIQUE_B = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
EDGES = CLIQUE_A + CLIQUE_B + [(3, 10)]


def _e(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_matches_serial_model(spark):
    got = {r.node: r.label for r in
           label_propagation(_e(spark, EDGES), iterations=2).collect()}
    assert got == serial_lpa(EDGES, 2)


def test_cliques_separate_despite_bridge(spark):
    labels = label_propagation(_e(spark, EDGES), iterations=3)
    got = {r.node: r.label for r in labels.collect()}
    a_labels = {got[n] for n in range(4)}
    b_labels = {got[n] for n in range(10, 14)}
    assert len(a_labels) == 1 and len(b_labels) == 1
    assert a_labels != b_labels
    sizes = {r.label: r.size for r in
             community_sizes(labels).collect()}
    assert sorted(sizes.values(), reverse=True)[:2] == [4, 4]


def test_partitioning_invariance(spark):
    df = _e(spark, EDGES)
    one = {tuple(r) for r in
           label_propagation(df, iterations=2).collect()}
    other = {tuple(r) for r in
             label_propagation(df.repartition(7), iterations=2).collect()}
    assert one == other
