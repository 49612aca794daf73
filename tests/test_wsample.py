"""A-ES weighted sampling without replacement (operators/wsample.py):
serial replay, weight dominance, zero-weight exclusion."""

from __future__ import annotations

import hashlib

from news_crawler_spark.operators.wsample import weighted_sample_k


def serial_es(rows: dict[str, int], k: int, seed: str = "es"):
    def key(i, w):
        h = hashlib.sha256(f"{seed}|{i}".encode()).hexdigest()
        u = int(h[:15], 16) / float(1 << 60)
        return round(u ** (1.0 / w), 12)

    keyed = sorted(((key(i, w), i) for i, w in rows.items() if w > 0),
                   key=lambda t: (-t[0], t[1]))
    return [(i, kk) for kk, i in keyed[:k]]


ROWS = {f"d{i:03d}": (i * 7) % 50 + 1 for i in range(60)}


def _df(spark, rows):
    return spark.createDataFrame(list(rows.items()), "id string, w long")


def test_matches_serial_model(spark):
    got = [(r.id, r.es_key) for r in
           weighted_sample_k(_df(spark, ROWS), "w", 10, "id").collect()]
    assert got == serial_es(ROWS, 10)


def test_huge_weight_dominates_and_zero_excluded(spark):
    rows = dict(ROWS)
    rows["whale"] = 10**9
    rows["dead"] = 0
    got = [r.id for r in
           weighted_sample_k(_df(spark, rows), "w", 5, "id").collect()]
    assert got[0] == "whale"  # u^(1e-9) ~ 1 beats every small weight
    assert "dead" not in got


def test_sample_is_seed_keyed(spark):
    a = [r.id for r in
         weighted_sample_k(_df(spark, ROWS), "w", 10, "id").collect()]
    b = [r.id for r in
         weighted_sample_k(_df(spark, ROWS), "w", 10, "id",
                           seed="other").collect()]
    assert a != b  # different seed, different sample
    assert a == [r.id for r in
                 weighted_sample_k(_df(spark, ROWS), "w", 10,
                                   "id").collect()]  # same seed stable


def serial_stratified(rows: dict[str, tuple[str, int]], total_k: int,
                      floor: int, seed: str = "es"):
    """rows: id -> (group, weight). Largest-remainder allocation over
    integer group masses, then per-group A-ES top-alloc."""
    import math

    masses: dict[str, int] = {}
    for _, (g, w) in rows.items():
        if w > 0:
            masses[g] = masses.get(g, 0) + w
    tot, n = sum(masses.values()), len(masses)
    rem = total_k - floor * n
    ideal = {g: rem * m / tot for g, m in masses.items()}
    alloc = {g: floor + math.floor(v) for g, v in ideal.items()}
    leftover = rem - sum(math.floor(v) for v in ideal.values())
    order = sorted(masses, key=lambda g: (-(ideal[g] - math.floor(ideal[g])), g))
    for g in order[:leftover]:
        alloc[g] += 1

    def key(i, w):
        h = hashlib.sha256(f"{seed}|{i}".encode()).hexdigest()
        u = int(h[:15], 16) / float(1 << 60)
        return round(u ** (1.0 / w), 12)

    out = []
    for g in masses:
        members = sorted(((key(i, w), i) for i, (gg, w) in rows.items()
                          if gg == g and w > 0),
                         key=lambda t: (-t[0], t[1]))
        for rnk, (kk, i) in enumerate(members[:alloc[g]], 1):
            out.append((g, i, rows[i][1], kk, rnk, alloc[g]))
    return sorted(out)


def test_stratified_budget_sample_matches_serial(spark):
    """Allocation (largest remainder, floor) AND per-group membership
    must replay the serial model exactly — including an under-filled
    stratum that returns every row it has."""
    from news_crawler_spark.operators.wsample import (
        stratified_budget_sample,
    )

    rows = {f"d{i:03d}": (f"g{i % 4}", (i * 7) % 50 + 1)
            for i in range(80)}
    rows["tiny1"] = ("gtiny", 5)   # stratum with 2 rows
    rows["tiny2"] = ("gtiny", 3)
    rows["zeroed"] = ("g0", 0)     # excluded everywhere

    df = spark.createDataFrame(
        [(i, g, w) for i, (g, w) in rows.items()],
        "id string, grp string, w long")
    got = sorted(
        (r.grp, r.id, r.w, r.es_key, r.rnk, r.alloc)
        for r in stratified_budget_sample(
            df, group_col="grp", weight_col="w", total_k=40,
            id_col="id", floor=2, quantize=1).collect())
    want = serial_stratified(rows, total_k=40, floor=2)
    assert got == want
    # the global budget: gtiny has only 2 rows — if its alloc exceeds
    # 2 the output under-fills by exactly the shortfall
    per_group_alloc = {g: a for g, _, _, _, _, a in want}
    expected = sum(min(a, sum(1 for i, (gg, w) in rows.items()
                              if gg == g and w > 0))
                   for g, a in per_group_alloc.items())
    assert len(got) == expected
    assert sum(per_group_alloc.values()) == 40
