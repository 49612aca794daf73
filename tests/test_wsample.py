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
