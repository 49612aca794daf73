"""Product-quantization ANN (operators/pq.py): serial-model equality,
planted-duplicate recovery, and the zero-shuffle encode plan."""

from __future__ import annotations

import math

import pytest

from news_crawler_spark.operators.pq import (
    ivf_pq_topk,
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
    pq_topk,
)


def _round6(x: float) -> float:
    # HALF_UP like Spark/DuckDB round(x, 6)
    return math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0 else \
        -math.floor(-x * 1e6 + 0.5) / 1e6


def serial_pq(vectors: dict[int, list[float]], query_ids, m, ks, k):
    ids = sorted(vectors)
    dim = len(vectors[ids[0]])
    dsub = dim // m

    def sub(v, j):
        return v[j * dsub:(j + 1) * dsub]

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    cb = [[(sub(vectors[i], j), dot(sub(vectors[i], j), sub(vectors[i], j)))
           for i in ids[:ks]] for j in range(m)]

    def encode(v):
        out = []
        for j in range(m):
            scored = [( _round6(cc - 2 * dot(sub(v, j), cvec)), code)
                      for code, (cvec, cc) in enumerate(cb[j])]
            out.append(min(scored)[1])
        return out

    codes = {i: encode(v) for i, v in vectors.items()}
    results = {}
    for qid in query_ids:
        qv = vectors[qid]
        scored = []
        for nid, cd in codes.items():
            if nid == qid:
                continue
            acc = 0.0
            for j in range(m):
                cvec, cc = cb[j][cd[j]]
                qs = sub(qv, j)
                acc += _round6(dot(qs, qs) + cc - 2 * dot(qs, cvec))
            scored.append((_round6(acc), nid))
        scored.sort()
        results[qid] = [(n, d) for d, n in scored[:k]]
    return codes, results


def _vectors(n=40, dim=16, seed=3):
    import hashlib
    vs = {}
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (dim // 8)
        vs[i] = [(b / 255.0) * 2 - 1 for b in h[:dim]]
    return vs


def _df(spark, vectors):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sorted(vectors.items())],
        "vec_id long, embedding array<float>")


def test_matches_serial_model_exactly(spark):
    # float32 storage: quantize the fixture through float32 so the
    # serial model sees the same values the engine reads
    import numpy as np
    vs = {i: [float(np.float32(x)) for x in v]
          for i, v in _vectors().items()}
    df = _df(spark, vs)
    m, ks, k = 4, 8, 5
    cbs = pq_codebooks(df, m=m, ks=ks)
    codes = {r.id: list(r.codes) for r in pq_encode(df, cbs).collect()}
    got = pq_adc_topk(df.where("vec_id < 3"), pq_encode(df, cbs), cbs,
                      k=k).collect()
    exp_codes, exp_res = serial_pq(vs, [0, 1, 2], m, ks, k)
    assert codes == exp_codes
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rnk)):
        by_q.setdefault(r.query_id, []).append((r.neighbor_id, r.adist))
    assert by_q == exp_res


def test_planted_duplicate_is_nearest(spark):
    # an exact duplicate shares the query's codes, so it attains the
    # minimum possible ADC distance — the query's own per-subspace
    # reconstruction error (NOT zero: ADC is asymmetric by design)
    import numpy as np
    vs = {i: [float(np.float32(x)) for x in v]
          for i, v in _vectors(n=30).items()}
    vs[100] = list(vs[17])
    out = pq_topk(_df(spark, vs).where("vec_id = 100"),
                  _df(spark, vs), k=3).collect()
    top = min(out, key=lambda r: r.rnk)
    _, exp = serial_pq(vs, [100], 4, 8, 3)
    assert top.neighbor_id == 17
    assert (top.neighbor_id, top.adist) == exp[100][0]


def test_codes_are_compact_and_bounded(spark):
    df = _df(spark, _vectors())
    cbs = pq_codebooks(df, m=4, ks=8)
    rows = pq_encode(df, cbs).collect()
    assert all(len(r.codes) == 4 and all(0 <= c < 8 for c in r.codes)
               for r in rows)


def test_encode_plan_is_shuffle_free(spark):
    df = _df(spark, _vectors())
    cbs = pq_codebooks(df, m=4, ks=8)
    plan = pq_encode(df, cbs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    assert "Generate" in plan  # the barrier is load-bearing


def test_dim_not_divisible_raises(spark):
    df = _df(spark, _vectors(dim=16))
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks(df, m=3, ks=8)


def test_ivf_pq_full_probe_equals_flat(spark):
    """nprobe == n_centroids probes every cell, so the candidate set
    is the whole corpus and the composed IVF-PQ must equal the flat
    PQ search exactly (same adist, same ranking)."""
    import numpy as np
    vs = {i: [float(np.float32(x)) for x in v]
          for i, v in _vectors(n=40).items()}
    df = _df(spark, vs)
    qs = df.where("vec_id < 4")
    flat = sorted(map(tuple, pq_topk(qs, df, k=5).collect()))
    ivf = sorted(map(tuple, ivf_pq_topk(
        qs, df, k=5, n_centroids=8, nprobe=8).collect()))
    assert ivf == flat and len(ivf) == 4 * 5


def test_ivf_pq_candidates_respect_probed_cells(spark):
    """With nprobe < n_centroids every returned neighbor must live in
    one of its query's probed cells — the cell filter actually
    gates the ADC stage."""
    import numpy as np

    from news_crawler_spark.operators.similarity import ivf_assign
    from pyspark.sql import functions as F

    vs = {i: [float(np.float32(x)) for x in v]
          for i, v in _vectors(n=40).items()}
    df = _df(spark, vs)
    qs = df.where("vec_id < 4")
    centroids = (df.orderBy("vec_id").limit(8)
                 .select(F.col("vec_id").cast("int").alias("cell"),
                         F.col("embedding").alias("cvec")))
    ccell = {r.vec_id: r.cell
             for r in ivf_assign(df, centroids, nprobe=1).collect()}
    probed = {}
    for r in ivf_assign(qs, centroids, nprobe=2).collect():
        probed.setdefault(r.vec_id, set()).add(r.cell)
    out = ivf_pq_topk(qs, df, k=5, n_centroids=8, nprobe=2).collect()
    assert out, "probed cells produced no candidates"
    for r in out:
        assert ccell[r.neighbor_id] in probed[r.query_id], \
            (r.query_id, r.neighbor_id)


def test_ivf_pq_corpus_ships_only_id_cell_codes(spark):
    """Scale contract: the corpus side of the probe join is a single
    Project/Generate pass shipping (id, cell, codes) — no vector
    column crosses the join, and the ONLY hash-partition exchange in
    the whole query is the final per-query rank window."""
    import re

    from pyspark.sql import functions as F

    from news_crawler_spark.operators.similarity import ivf_assign

    df = _df(spark, _vectors(n=40))
    qs = df.where("vec_id < 4")
    plan = (ivf_pq_topk(qs, df, k=5, n_centroids=8, nprobe=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1  # rank window
    assert re.search(r"BroadcastHashJoin \[cell#\d+\], \[cell#\d+\]", plan)
    # the logical columns crossing the probe join are exactly
    # (id, cell, codes) — the vector dies at the encode projection
    # (the plan's Project lines truncate inside the literal codebook
    # array, so assert the DataFrame-level contract the join consumes)
    centroids = (df.orderBy("vec_id").limit(8)
                 .select(F.col("vec_id").cast("int").alias("cell"),
                         F.col("embedding").alias("cvec")))
    cbs = pq_codebooks(df, m=4, ks=8)
    corpus_side = pq_encode(ivf_assign(df, centroids, nprobe=1), cbs,
                            keep=("cell",))
    assert corpus_side.columns == ["id", "cell", "codes"]
    # and the corpus side reaches the join without any exchange: the
    # single hash exchange sits ABOVE the join (window side)
    join_pos = plan.index("BroadcastHashJoin")
    assert "Exchange hashpartitioning" not in plan[join_pos:]
