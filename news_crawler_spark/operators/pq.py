"""Product-quantization ANN (Jégou et al. 2011): the compression half
of the IVF-PQ index every billion-vector system runs.

The corpus never ships full vectors past the encode step: each
embedding becomes ``m`` small integer codes (here 4 × 3 bits — at
100 TB that is the difference between shuffling/scanning 256 B/vector
and 4-16 B/vector), and search scores queries against CODES via
asymmetric distance computation (ADC) — per subspace, the distance
from the query's subvector to the corpus row's assigned codeword,
summed. :func:`ivf_pq_topk` is the composed full IVF-PQ shape (cell
filter first via ``similarity.ivf_assign``, ADC only inside probed
cells); :func:`pq_topk` is the flat variant, and the encode/search
halves stay independently reusable.

Engine shape, same contract as ivf_assign (operators/similarity.py):

* codebooks are tiny by construction (m × ks codewords) → column
  LITERALS; encode is Project/Generate only — ZERO joins/shuffles of
  the corpus (plan-asserted in tests/test_pq.py);
* determinism: every per-subspace distance is rounded (6 dp) before
  any argmin/ordering, ties break on code/neighbor id, and the
  codeword self-dot is precomputed driver-side with the same
  left-fold order as the engine-side dot — so a SQL oracle replays
  assignments and rankings value-exactly;
* the row-constant ``||x_sub||²`` term is OMITTED from the encode
  argmin (it shifts every codeword's distance equally) — fewer
  interpreted HOF ops and one less place for rounding to diverge;
* per-row subvector slices and casts are staged behind a Generate
  barrier (explode of a 1-element array) so CollapseProject cannot
  re-inline the O(dim) work into every codeword comparison (the
  HOF-recompute trap — documented at similarity.ivf_assign, which
  hit it first).

Reference: the reference repo has no vector search at all; this is
part of the beyond-reference similarity family (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Strict left-fold dot product — index order, so any engine that
    sums a zipped list sequentially reproduces the exact double."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _dot_sql(a: str, b: str) -> str:
    """SQL text of :func:`_dot` — the hot builders below assemble
    whole scoring expressions as ONE string for a single F.expr parse
    (the Column-API form cost thousands of py4j round trips of pure
    driver latency per query; the parsed trees are identical)."""
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
            "0.0D, (acc, v) -> acc + v)")


def _codebook_sql(book, with_code: bool) -> str:
    """SQL literal text for one subspace's codebook array."""
    from news_crawler_spark.operators.similarity import (
        _sql_double,
        _sql_double_array,
    )

    parts = []
    for code, (cvec, cc) in enumerate(book):
        fields = (f"'code',{code}," if with_code else "") + (
            f"'cvec',{_sql_double_array(cvec)},'cc',{_sql_double(cc)}")
        parts.append(f"named_struct({fields})")
    return "array(" + ",".join(parts) + ")"


def pq_codebooks(corpus: DataFrame, m: int = 4, ks: int = 8,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> list[list[tuple[list[float], float]]]:
    """Deterministic codebooks: subspace j's codewords are the j-th
    subvectors of the first ``ks`` corpus vectors (id order) — the
    same replayable-training trick ivf_assign uses for centroids (a
    k-means refinement would drop in via kmeans_fit without changing
    the encode/search contract). Returns cb[j][code] = (cvec, cc)
    with cc = <cvec, cvec> accumulated in index order."""
    rows = (corpus.select(id_col, vec_col).orderBy(id_col).limit(ks)
            .collect())
    return _codebooks_from_rows(rows, m, ks, vec_col)


def _codebooks_from_rows(rows, m: int, ks: int,
                         vec_col: str) -> list[list[tuple[list[float], float]]]:
    """Codebooks from already-collected head rows — lets ivf_pq_topk
    fetch the corpus head ONCE for both centroids and codebooks."""
    if len(rows) < ks:
        raise ValueError(f"corpus has {len(rows)} rows < ks={ks}")
    rows = rows[:ks]
    dim = len(rows[0][vec_col])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    cbs: list[list[tuple[list[float], float]]] = []
    for j in range(m):
        book = []
        for r in rows:
            cvec = [float(x) for x in r[vec_col][j * dsub:(j + 1) * dsub]]
            cc = 0.0
            for x in cvec:
                cc += x * x
            book.append((cvec, cc))
        cbs.append(book)
    return cbs


def _stage_subs(df: DataFrame, vec_col: str, m: int, dsub: int,
                out: str) -> DataFrame:
    """Cast to double and pre-slice the m subvectors ONCE per row,
    behind a Generate barrier. One SQL string, one parse."""
    vd = f"transform(`{vec_col}`, x -> cast(x as double))"
    subs = ",".join(
        f"slice({vd}, {j * dsub + 1}, {dsub})" for j in range(m))
    return df.select(
        "*", F.expr(f"explode(array(array({subs})))").alias(out))


def pq_encode(corpus: DataFrame, codebooks, id_col: str = "vec_id",
              vec_col: str = "embedding",
              keep: tuple = ()) -> DataFrame:
    """Corpus → (id, *keep, codes:array<int>). Zero shuffles: codebooks
    are literals, the plan over the corpus is Project/Generate only.
    ``keep`` names extra input columns to carry through (e.g. the IVF
    ``cell`` — ivf_pq_topk ships (id, cell, codes) into the probe
    join, nothing else)."""
    from news_crawler_spark.operators.par import spread_scan

    m, ks = len(codebooks), len(codebooks[0])
    dsub = len(codebooks[0][0][0])
    # encode is pure Project/Generate — widen a narrow scan so the
    # per-row argmin work parallelizes (no-op at real input sizes, and
    # already-spread inputs like ivf_pq's assigned corpus pass through)
    staged = _stage_subs(spread_scan(corpus), vec_col, m, dsub, "_subs")

    def argmin_code(j: int) -> str:
        # ||x-c||² minus the row-constant ||x||²: cc - 2<x,c>;
        # struct natural order: (rounded distance asc, code asc).
        # The whole argmin is SQL text — codebook literals AND the
        # transform/sort — so the entire codes array below is ONE
        # F.expr parse instead of ks x dsub x m py4j round trips.
        dot = _dot_sql(f"element_at(_subs, {j + 1})", "c.cvec")
        return (
            f"element_at(array_sort(transform({_codebook_sql(codebooks[j], True)}, "
            f"c -> named_struct('d', round(c.cc - 2 * {dot}, 6), "
            "'code', c.code))), 1).code")

    codes = "array(" + ",".join(argmin_code(j) for j in range(m)) + ")"
    return staged.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in keep],
        F.expr(codes).alias("codes"))


def pq_adc_topk(queries: DataFrame, codes: DataFrame, codebooks,
                k: int = 5, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """ADC search: broadcast the (small) query set against the encoded
    corpus — the corpus side moves only (id, m codes), never vectors.
    adist = Σ_j round(<q_j,q_j> + cc_{j,code} - 2<q_j, c_{j,code}>, 6),
    summed in subspace order and rounded again, so the ranking is a
    pure function of (query, codes) in any engine. Returns
    (query_id, neighbor_id, adist, rnk) with rnk ≤ k per query; the
    per-query window partitions on query_id (each query ranks its own
    candidate list — no global sort)."""
    m, ks = len(codebooks), len(codebooks[0])
    dsub = len(codebooks[0][0][0])
    q = _stage_subs(
        queries.select(F.col(id_col).alias("query_id"), vec_col),
        vec_col, m, dsub, "_qsubs",
    ).select("query_id", "_qsubs")
    pairs = codes.crossJoin(F.broadcast(q))  # tiny × corpus, nested-loop
    return _adc_rank(pairs, codebooks, k)


def _adc_rank(pairs: DataFrame, codebooks, k: int) -> DataFrame:
    """Shared ADC scoring + per-query rank over a (codes, _qsubs)
    candidate-pair table — the flat search crosses every (query,
    corpus) pair into it; IVF-PQ equi-joins on the probed cell."""
    m = len(codebooks)

    def term(j: int) -> str:
        qsub = f"element_at(_qsubs, {j + 1})"
        cw = (f"element_at({_codebook_sql(codebooks[j], False)}, "
              f"element_at(codes, {j + 1}) + 1)")
        return (f"round({_dot_sql(qsub, qsub)} + {cw}.cc "
                f"- 2 * {_dot_sql(qsub, cw + '.cvec')}, 6)")

    # explicit left-assoc chain == subspace order; the leading 0.0D
    # matches the old F.lit(0.0) accumulator seed bit-for-bit. ONE
    # F.expr parse for the whole ADC sum (py4j round-trip economy —
    # see _dot_sql).
    adist = F.expr("0.0D + " + " + ".join(term(j) for j in range(m)))
    scored = (pairs.where(F.col("query_id") != F.col("id"))
              .select("query_id", F.col("id").alias("neighbor_id"),
                      F.round(adist, 6).alias("adist")))
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k))


def pq_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
            m: int = 4, ks: int = 8, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Convenience end-to-end: train codebooks, encode, ADC-search."""
    cbs = pq_codebooks(corpus, m=m, ks=ks, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(corpus, cbs, id_col=id_col, vec_col=vec_col)
    return pq_adc_topk(queries, codes, cbs, k=k, id_col=id_col,
                       vec_col=vec_col)


def ivf_pq_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                n_centroids: int = 16, nprobe: int = 2,
                m: int = 4, ks: int = 8, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Composed IVF-PQ — the full index shape a real 10^9-vector
    deployment runs: coarse cell filter FIRST (similarity.ivf_assign,
    deterministic seed centroids = first ``n_centroids`` vectors),
    then ADC over codes ONLY inside the query's ``nprobe`` probed
    cells. The flat ``pq_topk`` scores every (query, corpus) pair;
    this touches ~nprobe/n_centroids of the encoded corpus per query.

    Scale shape: the corpus side is ONE Project/Generate pass — cell
    assignment (literal centroids) and PQ encode (literal codebooks)
    fused into a single projection, so the corpus ships exactly
    (id, cell, codes) into the probe join and NEVER moves a vector or
    an Exchange (plan-asserted in tests/test_pq.py: the only
    hash-partition exchange in the whole query is the final per-query
    rank window). Queries are tiny by contract: they probe nprobe
    cells each and broadcast into a cell equi-join. Each corpus row
    lives in exactly ONE cell (corpus nprobe=1), so a (query,
    neighbor) pair appears at most once — no dedup step.

    Determinism: the cell assignment rounds at 6 dp with cell-id ties
    (ivf_assign contract) and the ADC sum is the pq_adc_topk contract
    (per-subspace rounding, subspace-order sum, neighbor-id ties), so
    a SQL oracle replays cells, codes, and ranking value-exactly.
    Recall caveat (same as every IVF-PQ): a true neighbor outside the
    probed cells is missed — nprobe is the recall/cost lever."""
    from news_crawler_spark.operators.similarity import (
        ivf_assign,
        literal_centroids,
    )

    # ONE corpus TakeOrdered feeds centroids AND codebooks (the naive
    # composition ran three corpus TakeOrdereds and doubled the query)
    head, centroids = literal_centroids(
        corpus, n_centroids, id_col, vec_col,
        head_n=max(n_centroids, ks))
    if len(head) < n_centroids:
        raise ValueError(
            f"corpus has {len(head)} rows < n_centroids={n_centroids}")
    cbs = _codebooks_from_rows(head, m, ks, vec_col)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col, nprobe=1)
    codes = pq_encode(assigned, cbs, id_col=id_col, vec_col=vec_col,
                      keep=("cell",))
    dsub = len(cbs[0][0][0])
    q_assigned = ivf_assign(
        queries.select(F.col(id_col).alias("query_id"), vec_col),
        centroids, "query_id", vec_col, nprobe=nprobe)
    q = (_stage_subs(q_assigned, vec_col, m, dsub, "_qsubs")
         .select("query_id", "cell", "_qsubs"))
    pairs = codes.join(F.broadcast(q), "cell")
    return _adc_rank(pairs, cbs, k)
