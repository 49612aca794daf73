"""Corpus quality + lexical-ranking operators (training-data ops).

A crawl that feeds a training pipeline scores what it fetched before
keeping it. ``repetition_profile`` is the Gopher/RefinedWeb-style
repetition signal (duplicate word / n-gram fraction — boilerplate and
spam are repetitive); ``bm25_scores`` is the classic Okapi BM25
per-(doc, term) lexical relevance used for corpus search, nearest-
query mining, and quality-proxy ranking.

Scale shape: everything reduces to explode → groupBy with map-side
partial aggregation; the only corpus-wide state is the 1-row
(N, avgdl) aggregate, which joins back as a broadcast. No Python on
the data plane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def repetition_profile(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", gram_n: int = 3) -> DataFrame:
    """Per-doc repetition stats: (n_words, uniq_words, rep_word_frac,
    n_grams, rep_gram_frac) where rep_*_frac = 1 - distinct/total —
    the "fraction of duplicate n-grams" quality rule (Gopher rules,
    Rae et al. 2021; RefinedWeb, Penedo et al. 2023). High repetition
    ⇒ boilerplate / keyword stuffing / generation loops.

    Entirely ROW-LOCAL: every statistic is a function of one doc's
    token array (sizes and distinct-sizes), so the whole profile is a
    single projection — ZERO exchanges at any scale. This replaced an
    explode + window-lead + multi-distinct groupBy that shuffled every
    token row twice; counts are exact integers either way, so results
    are identical. The token array materializes once behind a Generate
    barrier (HOF-recompute trap, see dedup._shingle_rows) and the
    n-gram array is a zip_with chain over shifted slices.
    """
    from news_crawler_spark.operators.par import spread_scan

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    staged = spread_scan(df).select(
        F.col(id_col),
        F.explode(F.array(F.struct(toks.alias("t")))).alias("_tk"))
    # NULL text produced no rows in the explode form — keep that
    staged = staged.filter(F.col("_tk").getField("t").isNotNull())
    n_sh = f"(size(_tk.t) - {gram_n - 1})"
    chain = f"slice(_tk.t, 1, {n_sh})"
    for i in range(2, gram_n + 1):
        chain = (f"zip_with({chain}, slice(_tk.t, {i}, {n_sh}), "
                 "(a, b) -> concat(a, ' ', b))")
    return staged.select(
        F.col(id_col),
        F.expr("cast(size(_tk.t) as bigint)").alias("n_words"),
        F.expr("cast(size(array_distinct(_tk.t)) as bigint)")
        .alias("uniq_words"),
        F.expr(f"cast(greatest({n_sh}, 0) as bigint)").alias("n_grams"),
        F.expr(
            f"case when {n_sh} > 0 "
            f"then cast(size(array_distinct({chain})) as bigint) "
            "else cast(0 as bigint) end").alias("uniq_grams"),
    ).select(
        F.col(id_col), "n_words", "uniq_words",
        F.round(F.lit(1) - F.col("uniq_words") / F.col("n_words"), 6)
        .alias("rep_word_frac"),
        "n_grams",
        F.when(F.col("n_grams") > 0,
               F.round(F.lit(1) - F.col("uniq_grams") / F.col("n_grams"), 6))
        .otherwise(F.lit(0.0)).alias("rep_gram_frac"),
    )


def contamination_overlap(corpus: DataFrame, benchmark: DataFrame,
                          text_col: str = "text", id_col: str = "doc_id",
                          gram_n: int = 5) -> DataFrame:
    """Eval-set decontamination (the GPT-3/PaLM n-gram overlap check):
    per corpus document, how many of its distinct token n-grams appear
    anywhere in the benchmark set — (doc_id, n_grams, n_hits,
    hit_frac, contaminated). Training pipelines drop or flag
    ``contaminated`` docs so held-out benchmarks stay held out.

    Shape: corpus grams come from one Generate + lead() (the dedup
    family's shingle path — the tokenizer runs once per doc); the
    benchmark gram set is tiny by definition and broadcasts into the
    hit join, so the corpus shuffles only on doc_id for the two
    per-doc aggregates — no corpus-vs-corpus join anywhere."""
    from news_crawler_spark.operators.dedup import _shingle_rows

    cg = _shingle_rows(corpus, text_col, id_col, gram_n)
    bg = (_shingle_rows(benchmark, text_col, id_col, gram_n)
          .select("shingle").dropDuplicates())
    sizes = cg.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    hits = (cg.join(F.broadcast(bg), "shingle")
            .groupBy(id_col).agg(F.count("*").alias("n_hits")))
    return (
        sizes.join(hits, id_col, "left")
        .select(
            F.col(id_col), "n_grams",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(F.coalesce("n_hits", F.lit(0)) / F.col("n_grams"), 6)
            .alias("hit_frac"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def bloom_contamination(corpus: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        gram_n: int = 5, m_bits: int = 1 << 16,
                        k_hashes: int = 2) -> DataFrame:
    """Bloom-filter decontamination — :func:`contamination_overlap`'s
    scale path. The exact check broadcasts the benchmark GRAM TABLE
    into a join; at production benchmark sizes (every eval suite a lab
    holds out — 10^8 distinct n-grams) that broadcast is gigabytes.
    Here the benchmark folds into an ``m_bits`` Bloom bitmask whose
    63-bit words enter the corpus scan as ONE literal array
    (the ivf_assign/pq-codebook pattern), so the corpus pass is
    Project/Generate + a single per-doc groupBy — ZERO joins, zero
    benchmark bytes shuffled, and the filter costs m_bits/8 bytes
    regardless of benchmark cardinality.

    Bit positions derive from sha256 double hashing (the minhash
    contract: h1/h2 are 60-bit sha substrings, position_i =
    (h1 + i·h2) mod m_bits), so ANY engine rebuilds the identical
    bitmask and per-gram verdicts — the DuckDB oracle replays the
    whole filter, not just row counts.

    Bloom semantics, stated precisely: NO false negatives — every
    gram that IS in the benchmark flags (``n_flagged`` ⊇ the exact
    check's ``n_hits``, property-tested) — and false positives at the
    standard (1 - e^(-kn/m))^k rate, so ``maybe_contaminated`` is a
    SUPERSET gate: route flagged docs to the exact join for
    confirmation, drop-with-FP-budget, or resize m_bits. At the
    default 2^16 bits the literal array is 1041 longs (~8 KB); past
    ~2^20 bits swap the literal for a broadcast (word → bits) join —
    same plan shape, one broadcast hash join added.
    """
    from news_crawler_spark.operators.dedup import _shingle_rows

    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    if k_hashes < 1:
        # hit starts True and the probe loop ANDs onto it — zero
        # probes would flag EVERY gram, silently
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    # 63 bits per mask word (bit index <= 62): a shift by 63
    # overflows DuckDB's checked BIGINT << and ANSI engines
    # generally; one wasted bit per word buys engine-portable
    # masks
    n_words = (m_bits + 62) // 63

    def _positions(gram_col):
        digest = F.sha2(gram_col, 256)
        h1 = F.pmod(F.conv(F.substring(digest, 1, 15), 16, 10)
                    .cast("long"), F.lit(m_bits))
        h2 = F.pmod(F.conv(F.substring(digest, 16, 15), 16, 10)
                    .cast("long"), F.lit(m_bits)) + 1
        return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits))
                for i in range(k_hashes)]

    # -- build: benchmark grams → bit positions → per-word OR mask --
    # distributed partial (bit_or is map-side-combinable), then the
    # ≤ m/64-row mask collects to the driver and becomes a literal
    bg = (_shingle_rows(benchmark, text_col, id_col, gram_n)
          .select("shingle").dropDuplicates())
    # shiftleft's bit-count arg must be a column only via SQL expr
    # (the Python API takes a literal int), so positions are staged as
    # named columns first
    mask_rows = (
        bg.select(F.explode(F.array(*_positions(F.col("shingle"))))
                  .alias("p"))
        .select((F.col("p") / 63).cast("int").alias("w"),
                F.expr("shiftleft(CAST(1 AS BIGINT), "
                       "CAST(p % 63 AS INT))").alias("b"))
        .groupBy("w").agg(F.expr("bit_or(b)").alias("bits"))
        .collect())
    words = [0] * n_words
    for r in mask_rows:
        words[r.w] = int(r.bits)
    bits_lit = F.array(*[F.lit(x).cast("long") for x in words])

    # -- probe: corpus grams check k positions row-locally ----------
    cg = _shingle_rows(corpus, text_col, id_col, gram_n).select(
        F.col(id_col),
        *[p.alias(f"_p{i}")
          for i, p in enumerate(_positions(F.col("shingle")))])
    hit = F.lit(True)
    for i in range(k_hashes):
        word = F.element_at(bits_lit,
                            (F.col(f"_p{i}") / 63).cast("int") + 1)
        bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                     f"CAST(_p{i} % 63 AS INT))")
        hit = hit & (word.bitwiseAND(bit) != 0)
    return (
        cg.select(F.col(id_col), hit.cast("long").alias("_hit"))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_grams"),
             F.sum("_hit").alias("n_flagged"))
        .select(
            F.col(id_col), "n_grams", "n_flagged",
            F.round(F.col("n_flagged") / F.col("n_grams"), 6)
            .alias("flagged_frac"),
            (F.col("n_flagged") > 0).alias("maybe_contaminated"),
        )
    )


def lm_cross_entropy(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Perplexity-style quality scoring (the CCNet filter): train an
    add-one-smoothed bigram LM on the corpus itself, then score every
    document by its average negative log-probability
    ``H = -avg ln((c(w1,w2)+1) / (c(w1)+V))`` — gibberish and
    word-salad score high, fluent text low; pipelines keep the
    low-to-middle band. Self-scoring on the training corpus is the
    deterministic degenerate case; at production scale the count
    tables come from a held-out reference corpus, same join shape.

    Shape: token and bigram counts are map-side-partial groupBys; the
    vocab size is a 1-row broadcast; scoring joins each doc bigram to
    its two count tables on (w1,w2)/(w1) — every shuffle keys on a
    token, nothing all-pairs, no UDF. The unigram join key is
    Zipf-skewed by construction (every bigram row keys on its FIRST
    token, so stopwords like "the" concentrate a large fraction of the
    corpus in single reducers at scale) — it goes through
    :func:`~news_crawler_spark.operators.topk.salted_join_hot`: the
    unigram count table carries each token's big-side frequency, so
    the Zipf head (top-1024 tokens) is broadcast-tagged and salted
    while the skew-free tail joins unsalted — skew defense without the
    unconditional ``n_salts``× vocab replication. Result multiset
    identical to the plain join, so SQL oracles replay the plain
    form."""
    from news_crawler_spark.operators.topk import salted_join_hot

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # the corpus is consumed by FOUR subtrees (unigram counts, vocab,
    # bigram counts, and the scoring join's own bigram rows) and Spark
    # re-executes a subtree per consumer — pin the tokenized corpus
    # ONCE (token array per doc, behind the Generate barrier) so the
    # scan + split run once instead of four times. localCheckpoint,
    # not persist: blocks release with the df.
    staged = df.select(
        F.col(id_col),
        F.explode(F.array(F.struct(toks.alias("t")))).alias("_tk")
    ).filter(F.col("_tk").getField("t").isNotNull()
             ).localCheckpoint(eager=True)
    tok = staged.select(
        F.col(id_col), F.explode(F.col("_tk").getField("t")).alias("w1"))
    # bigrams as a zip_with of the token array with its own tail —
    # same (id, w1, w2) multiset as the old lead()-window form without
    # shuffling and sorting every token row first
    bg = (staged
          .select(
              F.col(id_col),
              F.expr(
                  "explode(zip_with("
                  "slice(_tk.t, 1, greatest(size(_tk.t) - 1, 0)), "
                  "slice(_tk.t, 2, greatest(size(_tk.t) - 1, 0)), "
                  "(a, b) -> named_struct('w1', a, 'w2', b)))").alias("_bg"))
          .select(id_col, F.col("_bg.w1").alias("w1"),
                  F.col("_bg.w2").alias("w2")))
    # uni feeds both the salted scoring join and the vocab constant —
    # pin it (vocab-sized) and read the vocab size off its row count
    # (countDistinct(w1) over tokens == number of distinct unigrams,
    # exact integer either way)
    uni = (tok.groupBy("w1").agg(F.count("*").alias("_cu"))
           .localCheckpoint(eager=True))
    big = bg.groupBy("w1", "w2").agg(F.count("*").alias("_cb"))
    vocab = uni.agg(F.count("*").alias("_v"))
    logp = F.log((F.col("_cb") + 1) / (F.col("_cu") + F.col("_v")))
    scored = salted_join_hot(bg.join(big, ["w1", "w2"]), uni,
                             key="w1", freq_col="_cu",
                             salt_src=id_col, n_salts=8)
    return (
        scored
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col).agg(
            F.count("*").alias("n_bigrams"),
            F.round(-F.avg(logp), 6).alias("cross_entropy"),
        )
    )


def boilerplate_profile(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        min_docs: int = 3) -> DataFrame:
    """CCNet-style line-level boilerplate detection: a trimmed line
    occurring in >= ``min_docs`` DISTINCT documents is boilerplate
    (nav bars, cookie banners, copyright footers — the cross-document
    repetition that per-doc repetition stats can't see). Per document:
    (n_lines, n_boiler, boiler_frac) over its distinct non-empty
    lines — the drop-or-strip signal CCNet applies before dedup.

    Shape: one Generate (line explode), one distinct, one groupBy on
    the line (map-side partial count), one equi-join back, one groupBy
    on the doc — every shuffle keyed on line-hash or doc id, nothing
    all-pairs. The join-back keys on the line itself, and hot
    boilerplate lines ("Subscribe to our newsletter") are by
    definition the skewed keys — so it goes through
    :func:`~news_crawler_spark.operators.topk.salted_join_hot` (the
    per-line doc-count IS the key frequency: the top-1024 hot lines
    are broadcast-tagged and salted, the skew-free tail joins
    unsalted; result multiset equals the plain join)."""
    from news_crawler_spark.operators.topk import salted_join_hot

    # lines feeds the join's big side AND (via doc_counts) the salted
    # join's hot-key probe and small side — salted_join_hot references
    # its small side twice and the big side once, so without the pins
    # the corpus line-explode+dedup executed THREE times. Pin both
    # (localCheckpoint — blocks release with the df).
    lines = (
        df.select(F.col(id_col),
                  F.explode(F.split(F.col(text_col), "\n")).alias("_raw"))
        .select(id_col, F.trim("_raw").alias("line"))
        .filter(F.col("line") != "")
        .dropDuplicates([id_col, "line"])
        .localCheckpoint(eager=True)
    )
    doc_counts = (lines.groupBy("line").agg(F.count("*").alias("_ndocs"))
                  .localCheckpoint(eager=True))
    return (
        salted_join_hot(lines, doc_counts, key="line", freq_col="_ndocs",
                        salt_src=id_col, n_salts=8)
        .groupBy(id_col).agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("_ndocs") >= min_docs, 1).otherwise(0))
            .alias("n_boiler"),
        )
        .select(
            F.col(id_col), "n_lines", "n_boiler",
            F.round(F.col("n_boiler") / F.col("n_lines"), 6)
            .alias("boiler_frac"),
        )
    )


def gopher_gate(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id",
                min_words: int = 50, max_words: int = 100_000,
                min_mwl: float = 3.0, max_mwl: float = 10.0,
                max_symbol_ratio: float = 0.1,
                min_alpha_frac: float = 0.8,
                min_stop_hits: int = 2) -> DataFrame:
    """Composite Gopher-rules keep/drop gate (Rae et al. 2021, A1.1 —
    the rule set most web-corpus pipelines start from): word count in
    [min_words, max_words], mean word length in [min_mwl, max_mwl],
    symbol-to-word ratio ('#' and '...') <= max_symbol_ratio, >= 80%
    of words containing an alphabetic character, and at least
    min_stop_hits distinct common-English stopwords present (the
    "not keyword soup" check). English-oriented by construction, like
    the original.

    One codegen'd projection per doc — no explode, no shuffle, no UDF:
    every signal is an expression over the token array in place, so
    the gate runs at scan speed and composes in front of the expensive
    dedup/LSH stages (drop early, shingle less). All ratios are
    rounded to 6 dp BEFORE thresholding so any SQL engine (the DuckDB
    oracle) replays the keep decision bit-exactly."""
    c = F.lower(F.trim(F.col(text_col)))
    toks = F.split(c, r"\s+")
    n_words = F.size(toks)
    chars = F.length(F.regexp_replace(c, r"\s+", ""))
    mwl = F.round(chars / n_words, 6)
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / n_words, 6)
    symbol_ratio = F.round(
        F.size(F.regexp_extract_all(c, F.lit(r"#|\.\.\."), 0)) / n_words, 6)
    stops = F.array(*[F.lit(w) for w in
                      ("the", "be", "to", "of", "and",
                       "that", "have", "with")])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), stops))
    # NULL-text docs: every signal is NULL under ANSI semantics, so a
    # bare `keep` would be NULL too — and then filter(keep) AND
    # filter(~keep) both drop the doc, silently miscounting keep/drop
    # totals. Coalesce to false (a no-text doc is a drop), matching
    # classifier.hashed_classifier_scores' documented behavior.
    keep = F.coalesce(
        n_words.between(min_words, max_words)
        & mwl.between(min_mwl, max_mwl)
        & (symbol_ratio <= max_symbol_ratio)
        & (alpha_frac >= min_alpha_frac)
        & (stop_hits >= min_stop_hits),
        F.lit(False),
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mwl.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        symbol_ratio.alias("symbol_word_ratio"),
        stop_hits.cast("long").alias("n_stop_hits"),
        keep.alias("keep"),
    )


def bm25_scores(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", k1: float = 1.2,
                b: float = 0.75) -> DataFrame:
    """Okapi BM25 score per (doc, term):
    ``idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl / avgdl))``
    with ``idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)`` (the
    Robertson/Sparck-Jones '+1' form — always positive).

    Shape: tf and dl are per-doc groupBys (map-side partial), df is a
    per-term groupBy over the tf table, and the corpus constants
    (N docs, avg doc length) are ONE row joined back as a broadcast
    cross — the corpus shuffles once on doc id and once on term,
    independent of k1/b. Scores are rounded to 6 dp so any engine
    (the DuckDB oracle included) replays the ranking deterministically.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tok = df.select(F.col(id_col), F.explode(toks).alias("term"))
    # tf is consumed by three subtrees (the join side, df-per-term,
    # and dl/corpus constants) and Spark has no common-subplan reuse
    # across join inputs — without the pin the tokenize+explode+
    # groupBy ran once per consumer (4 corpus scans total).
    # localCheckpoint, not persist: blocks release with the df.
    tf = (tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
          .localCheckpoint(eager=True))
    # dl from tf, not from a second explode pass: the per-doc token
    # count is exactly the sum of its per-term counts (long + long,
    # bit-identical to the old count over the token rows)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))
    g = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    # dft is NOT broadcast-hinted: the term dictionary grows with the
    # corpus (millions of terms at 100 TB) — let AQE pick broadcast
    # when it actually fits; the 1-row corpus constants always do
    joined = (
        tf.join(dl, id_col)
        .join(dft, "term")
        .crossJoin(F.broadcast(g))
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1)
    score = idf * (F.col("tf") * (k1 + 1)
                   / (F.col("tf") + k1 * (1 - b + b * F.col("dl")
                                          / F.col("avgdl"))))
    return joined.select(
        F.col(id_col), "term", "tf", "df",
        F.round(score, 6).alias("score"),
    )


def perplexity_buckets(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", lang_col: str = "lang",
                       lo: float = 0.0, hi: float = 16.0,
                       n_bins: int = 64) -> DataFrame:
    """CCNet-style perplexity banding: split each language's documents
    into head / middle / tail terciles of the corpus-LM cross-entropy
    (CCNet keeps head+middle and drops the tail; Wenzek et al. 2020).

    The tercile cuts are NOT a global ntile — that would be a
    single-partition window over the whole corpus. Instead the scores
    histogram into ``n_bins`` fixed-width bins (row-local integer
    arithmetic), the per-language cut BINS fall out of a cumulative
    window over the aggregated histogram (≤ n_bins rows per language,
    the same integer-rank pattern as
    :func:`~news_crawler_spark.operators.sketches.histogram_quantiles`),
    and each document is banded by comparing its integer bin to the
    broadcast cut bins. Banding error is ≤ one bin width — documents
    sharing a bin always share a band, which is exactly what makes the
    decision engine-exact: bins and rank thresholds
    ``(p·N + 99) div 100`` are pure integer arithmetic, and the bin of
    a rounded score is identical in every engine because
    ``width = 0.25`` is a power of two (``score / width`` is exact
    double scaling, no rounding).

    Returns ``(doc_id, lang, cross_entropy, ppl_bucket)`` for every
    document :func:`lm_cross_entropy` scores (docs with ≥ 1 bigram).

    Scale shape: one doc-keyed equi-join to attach ``lang``, one
    map-side-combinable groupBy for the histogram, windows only over
    the tiny histogram, and a broadcast join of the 1-row-per-language
    cuts back onto the scored table. Nothing new shuffles the corpus.
    """
    width = (hi - lo) / n_bins
    ce = lm_cross_entropy(df, text_col, id_col).join(
        df.select(id_col, lang_col), id_col)
    binned = ce.withColumn(
        "_bin",
        F.least(
            F.greatest(
                F.floor((F.col("cross_entropy") - lo) / width), F.lit(0)),
            F.lit(n_bins - 1),
        ).cast("int"),
    )
    hist = binned.groupBy(lang_col, "_bin").agg(F.count("*").alias("cnt"))
    w = (Window.partitionBy(lang_col).orderBy("_bin")
         .rowsBetween(Window.unboundedPreceding, 0))
    wn = Window.partitionBy(lang_col)
    cum = (hist.withColumn("cum", F.sum("cnt").over(w))
           .withColumn("n", F.sum("cnt").over(wn)))
    pcts = F.explode(F.array(F.lit(33), F.lit(67))).alias("pct")
    cuts = (
        cum.select(lang_col, "_bin", "cum", "n", pcts)
        .where(F.col("cum") >= F.expr("(pct * n + 99) div 100"))
        .groupBy(lang_col, "pct").agg(F.min("_bin").alias("cutbin"))
        .groupBy(lang_col).agg(
            F.min(F.when(F.col("pct") == 33, F.col("cutbin"))).alias("_c33"),
            F.min(F.when(F.col("pct") == 67, F.col("cutbin"))).alias("_c67"),
        )
    )
    return (
        binned.join(F.broadcast(cuts), lang_col)
        .select(
            id_col,
            lang_col,
            "cross_entropy",
            F.when(F.col("_bin") <= F.col("_c33"), F.lit("head"))
            .when(F.col("_bin") <= F.col("_c67"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("ppl_bucket"),
        )
    )


def c4_clean(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", min_words_per_line: int = 3,
             min_kept_lines: int = 2,
             line_badwords: tuple = ("javascript",),
             doc_badwords: tuple = ("lorem ipsum", "{")) -> DataFrame:
    """C4-style heuristic cleaning (Raffel et al. 2020, §2.2): keep a
    line only if it ends in terminal punctuation, has at least
    ``min_words_per_line`` words, and carries no line-level badword
    (C4 drops "javascript" lines); drop the whole document if any
    doc-level badword appears ("lorem ipsum", a curly brace) or if
    fewer than ``min_kept_lines`` lines survive. Output per doc:
    ``n_lines``, ``n_kept``, ``keep``, and ``clean_sha`` — the sha256
    of the surviving lines re-joined in order (NULL when nothing
    survives), so a downstream writer can verify the cleaned text
    without this operator materializing it twice.

    Scale shape: pure per-row expressions — split / filter / sha over
    array HOFs, ZERO shuffles and no Python. The two Generate
    barriers (explode of a 1-element array) stage the line array and
    the kept-line array so each filter lambda runs once per doc, not
    once per consumer (CollapseProject re-inlines staged projections
    — the HOF-recompute trap, see ivf_assign).
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""))
    staged = df.select(
        id_col,
        F.explode(F.array(F.struct(
            lines.alias("ls"),
            F.lower(F.col(text_col)).alias("lt")))).alias("_s"))

    def line_ok(l):
        terminal = F.substring(l, -1, 1).isin(".", "!", "?", '"')
        words = F.size(
            F.filter(F.split(l, r"\s+"), lambda w: w != F.lit("")))
        ok = terminal & (words >= min_words_per_line)
        low = F.lower(l)
        for bw in line_badwords:
            ok = ok & ~low.contains(bw)
        return ok

    staged2 = staged.select(
        id_col,
        F.col("_s.lt").alias("_lt"),
        F.size("_s.ls").alias("n_lines"),
        F.explode(F.array(F.filter(F.col("_s.ls"), line_ok))).alias("_kept"))

    doc_bad = F.lit(False)
    for bw in doc_badwords:
        doc_bad = doc_bad | F.col("_lt").contains(bw)
    n_kept = F.size("_kept")
    # NULL text → NULL line arrays → NULL keep under ANSI; coalesce to
    # false so filter(keep)/filter(~keep) partition the corpus exactly
    # (same contract as gopher_gate / hashed_classifier_scores)
    return staged2.select(
        id_col,
        "n_lines",
        n_kept.alias("n_kept"),
        F.coalesce((n_kept >= min_kept_lines) & ~doc_bad,
                   F.lit(False)).alias("keep"),
        F.when(n_kept > 0,
               F.sha2(F.array_join(F.col("_kept"), "\n"), 256))
        .alias("clean_sha"),
    )
