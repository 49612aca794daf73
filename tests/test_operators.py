"""Single-op unit tests: small DataFrame in → exact expected output
(the test model of SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_crawler_spark.functions import (
    defang_reverse,
    extract_iocs_long,
    lang_guess,
    token_count,
    url_host,
    url_path,
    url_query,
    valid_ipv4,
)
from news_crawler_spark.functions.htmlspans import html_to_spans
from news_crawler_spark.operators import (
    cosine_topk_bruteforce,
    document_links,
    exact_dedup,
    first_wins_dedup,
    flatten_text,
    lsh_ann_topk,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_buckets,
    span_stats,
)
from news_crawler_spark.operators.multimodal import attach_binary, decode_media


# ---------------------------------------------------------------- IOC / X1
IOC_TEXT = (
    "C2 at 185[.]220[.]101[.]5 and 10.0.0.7, payload "
    "d41d8cd98f00b204e9800998ecf8427e dropped from "
    "hxxps[:]//evil.example/a and https://ok.example/b?x=1"
)


def test_extract_iocs_long(spark):
    df = spark.createDataFrame([("d1", IOC_TEXT)], "doc_id string, text string")
    got = {(r.kind, r.value) for r in extract_iocs_long(df).collect()}
    assert got == {
        ("ip", "185.220.101.5"),
        ("ip", "10.0.0.7"),
        ("hash", "d41d8cd98f00b204e9800998ecf8427e"),
        ("url", "https://evil.example/a"),
        ("url", "https://ok.example/b?x=1"),
    }


def test_defang_and_ip_validity(spark):
    df = spark.createDataFrame(
        [("1[.]2[.]3[.]4",), ("999.1.1.1",), ("8.8.8.8",), ("not an ip",)], "v string"
    )
    got = df.select(
        defang_reverse("v").alias("d"), valid_ipv4(defang_reverse("v")).alias("ok")
    ).collect()
    assert [(r.d, r.ok) for r in got] == [
        ("1.2.3.4", True), ("999.1.1.1", False), ("8.8.8.8", True), ("not an ip", False),
    ]


def test_url_split(spark):
    df = spark.createDataFrame([("https://a.example:8080/x/y?q=1&r=2#frag",)], "u string")
    r = df.select(
        url_host("u").alias("h"), url_path("u").alias("p"), url_query("u").alias("q")
    ).collect()[0]
    assert (r.h, r.p, r.q) == ("a.example:8080", "/x/y", "q=1&r=2")


# ---------------------------------------------------------------- text stats
def test_token_count_and_lang(spark):
    df = spark.createDataFrame(
        [("the cat and the dog sat on it for now ok", "en"),
         ("보안 취약점 발견", "ko"),
         ("qqq zzz xxx", "other")],
        "text string, want string",
    )
    got = df.select("want", lang_guess("text").alias("lang"),
                    token_count("text").alias("n")).collect()
    for r in got:
        assert r.lang == r.want
    assert got[0].n == 11


def test_script_fracs_and_dominant(spark):
    from news_crawler_spark.functions.textstats import (
        dominant_script,
        script_fracs,
    )

    df = spark.createDataFrame(
        [(1, "보안 취약점 발견"),         # pure hangul
         (2, "abc 中文 def"),             # latin 6 / cjk 2 of 8
         (3, "12345"),                    # digits
         (4, "русский text"),             # cyrillic 7 / latin 4 of 11
         (5, "!!! ???"),                  # no class at all
         (6, "")],                        # empty
        "doc_id long, text string")
    fr = script_fracs(F.col("text"))
    staged = df.select("doc_id",
                       *[v.alias(k) for k, v in fr.items()])
    got = {r.doc_id: r for r in
           staged.select("*", dominant_script().alias("dom")).collect()}
    assert got[1].dom == "hangul" and got[1].hangul_frac == 1.0
    assert got[2].dom == "latin"
    assert got[2].latin_frac == round(6 / 8, 6)
    assert got[2].cjk_frac == round(2 / 8, 6)
    assert got[3].dom == "digit" and got[3].digit_frac == 1.0
    assert got[4].dom == "cyrillic"
    assert got[5].dom == "other" and got[5].n_chars == 6
    assert got[6].dom == "other" and got[6].n_chars == 0
    # fractions over non-whitespace chars always sum <= 1
    for r in got.values():
        assert (r.hangul_frac + r.cjk_frac + r.cyrillic_frac
                + r.latin_frac + r.digit_frac) <= 1.0 + 1e-9


# ---------------------------------------------------------------- dedup
def test_first_wins_dedup(spark):
    df = spark.createDataFrame(
        [("k1", 3, "c"), ("k1", 1, "a"), ("k1", 2, "b"), ("k2", 9, "z")],
        "k string, ord int, v string",
    )
    got = first_wins_dedup(df, ["k"], [F.col("ord").asc()]).collect()
    assert {(r.k, r.v) for r in got} == {("k1", "a"), ("k2", "z")}


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different text")],
        "doc_id long, text string",
    )
    got = {r.keep_id: r.group_size for r in exact_dedup(df).collect()}
    assert got == {1: 2, 3: 1}  # whitespace/case-normalized group


# near-dup pair: long shared body, one differing final token — Jaccard
# ~0.95, so ANY correct banding scheme must pair them (a short text at
# J~0.6 would make the test a coin-flip on the hash family instead)
_BASE = ("the quick brown fox jumps over the lazy dog near the river bank "
         "while herons wade through reeds and swallows skim the water ") * 2
NEAR_A = _BASE + "today"
NEAR_B = _BASE + "tonight"
FAR = "completely unrelated text about database systems and query optimizers"


def _near_dup_df(spark):
    return spark.createDataFrame(
        [(1, NEAR_A), (2, NEAR_B), (3, FAR), (4, NEAR_A + " extra")],
        "doc_id long, text string",
    )


def test_minhash_lsh_finds_planted_pair(spark):
    pairs = {(r.id_a, r.id_b)
             for r in minhash_lsh_candidates(_near_dup_df(spark)).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ngram_jaccard(spark):
    got = {(r.id_a, r.id_b): r.jaccard
           for r in ngram_jaccard_pairs(_near_dup_df(spark), threshold=0.5).collect()}
    assert (1, 2) in got and got[(1, 2)] > 0.7
    assert all(3 not in pair for pair in got)


def test_simhash_buckets_planted_pair(spark):
    pairs = {(r.id_a, r.id_b) for r in simhash_buckets(_near_dup_df(spark)).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs


def test_dedup_family_releases_storage(spark):
    """The near-dup operators materialize an intermediate (band /
    shingle / banded-signature) table so self-join sides don't
    recompute it — but must NOT pin it for the life of the session.
    df.persist() registers in the SQL CacheManager, which holds a
    strong reference until an explicit unpersist — one leaked cache
    entry per call in a long-running driver (the r02 form). The
    localCheckpoint form keeps the CacheManager empty (its blocks are
    ContextCleaner-managed, released on GC)."""
    df = _near_dup_df(spark)
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    assert cache_mgr.isEmpty(), "precondition: cache must start empty"
    for _ in range(3):
        minhash_lsh_candidates(df).count()
        ngram_jaccard_pairs(df, threshold=0.5).count()
        simhash_buckets(df).count()
        assert cache_mgr.isEmpty(), (
            "near-dup operator left a pinned entry in the CacheManager")


def test_repetition_profile_hand_model(spark):
    from news_crawler_spark.operators import repetition_profile

    df = spark.createDataFrame(
        [(1, "a a a a"),            # 4 words 1 uniq; 3-grams: "a a a" x2
         (2, "w x y z"),            # no repetition at all
         (3, "ab")],                # single word: zero 3-grams
        "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_profile(df).collect()}
    assert (got[1].n_words, got[1].uniq_words) == (4, 1)
    assert got[1].rep_word_frac == 0.75
    assert (got[1].n_grams, got[1].rep_gram_frac) == (2, 0.5)
    assert got[2].rep_word_frac == 0.0 and got[2].rep_gram_frac == 0.0
    assert got[3].n_grams == 0 and got[3].rep_gram_frac == 0.0


def test_bm25_matches_python_model(spark):
    import math

    from news_crawler_spark.operators import bm25_scores

    corpus = {1: "spark shuffle join", 2: "spark spark scan", 3: "join scan io"}
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {(r.doc_id, r.term): (r.tf, r.df, r.score)
           for r in bm25_scores(df).collect()}

    docs = {d: t.split() for d, t in corpus.items()}
    n, avgdl = len(docs), sum(map(len, docs.values())) / len(docs)
    dfreq = {}
    for toks in docs.values():
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    for (d, term), (tf, dfv, score) in got.items():
        assert tf == docs[d].count(term) and dfv == dfreq[term]
        idf = math.log((n - dfv + 0.5) / (dfv + 0.5) + 1)
        want = idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(docs[d]) / avgdl)))
        assert abs(score - want) < 1e-6, (d, term)


def test_pii_redact_precedence_and_counts(spark):
    """Card digits must redact before the phone rule can half-eat
    them; counts are taken at each rule's point in the chain so a
    value never double-counts across kinds."""
    from news_crawler_spark.functions import pii_counts, pii_redact

    text = ("mail a.b+c@ex.co card 4111 1111 1111 1234 "
            "ip 10.0.0.7 tel +82 010-1234-5678 clean words")
    df = spark.createDataFrame([(text,)], "text string")
    counts = pii_counts("text")
    row = df.select(
        pii_redact("text").alias("red"),
        *[v.alias(k) for k, v in counts.items()]).collect()[0]
    assert row.red == ("mail <EMAIL> card <CARD> "
                       "ip <IP> tel <PHONE> clean words")
    assert (row.email, row.card, row.ip, row.phone) == (1, 1, 1, 1)


def test_contamination_overlap_planted(spark):
    """A corpus doc containing a benchmark excerpt must flag
    contaminated with the exact overlapping-gram count; disjoint docs
    stay clean."""
    from news_crawler_spark.operators import contamination_overlap

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely different words appear in this one here now")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(9, "quick brown fox jumps over the lazy")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           contamination_overlap(corpus, bench, gram_n=5).collect()}
    # doc 1: 6 distinct 5-grams; bench has 3 5-grams, all inside doc 1
    assert got[1].contaminated and got[1].n_hits == 3 and got[1].n_grams == 6
    assert got[1].hit_frac == 0.5
    assert not got[2].contaminated and got[2].n_hits == 0


def test_bloom_contamination_no_false_negatives(spark):
    """The Bloom path must flag a SUPERSET of the exact check's hits
    (no false negatives — the property Bloom guarantees), agree on the
    planted-contamination verdicts at this scale, and its corpus plan
    must be join-free (the mask is a literal, not a joined table)."""
    from news_crawler_spark.operators import (
        bloom_contamination,
        contamination_overlap,
    )

    rows = [(i, f"unique filler w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f "
                f"w{i}g w{i}h") for i in range(2, 30)]
    rows.append((1, "the quick brown fox jumps over the lazy dog today"))
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(9, "quick brown fox jumps over the lazy")],
        "doc_id long, text string")

    exact = {r.doc_id: r for r in
             contamination_overlap(corpus, bench, gram_n=5).collect()}
    bloom_df = bloom_contamination(corpus, bench, gram_n=5,
                                   m_bits=1 << 16, k_hashes=2)
    bloom = {r.doc_id: r for r in bloom_df.collect()}

    assert set(bloom) == set(exact)
    for d in exact:
        assert bloom[d].n_grams == exact[d].n_grams, d
        assert bloom[d].n_flagged >= exact[d].n_hits, d  # no false negs
    assert bloom[1].maybe_contaminated and bloom[1].n_flagged >= 3
    # at 2^16 bits vs ~3 bench grams, FPs are ~(kn/m)^k ≈ 1e-8 —
    # every disjoint doc stays clean in this fixture
    assert all(not bloom[d].maybe_contaminated
               for d in bloom if d != 1)

    plan = bloom_df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan

    with pytest.raises(ValueError, match="power of two"):
        bloom_contamination(corpus, bench, m_bits=1000)


def test_resolve_redirects_chains_cycles_and_caps(spark):
    """Pointer doubling: a 4-hop chain resolves with exact hop counts
    in 2 rounds (covers 4 hops); a 2-cycle reports resolved=false with
    NULL hops; a chain longer than 2^max_rounds stays unresolved at
    the cap and resolves once rounds suffice; duplicate src edges
    functionalize to the min dst."""
    from news_crawler_spark.operators import resolve_redirects

    edges = ([(f"u{i}", f"u{i - 1}") for i in range(1, 5)]   # u4→…→u0
             + [("c1", "c2"), ("c2", "c1")]                  # cycle
             + [(f"v{i}", f"v{i - 1}") for i in range(1, 10)]  # 9 hops
             + [("u1", "zz")])                               # dup src
    df = spark.createDataFrame(edges, "src string, dst string")

    got = {r.url: r for r in resolve_redirects(df, max_rounds=2).collect()}
    for i in range(1, 5):
        r = got[f"u{i}"]
        assert (r.final_url, r.hops, r.resolved) == ("u0", i, True), i
    assert not got["c1"].resolved and got["c1"].hops is None
    assert not got["c2"].resolved and got["c2"].hops is None
    # u1 had two recorded targets: min("u0", "zz") == "u0" wins
    assert got["u1"].final_url == "u0"
    # 9-hop chain: 2 rounds cover only 4 hops → unresolved at the cap
    assert not got["v9"].resolved
    got4 = {r.url: r for r in resolve_redirects(df, max_rounds=4).collect()}
    assert (got4["v9"].final_url, got4["v9"].hops,
            got4["v9"].resolved) == ("v0", 9, True)


def test_url_normalize_rules(spark):
    from news_crawler_spark.functions import url_normalize

    cases = [
        # default port stripped only when it matches the scheme
        ("HTTP://Ex.COM:80/A?b=2&a=1#f", "http://ex.com/A?a=1&b=2"),
        ("https://ex.com:443/", "https://ex.com/"),
        ("http://ex.com:8080/p", "http://ex.com:8080/p"),
        # tracking params out, survivors sorted, fragment dropped
        ("http://ex.com/p?utm_source=x&z=1&gclid=g&a=2", "http://ex.com/p?a=2&z=1"),
        # all params tracking -> no '?'
        ("http://ex.com/p?utm_a=1&fbclid=2", "http://ex.com/p"),
        ("http://ex.com", "http://ex.com"),  # no path: preserved verbatim
        # scheme-less / malformed: pass through trimmed, never merged
        ("a?x=1", "a?x=1"),
        ("b?x=1", "b?x=1"),
        ("  /rel/path?utm_a=1  ", "/rel/path?utm_a=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.n for r in df.select(url_normalize("url").alias("n")).collect()]
    assert got == [w for _, w in cases]


def test_lm_cross_entropy_matches_python_model(spark):
    """Add-one bigram LM cross-entropy pinned to a serial Python
    model: a doc made of the corpus's most repeated bigram must score
    LOWER (more fluent under the corpus LM) than a doc of one-off
    transitions."""
    import math
    from collections import Counter

    from news_crawler_spark.operators.quality import lm_cross_entropy

    corpus = {1: "a b a b a b", 2: "a b c d", 3: "x y z q"}
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {r.doc_id: r for r in lm_cross_entropy(df).collect()}

    toks = {d: t.split() for d, t in corpus.items()}
    uni = Counter(w for t in toks.values() for w in t)
    big = Counter((t[i], t[i + 1]) for t in toks.values()
                  for i in range(len(t) - 1))
    v = len(uni)
    for d, t in toks.items():
        lps = [math.log((big[(t[i], t[i + 1])] + 1) / (uni[t[i]] + v))
               for i in range(len(t) - 1)]
        want = round(-sum(lps) / len(lps), 6)
        assert abs(got[d].cross_entropy - want) < 1e-6, d
        assert got[d].n_bigrams == len(lps)
    assert got[1].cross_entropy < got[3].cross_entropy


def test_boilerplate_profile_planted(spark):
    """A line shared by >= min_docs distinct docs flags boilerplate;
    repeats WITHIN one doc don't count toward the threshold (distinct
    docs, not occurrences)."""
    from news_crawler_spark.operators.quality import boilerplate_profile

    df = spark.createDataFrame(
        [(1, "nav\nunique one\nfooter"),
         (2, "nav\nunique two\nfooter"),
         (3, "nav\nunique three\nself\nself\nself"),
         (4, "all original here")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           boilerplate_profile(df, min_docs=2).collect()}
    assert got[1].n_lines == 3 and got[1].n_boiler == 2
    assert got[2].n_boiler == 2
    # 'self' x3 inside doc 3 is ONE distinct line in ONE doc -> clean
    assert got[3].n_lines == 3 and got[3].n_boiler == 1  # only 'nav'
    assert got[4].n_boiler == 0 and got[4].boiler_frac == 0.0


def test_url_normalize_idempotent_property(spark):
    """Canonicalization must be a projection: normalize(normalize(u))
    == normalize(u) for arbitrary scheme-case/port/param-order/
    fragment combinations — otherwise re-crawled URLs hash to new
    frontier slots on every pass."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from news_crawler_spark.functions import url_normalize

    seg = st.text(alphabet="aBcD09-_", min_size=1, max_size=8)
    param = st.sampled_from(
        ["utm_source=x", "a=1", "z=9", "gclid=g", "b=2", "fbclid=f", ""])
    url = st.builds(
        lambda sch, h1, h2, port, path, ps, frag:
            f"{sch}://{h1}.{h2}{port}/{path}?" + "&".join(ps) + frag,
        st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
        seg, seg,
        st.sampled_from(["", ":80", ":443", ":8080"]),
        seg,
        st.lists(param, max_size=4),
        st.sampled_from(["", "#f", "#x?y=1"]))

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(urls=st.lists(url, min_size=1, max_size=40))
    def check(urls):
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        rows = (df.select(url_normalize("url").alias("n"))
                .select("n", url_normalize("n").alias("n2")).collect())
        for r in rows:
            assert r.n2 == r.n, (r.n, r.n2)

    check()


def test_pii_redact_idempotent_property(spark):
    """Redaction must be idempotent — placeholders contain no digits
    or '@', so a second pass can never re-match (a pipeline stage that
    mutates already-clean text corrupts downstream digests)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from news_crawler_spark.functions import pii_redact

    frag = st.sampled_from(
        ["foo@bar.com", "4111 1111 1111 1111", "10.0.0.1",
         "+1 555-123-4567", "plain words", "%$#", "a.b@c.d.ee",
         "999.999.999.999", "x 12 34", "tel:+82 010-1234-5678"])

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(parts=st.lists(frag, min_size=1, max_size=20))
    def check(parts):
        df = spark.createDataFrame([(" ".join(parts),)], "text string")
        row = (df.select(pii_redact("text").alias("r"))
               .select("r", pii_redact("r").alias("r2")).collect()[0])
        assert row.r2 == row.r

    check()


# ------------------------------------------------------------------ ioc sets
def test_canonical_vs_asec_ioc_sets(spark):
    """The reference keeps TWO pattern sets that deliberately differ
    (parsers/ioc.py strict+ports vs asec.py loose+defanged); both must
    behave on the divergent inputs."""
    from news_crawler_spark.functions import (
        extract_iocs_canonical_long,
        extract_iocs_long,
    )

    df = spark.createDataFrame(
        [("1", "ip 1.2.3.4:8080 bad 999.1.2.3 defanged 5[.]6[.]7[.]8 "
               "url hxxps[:]//evil.test/x real HTTP://Host.example:8443/p")],
        "doc_id string, text string",
    )
    canon = {(r.kind, r.value) for r in extract_iocs_canonical_long(df).collect()}
    asec = {(r.kind, r.value) for r in extract_iocs_long(df).collect()}
    # ip:port — both extract the bare ip (port dropped by \b)
    assert ("ip", "1.2.3.4") in canon and ("ip", "1.2.3.4") in asec
    # strict octets reject 999.*; the loose set keeps it
    assert ("ip", "999.1.2.3") not in canon
    assert ("ip", "999.1.2.3") in asec
    # defanged ip: normalized by asec, invisible to canonical
    assert ("ip", "5.6.7.8") in asec
    assert not any(k == "ip" and "5" in v.split(".")[0] for k, v in canon)
    # canonical: case-insensitive scheme + explicit port, verbatim value
    assert ("url", "HTTP://Host.example:8443/p") in canon
    # asec: defanged url normalized
    assert ("url", "https://evil.test/x") in asec


# ---------------------------------------------------------------- similarity
def test_cosine_topk_and_lsh_recall(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    base = rng.standard_normal((20, 16)).astype("float32")
    base[7] = base[3] + rng.standard_normal(16).astype("float32") * 0.01  # planted NN
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = cosine_topk_bruteforce(df.filter("vec_id = 3"), df, k=3)
    top = exact.orderBy("rnk").collect()
    assert top[0].neighbor_id == 7 and top[0].sim > 0.99

    approx = lsh_ann_topk(df.filter("vec_id = 3"), df, k=3, dim=16,
                          n_planes=4, n_tables=8)
    assert any(r.neighbor_id == 7 for r in approx.collect())


def test_ivf_topk_recall_and_kmeans_refine(spark):
    import numpy as np

    from news_crawler_spark.operators.similarity import (
        ivf_assign, ivf_topk, kmeans_refine)

    rng = np.random.default_rng(1)
    # two well-separated gaussian clusters + a planted near-dup pair
    centers = np.array([[5.0] * 16, [-5.0] * 16], dtype="float32")
    base = np.concatenate([
        centers[i % 2] + rng.standard_normal(16).astype("float32")
        for i in range(30)]).reshape(30, 16)
    base[11] = base[3] + rng.standard_normal(16).astype("float32") * 0.01
    rows = [(i, [float(x) for x in base[i]]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = ivf_topk(df.filter("vec_id = 3"), df, k=3, n_centroids=4, nprobe=2)
    top = got.orderBy("rnk").collect()
    assert top[0].neighbor_id == 11 and top[0].sim > 0.99

    # Lloyd refinement: refined centroids separate the two clusters —
    # every vector lands in the same cell as its own cluster center
    seed = (df.orderBy("vec_id").limit(2)
            .selectExpr("cast(vec_id as int) as cell", "embedding as cvec"))
    refined = kmeans_refine(df, seed, iters=3)
    assigned = ivf_assign(df, refined).select("vec_id", "cell").collect()
    by_cluster = {}
    for r in assigned:
        by_cluster.setdefault(r.vec_id % 2, set()).add(r.cell)
    assert all(len(cells) == 1 for cells in by_cluster.values())
    assert by_cluster[0] != by_cluster[1]


# ---------------------------------------------------------------- spans
DOCS = [
    ("d1", [("title", "hello", "", 0), ("text", "body one", "", 1),
            ("link", "click", "http://x.test/a", 2), ("media", "", "http://x.test/i.png", 3),
            ("text", "body two", "", 4)]),
    # media-only document: no text-bearing spans at all
    ("d2", [("media", "", "http://x.test/v.mp4", 0)]),
]


def _docs_df(spark):
    from news_crawler_spark.schemas import DOCUMENTS

    rows = [(d, [{"kind": k, "text": t, "media_ref": m, "offset": o}
                 for (k, t, m, o) in spans]) for d, spans in DOCS]
    return spark.createDataFrame(rows, DOCUMENTS)


def test_flatten_text(spark):
    got = {r.doc_id: r.text for r in flatten_text(_docs_df(spark)).collect()}
    assert got["d1"] == "hello body one click body two"
    # no text-bearing spans -> NULL, not '' (string_agg-over-zero-rows
    # semantics; keeps sha2 digests oracle-replayable)
    assert got["d2"] is None


def test_document_links(spark):
    got = [(r.kind, r.ref, r.offset) for r in
           document_links(_docs_df(spark))
           .filter("doc_id = 'd1'").orderBy("offset").collect()]
    assert got == [("link", "http://x.test/a", 2), ("media", "http://x.test/i.png", 3)]
    d2 = document_links(_docs_df(spark)).filter("doc_id = 'd2'").collect()
    assert [(r.kind, r.ref) for r in d2] == [("media", "http://x.test/v.mp4")]


def test_span_stats(spark):
    r = span_stats(_docs_df(spark)).filter("doc_id = 'd1'").collect()[0]
    assert (r.n_spans, r.n_text, r.n_link, r.n_media) == (5, 2, 1, 1)
    assert r.text_chars == len("hello") + len("body one") + len("click") + len("body two")


# ---------------------------------------------------------------- html parse
def test_html_to_spans():
    html = ('<html><title>T</title><body>intro '
            '<a href="/x">anchor text</a><img src="/i.png" alt="pic">'
            '<time datetime="2025-06-01">June</time> tail</body></html>')
    got = html_to_spans(html)
    assert got == [
        ("title", "T", "", 0),
        ("text", "intro", "", 1),
        ("link", "anchor text", "/x", 2),
        ("media", "pic", "/i.png", 3),
        ("date", "2025-06-01", "", 4),
        ("text", "June", "", 5),   # <time> inner text kept as a text span
        ("text", "tail", "", 6),
    ]


# ---------------------------------------------------------------- multimodal
def test_multimodal_stub(spark):
    df = spark.createDataFrame([("a", b"\x89PNG fake"), ("b", b"RIFF fake")],
                               "doc_id string, body binary")
    meta = decode_media(attach_binary(df, "body"), fake=True).orderBy("doc_id").collect()
    assert [r.n_bytes for r in meta] == [9, 9]
    assert all(r.width and r.height and len(r.sha256) == 64 for r in meta)
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        decode_media(attach_binary(df, "body"), fake=False).collect()


# ------------------------------------------------------- connected components
def test_connected_components_planted_and_random(spark):
    from news_crawler_spark.operators.components import (
        connected_components, dedup_clusters)

    # planted: a path (needs transitivity), a pair, a singleton-by-absence
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "src long, dst long")
    got = {r.node: r.component
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    # random graph vs pure-python union-find
    import random

    rng = random.Random(7)
    pairs = sorted({tuple(sorted(rng.sample(range(60), 2)))
                    for _ in range(45)})
    parent = list(range(60))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    want = {n: min(m for m in range(60) if find(m) == find(n))
            for n in {x for p in pairs for x in p}}
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == want

    # dedup_clusters: every doc labeled, singletons canonical
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    cand = spark.createDataFrame([(0, 5), (5, 7)], "id_a long, id_b long")
    out = {r.doc_id: (r.canon_id, r.cluster_size, r.is_canonical)
           for r in dedup_clusters(docs, cand).collect()}
    assert out[0] == (0, 3, True)
    assert out[5] == (0, 3, False) and out[7] == (0, 3, False)
    assert out[3] == (3, 1, True)


def test_large_star_dedup_skip_invariants(spark):
    """r6 optimization contract: _large_star(dedup=False) must emit
    the same edge SET as dedup=True (only duplicate multiplicity may
    differ), already (src > dst)-oriented with no self-loops — the
    properties the small-graph fast path in connected_components
    relies on to skip the intermediate dedup exchange."""
    import random

    from news_crawler_spark.operators.components import _canon, _large_star

    rng = random.Random(13)
    pairs = sorted({tuple(sorted(rng.sample(range(40), 2)))
                    for _ in range(70)})
    edges = _canon(spark.createDataFrame(pairs, "src long, dst long"))
    with_dedup = {(r.src, r.dst) for r in _large_star(edges).collect()}
    rows = _large_star(edges, dedup=False).collect()
    no_dedup = {(r.src, r.dst) for r in rows}
    assert no_dedup == with_dedup
    assert all(r.src > r.dst for r in rows)  # oriented, no self-loops


def test_dedup_clusters_window_sizes_match_group_counts(spark):
    """r6 optimization contract: cluster_size from the canon_id count
    window must equal the old groupBy-count-join-back values for a
    graph with multi-node clusters, chains and singletons."""
    from collections import Counter

    from news_crawler_spark.operators.components import dedup_clusters

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    cand = spark.createDataFrame(
        [(0, 5), (5, 7), (1, 2), (8, 9), (9, 10), (10, 8)],
        "id_a long, id_b long")
    rows = dedup_clusters(docs, cand).collect()
    assert len(rows) == 12
    sizes = Counter(r.canon_id for r in rows)
    for r in rows:
        assert r.cluster_size == sizes[r.canon_id]
        assert r.is_canonical == (r.doc_id == r.canon_id)
    assert sizes[0] == 3 and sizes[1] == 2 and sizes[8] == 3
    assert sum(1 for r in rows if r.cluster_size == 1) == 4


def test_winnowing_guarantees_containment_overlap(spark):
    """Winnowing guarantee: a shared token run of >= w+k-1 tokens
    shares at least one fingerprint; a contained copy shares most."""
    from news_crawler_spark.operators.dedup import winnowing_fingerprints

    inner = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon")
    container = "intro words here " + inner + " closing remarks follow now"
    other = "totally different vocabulary about spark physical plans"
    df = spark.createDataFrame(
        [(1, inner), (2, container), (3, other)], "doc_id long, text string")
    fps = {i: set() for i in (1, 2, 3)}
    for r in winnowing_fingerprints(df).collect():
        fps[r.doc_id].add(r.fp)
    shared = fps[1] & fps[2]
    assert len(shared) >= max(1, len(fps[1]) // 2), "containment missed"
    assert not (fps[1] & fps[3]), "unrelated docs must not collide"


def test_url_unquote_matches_urllib(spark):
    from urllib.parse import unquote

    from news_crawler_spark.functions.urlops import url_unquote

    vals = ["a%20b%2Fc", "plus+stays", "%ED%95%9C%EA%B8%80",
            "no-escapes", "q=%22x%22&y=1%2B2",
            # malformed escapes must pass through, not crash (ANSI
            # url_decode throws CANNOT_DECODE_URL on a stray %)
            "100% off", "%E", "trailing%", "50%+60%"]
    df = spark.createDataFrame([(v,) for v in vals], "u string")
    got = [r.d for r in df.select(url_unquote("u").alias("d")).collect()]
    assert got == [unquote(v) for v in vals]


def test_near_dup_xxhash64_fast_path(spark):
    """The production hash_fn='xxhash64' variant keeps identical
    banding statistics: the planted pair is found, unrelated docs are
    not paired, and winnowing containment still holds."""
    from news_crawler_spark.operators.dedup import winnowing_fingerprints

    df = _near_dup_df(spark)
    mh = {(r.id_a, r.id_b)
          for r in minhash_lsh_candidates(df, hash_fn="xxhash64").collect()}
    assert (1, 2) in mh and (1, 3) not in mh
    sh = {(r.id_a, r.id_b)
          for r in simhash_buckets(df, hash_fn="xxhash64").collect()}
    assert (1, 2) in sh and (1, 3) not in sh
    fps = {}
    for r in winnowing_fingerprints(df, hash_fn="xxhash64").collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2] and not (fps[1] & fps[3])


def test_interval_join_bucketed_exact(spark):
    """Bucket-decomposed range join == brute-force containment,
    including intervals spanning many buckets and bucket boundaries."""
    from news_crawler_spark.operators.rangejoin import interval_join_bucketed

    pts = [(i, 100 * i) for i in range(40)]  # p_sec 0..3900
    ivs = [(100, 50, 1250), (101, 599, 601), (102, 1200, 1201),
           (103, 3900, 5000), (104, 0, 1)]
    p = spark.createDataFrame(pts, "point_id long, p_sec long")
    i = spark.createDataFrame(ivs, "interval_id long, s_sec long, e_sec long")
    got = {(r.point_id, r.interval_id)
           for r in interval_join_bucketed(p, i, bucket_sec=600).collect()}
    want = {(pid, iid) for pid, ps in pts for iid, s, e in ivs if s <= ps < e}
    assert got == want


def test_interval_join_rejects_inverted_intervals(spark):
    """An inverted interval (e <= s) matches nothing under half-open
    semantics AND must not explode a descending O(span) bucket
    sequence into the join input (one corrupt row could fan out
    millions of junk rows before the post-filter)."""
    from news_crawler_spark.operators.rangejoin import interval_join_bucketed

    p = spark.createDataFrame([(0, 500)], "point_id long, p_sec long")
    # inverted by 10^9 seconds: without the guard this alone explodes
    # ~1.6M descending bucket rows at bucket_sec=600
    i = spark.createDataFrame(
        [(1, 1_000_000_000, 0), (2, 400, 400), (3, 400, 600)],
        "interval_id long, s_sec long, e_sec long")
    got = {(r.point_id, r.interval_id)
           for r in interval_join_bucketed(p, i, bucket_sec=600).collect()}
    assert got == {(0, 3)}


def test_interval_join_random_property(spark):
    """Randomized property check: bucket-decomposed result equals the
    brute-force containment join for arbitrary interval layouts
    (zero-length, bucket-straddling, nested, disjoint)."""
    import random

    from news_crawler_spark.operators.rangejoin import interval_join_bucketed

    rng = random.Random(99)
    pts = [(i, rng.randrange(0, 50_000)) for i in range(300)]
    ivs = []
    for j in range(60):
        s = rng.randrange(0, 50_000)
        ln = rng.choice([0, 1, 5, 599, 600, 601, 7_000, 25_000])
        ivs.append((1000 + j, s, s + ln))
    p = spark.createDataFrame(pts, "point_id long, p_sec long")
    i = spark.createDataFrame(ivs, "interval_id long, s_sec long, e_sec long")
    got = {(r.point_id, r.interval_id)
           for r in interval_join_bucketed(p, i, bucket_sec=600).collect()}
    want = {(pid, iid) for pid, ps in pts for iid, s, e in ivs if s <= ps < e}
    assert got == want


def test_multimodal_resize_frames_features(spark):
    """The full multimodal verb set (resize, frame-sample,
    feature-extract) with real Spark plumbing: schemas, UDTF-shaped
    row expansion, determinism, gate on fake=False — and the bridge
    into the similarity operators (duplicate payloads → identical
    embeddings → cosine 1.0)."""
    import pytest as _pytest

    from news_crawler_spark.operators.multimodal import (
        extract_features, resize_images, sample_frames)

    rows = [("d1", b"payload-one"), ("d2", b"payload-two"),
            ("d3", b"payload-one")]  # d3 duplicates d1's bytes
    df = spark.createDataFrame(rows, "doc_id string, body binary")
    media = attach_binary(df, "body")

    rz = resize_images(media, width=8, height=4, fake=True).collect()
    assert all(len(bytes(r.body)) == 8 * 4 and r.width == 8 for r in rz)

    fr = sample_frames(media, every_ms=60_000, max_frames=5, fake=True)
    got = fr.groupBy("doc_id").count().collect()
    assert all(1 <= r["count"] <= 5 for r in got)
    twice = sample_frames(media, every_ms=60_000, max_frames=5, fake=True)
    assert sorted(map(tuple, fr.collect())) == sorted(map(tuple, twice.collect()))

    emb = extract_features(media, dim=16, fake=True)
    by_id = {r.doc_id: r.embedding for r in emb.collect()}
    assert by_id["d1"] == by_id["d3"] != by_id["d2"]
    assert len(by_id["d1"]) == 16 and all(-1.0 <= x <= 1.0 for x in by_id["d1"])

    for op in (resize_images, sample_frames, extract_features):
        with _pytest.raises(Exception, match="NotImplementedError|libs"):
            op(media, fake=False).collect()


def test_hll_accuracy_both_branches(spark):
    """HLL estimate within theoretical error on a 20k-NDV input:
    p=12 (linear-counting regime at this NDV) near-exact, p=6 (raw
    estimator, sigma ~ 1.04/8 = 13%) within 3 sigma."""
    from news_crawler_spark.operators.sketches import hll_count_distinct

    df = spark.range(20_000).selectExpr("CAST(id AS STRING) AS v")
    p12 = hll_count_distinct(df, "v", p=12).collect()[0].ndv_hll
    p6 = hll_count_distinct(df, "v", p=6).collect()[0].ndv_hll
    assert abs(p12 - 20_000) / 20_000 < 0.05
    assert abs(p6 - 20_000) / 20_000 < 0.40


def test_hll_registers_merge_across_segments(spark):
    """The register table is the mergeable state: max-merging two
    segments' registers equals sketching the union directly — how a
    100 TB corpus folds per-partition sketches without re-reading."""
    from news_crawler_spark.operators.sketches import (
        hll_estimate, hll_registers)

    lo = spark.range(0, 6_000).selectExpr("CAST(id AS STRING) AS v")
    hi = spark.range(4_000, 10_000).selectExpr("CAST(id AS STRING) AS v")
    merged = (
        hll_registers(lo, "v", p=10)
        .unionByName(hll_registers(hi, "v", p=10))
        .groupBy("bucket").agg(F.max("r").alias("r"))
    )
    whole = hll_registers(
        spark.range(10_000).selectExpr("CAST(id AS STRING) AS v"),
        "v", p=10)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))
    est_m = hll_estimate(merged, p=10).collect()[0].ndv_hll
    est_w = hll_estimate(whole, p=10).collect()[0].ndv_hll
    assert est_m == est_w
    assert abs(est_m - 10_000) / 10_000 < 0.15


def test_hll_rejects_bad_precision(spark):
    from news_crawler_spark.operators.sketches import hll_registers

    df = spark.range(5).selectExpr("CAST(id AS STRING) AS v")
    for p in (3, 19):
        with pytest.raises(ValueError, match="p must be"):
            hll_registers(df, "v", p=p)


def test_cms_never_underestimates_and_merges(spark):
    """CMS point estimates are >= true counts, exact when collision-
    free; summing two segments' counter tables equals sketching the
    union (the mergeable-state property)."""
    from news_crawler_spark.operators.sketches import (
        cms_counters, cms_lookup)

    words = ["alpha"] * 50 + ["beta"] * 30 + ["gamma"] * 7 + ["delta"] * 1
    df = spark.createDataFrame([(w,) for w in words], "v string")
    counters = cms_counters(df, "v", d=4, w=64)
    q = spark.createDataFrame(
        [("alpha", 50), ("beta", 30), ("gamma", 7), ("delta", 1),
         ("absent", 0)], "v string, truth long")
    got = {r.v: (r.cms_est, r.truth)
           for r in cms_lookup(counters, q, "v", d=4, w=64).collect()}
    assert all(est >= truth for est, truth in got.values())
    assert got["alpha"][0] == 50  # heavy item exact at this load

    lo = spark.createDataFrame([(w,) for w in words[:40]], "v string")
    hi = spark.createDataFrame([(w,) for w in words[40:]], "v string")
    merged = (
        cms_counters(lo, "v", d=4, w=64)
        .unionByName(cms_counters(hi, "v", d=4, w=64))
        .groupBy("i", "col").agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, counters.collect()))

    # weighted insert from a pre-aggregated (value, count) table
    # produces the identical cells (CMS is a sum)
    agg = df.groupBy("v").agg(F.count("*").alias("n"))
    weighted = cms_counters(agg, "v", d=4, w=64, weight_col="n")
    assert sorted(map(tuple, weighted.collect())) == \
        sorted(map(tuple, counters.collect()))


def test_session_window_gap_boundary(spark):
    """Spark's session boundary is INCLUSIVE: an event at exactly
    start+gap MERGES into the session (probed on 4.1.2); one
    microsecond past the gap opens a new one. The session_window_agg
    oracle pins this with a strictly-greater break condition."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 1.0),                                # session A
        (1, base + dt.timedelta(minutes=10), 2.0),     # exactly gap → merges
        (2, base, 1.0),                                # session B
        (2, base + dt.timedelta(minutes=10, microseconds=1), 2.0),  # > gap → new
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", "n").collect()
    )
    per_user = sorted((r.user_id, r.n) for r in got)
    assert per_user == [(1, 2), (2, 1), (2, 1)]


def test_pagerank_matches_python_model_exactly(spark):
    """Integer PageRank equals a serial Python replay bit-for-bit
    (the property the unrolled-CTE oracle relies on), including a
    sink node (in-links only) whose mass is kept, not redistributed."""
    from news_crawler_spark.operators.linkrank import pagerank

    edge_list = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
                 ("d", "a"), ("a", "sink")]
    df = spark.createDataFrame(edge_list, "src string, dst string")
    got = {r.node: r.rank_micro
           for r in pagerank(df, iterations=3).collect()}

    scale, d_pct = 10**12, 85
    nodes = sorted({x for e in edge_list for x in e})
    out = {}
    for s, _ in edge_list:
        out[s] = out.get(s, 0) + 1
    n = len(nodes)
    base = (100 - d_pct) * scale // (100 * n)
    r = {v: scale // n for v in nodes}
    for _ in range(3):
        mass = {v: 0 for v in nodes}
        for s, t in edge_list:
            mass[t] += (r[s] * d_pct) // (100 * out[s])
        r = {v: base + mass[v] for v in nodes}
    assert got == r
    assert got["sink"] > base  # sink received mass and kept it


def test_histogram_quantiles_bounds_and_merge(spark):
    """Estimates sit within one bin width of the exact percentile;
    bin-summing two segments' histograms equals the whole histogram."""
    from news_crawler_spark.operators.sketches import (
        histogram_counts, histogram_quantiles)

    vals = [float(x) for x in range(1000)]  # uniform 0..999
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    kw = dict(lo=0.0, hi=1000.0, n_bins=50)  # width 20
    hist = histogram_counts(df, "v", **kw)
    est = {r.pct: r.est
           for r in histogram_quantiles(hist, [50, 90, 99], **kw).collect()}
    import numpy as np
    for pct in (50, 90, 99):
        exact = float(np.percentile(vals, pct))
        assert abs(est[pct] - exact) <= 20.0 + 1e-9

    lo_half = spark.createDataFrame([(v,) for v in vals[:500]], "v double")
    hi_half = spark.createDataFrame([(v,) for v in vals[500:]], "v double")
    merged = (histogram_counts(lo_half, "v", **kw)
              .unionByName(histogram_counts(hi_half, "v", **kw))
              .groupBy("bin").agg(F.sum("cnt").alias("cnt")))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, hist.collect()))


def test_parse_spans_udf_matches_python_parser(spark):
    """The standalone re-parse UDF (S6 backfill path) returns exactly
    html_to_spans for real rendered fixture HTML, and empty arrays
    for null/empty bodies instead of throwing."""
    from news_crawler_spark.fixtures.sitegen import SiteConfig, synth_html
    from news_crawler_spark.functions.htmlspans import (
        html_to_spans, parse_spans)

    cfg = SiteConfig(seed=11, n_hosts=3, base_pages=20, richness=2)
    pages = [synth_html(cfg, cfg.page_url(h, p))[1]
             for h in range(3) for p in range(4)]
    rows = [(i, h) for i, h in enumerate(pages)] + [(98, None), (99, "")]
    df = spark.createDataFrame(rows, "i int, body string")
    got = {r.i: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
           for r in df.select("i", parse_spans("body").alias("spans"))
           .collect()}
    for i, h in enumerate(pages):
        assert got[i] == html_to_spans(h)
    assert got[98] == [] and got[99] == []


def test_review_edge_cases_salt_null_empty_inputs(spark):
    """Review-found edges: NULL salt_src rows must still join (a NULL
    salt never equi-matches), pagerank on an empty graph returns
    empty instead of dividing by zero, ungrouped HLL on empty input
    estimates 0 (not NULL), and cms_lookup tolerates query columns
    named i/col/cnt."""
    from news_crawler_spark.operators.linkrank import pagerank
    from news_crawler_spark.operators.sketches import (
        cms_counters, cms_lookup, hll_count_distinct)
    from news_crawler_spark.operators.topk import salted_join

    big = spark.createDataFrame(
        [(1, None, "x"), (1, 10, "y"), (2, 20, "z")],
        "k long, rid int, payload string")
    small = spark.createDataFrame([(1, "dim1"), (2, "dim2")],
                                  "k long, name string")
    j = salted_join(big, small, "k", salt_src="rid", n_salts=4)
    assert j.count() == 3  # the NULL-rid row still joined

    empty_edges = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty_edges, iterations=2).count() == 0

    empty = spark.createDataFrame([], "v string")
    assert hll_count_distinct(empty, "v", p=8).collect()[0].ndv_hll == 0

    q = spark.createDataFrame([("alpha", 1, 2, 3)],
                              "v string, i int, col int, cnt int")
    data = spark.createDataFrame([("alpha",), ("alpha",), ("beta",)],
                                 "v string")
    got = cms_lookup(cms_counters(data, "v", d=2, w=16), q, "v",
                     d=2, w=16).collect()
    assert len(got) == 1 and got[0].cms_est >= 2


# ---------------------------------------------------------------- packing
def test_pack_sequences_matches_serial_packer(spark):
    """Engine-level packing (operators/packing.pack_sequences) pinned
    to a serial Python packer: same sha2 shard, same (shard_cols,
    shard, doc_id)-ordered greedy cumsum, same bins — plus the two
    invariants: offsets contiguous per shard, and no bin exceeds the
    budget except via its last (straddling) document."""
    import hashlib

    from news_crawler_spark.operators import pack_sequences

    budget, n_shards = 50, 4
    rows = [(f"l{d % 2}", d, 7 + (d * 13) % 40) for d in range(80)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n_tokens long")
    got = pack_sequences(df, "n_tokens", budget,
                         shard_cols=["lang"], n_shards=n_shards)
    got_rows = {r.doc_id: r for r in got.collect()}

    def shard_of(doc_id):
        return int(hashlib.sha256(str(doc_id).encode()).hexdigest()[:8],
                   16) % n_shards

    groups = {}
    for lang, d, n in rows:
        groups.setdefault((lang, shard_of(d)), []).append((d, n))
    for (lang, sh), docs in groups.items():
        off = 0
        for d, n in sorted(docs):
            r = got_rows[d]
            assert (r.lang, r.shard, r.offset, r.bin_id) == \
                (lang, sh, off, off // budget), d
            off += n
    # bin-budget invariant: drop each bin's straddler, rest fits
    for (lang, sh), docs in groups.items():
        bins = {}
        off = 0
        for d, n in sorted(docs):
            bins.setdefault(off // budget, []).append((off, n))
            off += n
        for b, members in bins.items():
            non_straddle = [n for off, n in members
                            if off + n <= (b + 1) * budget]
            assert sum(non_straddle) <= budget


def test_pack_sequences_rejects_bad_args(spark):
    import pytest as _pytest

    from news_crawler_spark.operators import pack_sequences

    df = spark.createDataFrame([("a", 1, 5)],
                               "lang string, doc_id long, n_tokens long")
    with _pytest.raises(ValueError):
        pack_sequences(df, "n_tokens", 0)
    with _pytest.raises(ValueError):
        pack_sequences(df, "n_tokens", 10, n_shards=0)


def test_gopher_gate_rules(spark):
    """Each Gopher rule trips independently: word-count floor, mean
    word length band, symbol ratio, alpha fraction, stopword floor."""
    from news_crawler_spark.operators import gopher_gate

    good = ("the cat and the dog have fun with all of that stuff "
            "and they be going to the park every day for fun") * 2
    df = spark.createDataFrame(
        [(1, good),
         (2, "the of and to be"),                       # too few words
         (3, "aa " * 30 + "the of and to"),             # mwl < 3
         (4, ("### " * 10) + good),                     # symbol ratio
         (5, ("123 456 789 " * 12) + "the of and"),     # alpha frac low
         (6, "alpha beta gamma delta epsilon " * 8)],   # no stopwords
        "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_gate(df, min_words=20).collect()}
    assert got[1].keep
    assert not got[2].keep and got[2].n_words < 20
    assert not got[3].keep and got[3].mean_word_len < 3
    assert not got[4].keep and got[4].symbol_word_ratio > 0.1
    assert not got[5].keep and got[5].alpha_word_frac < 0.8
    assert not got[6].keep and got[6].n_stop_hits < 2
