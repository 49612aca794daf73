"""Serial-reference tests for the corpus-composition operators
(operators/substr.py, classifier.py, mixture.py): each Spark result is
checked against an independent pure-Python implementation of the same
semantics, plus targeted edge cases (NULL text, short docs,
within-doc repeats, tie-breaks)."""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from news_crawler_spark.operators import (
    domain_mixture,
    duplicate_ngram_spans,
    hashed_classifier_scores,
    training_shuffle,
)


def _toks(text):
    if text is None:
        return None
    return [t for t in text.strip().lower().split() if t]


def _sha_long(s: str, start: int, width: int) -> int:
    h = hashlib.sha256(s.encode()).hexdigest()
    return int(h[start : start + width], 16)


DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "a"),
    # doc 2 repeats doc 1's first 9 tokens -> shared 8-grams
    (2, "alpha beta gamma delta epsilon zeta eta theta iota OTHER", "en", "a"),
    # doc 3 repeats an 8-gram within itself, twice, plus filler
    (3, "x1 x2 x3 x4 x5 x6 x7 x8 filler1 filler2 x1 x2 x3 x4 x5 x6 x7 x8",
     "en", "b"),
    (4, "too short for any gram", "en", "b"),
    (5, None, "en", "b"),
    (6, "   ", "en", "c"),
    (7, "unique seven tokens of completely fresh text here today ok",
     "ko", "c"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string"
    )


def _serial_dup_spans(rows, k=8, min_count=2):
    occ = {}
    for doc_id, text, _, _ in rows:
        t = _toks(text)
        if not t or len(t) < k:
            continue
        for p in range(len(t) - k + 1):
            g = " ".join(t[p : p + k])
            occ.setdefault(g, []).append((doc_id, p))
    covered = {}
    for g, places in occ.items():
        if len(places) >= min_count:
            for doc_id, p in places:
                covered.setdefault(doc_id, set()).add(p)
    out = []
    for doc_id, starts in covered.items():
        starts = sorted(starts)
        cur = [starts[0], starts[0]]
        islands = []
        for p in starts[1:]:
            if p - cur[1] > k:
                islands.append(tuple(cur))
                cur = [p, p]
            else:
                cur[1] = p
        islands.append(tuple(cur))
        for s, e in islands:
            out.append((doc_id, s, e + k - 1, e + k - s))
    return sorted(out)


def test_duplicate_ngram_spans_matches_serial(spark, docs_df):
    got = sorted(
        tuple(r)
        for r in duplicate_ngram_spans(docs_df, k=8).collect()
    )
    assert got == _serial_dup_spans(DOCS, k=8)
    # sanity on the content: docs 1/2 share tokens 0..8 -> two grams
    # at pos 0,1 merge into span [0, 8]; doc 3's self-repeat covers
    # both copies of x1..x8
    by_doc = {}
    for d, s, e, n in got:
        by_doc.setdefault(d, []).append((s, e, n))
    assert by_doc[1] == [(0, 8, 9)]
    assert by_doc[2] == [(0, 8, 9)]
    assert (0, 7, 8) in by_doc[3] and (10, 17, 8) in by_doc[3]
    assert 4 not in by_doc and 5 not in by_doc and 7 not in by_doc


def test_duplicate_ngram_spans_min_count(spark, docs_df):
    # raising min_count to 3 kills the doc1/doc2 pair (each gram
    # occurs exactly twice) and doc3's self-pair
    assert duplicate_ngram_spans(docs_df, k=8, min_count=3).count() == 0


def _serial_classifier(rows, n_buckets=4096, bias=0.0):
    out = {}
    for doc_id, text, _, _ in rows:
        t = _toks(text)
        if t is None:
            out[doc_id] = (None, None, False)
            continue
        if not t:
            out[doc_id] = (0, None, False)
            continue
        wsum = 0.0
        for tok in t:
            b = _sha_long(tok, 0, 8) % n_buckets
            wsum += (b / (n_buckets - 1) - 0.5) * 2.0
        score = round(1.0 / (1.0 + math.exp(-(wsum / len(t) + bias))), 6)
        out[doc_id] = (len(t), score, score >= 0.5)
    return out


def test_hashed_classifier_matches_serial(spark, docs_df):
    got = {
        r["doc_id"]: (r["n_tokens"], r["score"], r["keep"])
        for r in hashed_classifier_scores(docs_df).collect()
    }
    want = _serial_classifier(DOCS)
    assert set(got) == set(want)
    for d in want:
        gn, gs, gk = got[d]
        wn, ws, wk = want[d]
        assert gn == wn, d
        assert gk == wk, d
        if ws is None:
            assert gs is None
        else:
            assert gs == pytest.approx(ws, abs=1e-9)


def test_domain_mixture_matches_serial(spark, docs_df):
    rows = {r["source"]: r for r in domain_mixture(docs_df).collect()}
    counts = {}
    for _, text, _, src in DOCS:
        t = _toks(text) or []
        d, n = counts.get(src, (0, 0))
        counts[src] = (d + 1, n + len(t))
    tw = sum(n**0.3 for _, n in counts.values())
    assert set(rows) == set(counts)
    total_weight = 0.0
    for src, (d, n) in counts.items():
        r = rows[src]
        assert r["n_docs"] == d and r["n_tokens"] == n
        w = round(n**0.3 / tw, 6)
        assert r["mixture_weight"] == pytest.approx(w, abs=1e-9)
        assert r["expected_tokens"] == round(w * 1_000_000)
        total_weight += r["mixture_weight"]
    assert total_weight == pytest.approx(1.0, abs=1e-4)


def test_training_shuffle_is_a_permutation(spark, docs_df):
    rows = training_shuffle(docs_df, n_buckets=4, seed="s").collect()
    assert len(rows) == len(DOCS)
    assert {r["doc_id"] for r in rows} == {d for d, *_ in DOCS}
    # shard assignment replays serially; within-shard positions are
    # contiguous from 1 in (key, doc_id) order
    by_shard = {}
    for r in rows:
        key = _sha_long(f"s:{r['doc_id']}", 0, 15)
        assert r["shard"] == key % 4
        by_shard.setdefault(r["shard"], []).append((key, r["doc_id"], r["shard_pos"]))
    for shard, members in by_shard.items():
        members.sort()
        assert [m[2] for m in members] == list(range(1, len(members) + 1))


_WORD = st.sampled_from(["aa", "bb", "cc"])
_TEXT = st.one_of(
    st.none(),
    st.lists(_WORD, min_size=0, max_size=30).map(" ".join),
)


@given(texts=st.lists(_TEXT, min_size=1, max_size=8))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_duplicate_ngram_spans_property(spark, texts):
    """Generative: tiny alphabet at k=3 forces dense gram collisions
    (within-doc repeats, cross-doc shares, touching islands) — the
    Spark result must equal the serial model on every draw."""
    rows = [(i + 1, t, "en", "s") for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = sorted(
        tuple(r) for r in duplicate_ngram_spans(df, k=3).collect()
    )
    assert got == _serial_dup_spans(rows, k=3)


def _serial_semdedup(vecs, threshold, n_centroids=16):
    """Independent model of semantic_dedup: assignment = argmax rounded
    cosine over the first n_centroids vectors (cell-ascending
    tiebreak), drop = any smaller-id same-cell neighbor at rounded
    cosine >= threshold."""
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    cell = {}
    cent_ids = sorted(vecs)[:n_centroids]
    for vid, v in vecs.items():
        best = max(
            ((cos(v, vecs[c]), -c) for c in cent_ids),
        )
        cell[vid] = -best[1]
    out = {}
    for vid, v in vecs.items():
        dup = any(
            o < vid and cell[o] == cell[vid]
            and cos(v, vecs[o]) >= threshold
            for o in vecs
        )
        out[vid] = (cell[vid], not dup)
    return out


def _planted_vectors():
    """16 one-hot centroids (ids 0-15, mutually orthogonal) plus four
    planted vectors: 16 = exact scaled copy of e2, 17 = near-copy of
    e2 (cos ~0.9987), 18 = equal mix of e4/e5 (cos 0.7071 with both,
    cell tiebreak -> 4), 19 = 0.8*e7 + 0.6*e1 (cos 0.8 with e7)."""
    vecs = {i: [1.0 if j == i else 0.0 for j in range(16)]
            for i in range(16)}
    vecs[16] = [3.0 if j == 2 else 0.0 for j in range(16)]
    v17 = [0.0] * 16
    v17[2], v17[5] = 0.95, 0.05
    vecs[17] = v17
    v18 = [0.0] * 16
    v18[4] = v18[5] = 1.0
    vecs[18] = v18
    v19 = [0.0] * 16
    v19[7], v19[1] = 0.8, 0.6
    vecs[19] = v19
    return vecs


@pytest.mark.parametrize("threshold", [0.9, 0.6])
def test_semantic_dedup_planted(spark, threshold):
    from news_crawler_spark.operators import semantic_dedup

    vecs = _planted_vectors()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: (r["cell"], r["keep"])
           for r in semantic_dedup(df, threshold=threshold).collect()}
    want = _serial_semdedup(vecs, threshold)
    assert got == want
    # pin the planted story at the default threshold
    if threshold == 0.9:
        assert got[16] == (2, False)   # exact copy of e2 -> dropped
        assert got[17] == (2, False)   # near-copy (cos ~0.9987)
        assert got[18][1] and got[19][1]  # mixes survive at 0.9
        assert all(got[i] == (i, True) for i in range(16))
    else:
        assert not got[18][1]          # 0.7071 >= 0.6 -> dropped
        assert not got[19][1]          # 0.8 >= 0.6 -> dropped


def test_quality_weighted_sample_serial_replay(spark):
    """The sampling draw replays serially: u = sha256('qs:'||id)
    60-bit prefix / 2^60, keep iff u < classifier score (NULL-score
    docs never kept)."""
    import __spark_entry__ as entry

    rows = entry.q_quality_weighted_sample(
        spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    kept = 0
    for r in rows[:200]:
        u = _sha_long(f"qs:{r['doc_id']}", 0, 15) / float(2 ** 60)
        assert r["draw"] == pytest.approx(round(u, 9), abs=1e-12)
        if r["score"] is None:
            assert r["keep"] is False
        else:
            assert r["keep"] == (u < r["score"])
        kept += bool(r["keep"])
    # scores hover near 0.5 on random text -> the sample is a real
    # subset, not all/none
    assert 0 < kept < len(rows[:200])


def test_perplexity_buckets_cut_logic(spark):
    """Serial replay of the banding stage: given the engine's
    cross-entropy scores, the per-language cut bins must be the
    minimal bins whose cumulative count clears the integer-rank
    thresholds ceil(33n/100) / ceil(67n/100), and every document must
    be banded by its own bin against those cuts."""
    import __spark_entry__ as entry

    rows = entry.q_perplexity_buckets(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_lang = {}
    for r in rows:
        b = min(max(math.floor(r["cross_entropy"] / 0.25), 0), 63)
        by_lang.setdefault(r["lang"], []).append((b, r["ppl_bucket"]))
    for lang, members in by_lang.items():
        n = len(members)
        counts = {}
        for b, _ in members:
            counts[b] = counts.get(b, 0) + 1
        cuts = {}
        for pct in (33, 67):
            need = (pct * n + 99) // 100
            cum = 0
            for b in sorted(counts):
                cum += counts[b]
                if cum >= need:
                    cuts[pct] = b
                    break
        for b, bucket in members:
            want = ("head" if b <= cuts[33]
                    else "middle" if b <= cuts[67] else "tail")
            assert bucket == want, (lang, b, bucket, want)
        # cumulative coverage: head clears the 33% rank, head+middle
        # clears 67% (bin granularity can only overshoot, never under)
        n_head = sum(1 for _, bk in members if bk == "head")
        n_mid = sum(1 for _, bk in members if bk == "middle")
        assert n_head >= (33 * n + 99) // 100
        assert n_head + n_mid >= (67 * n + 99) // 100


def test_training_shuffle_seed_changes_order(spark, docs_df):
    a = {r["doc_id"]: (r["shard"], r["shard_pos"])
         for r in training_shuffle(docs_df, n_buckets=4, seed="s1").collect()}
    b = {r["doc_id"]: (r["shard"], r["shard_pos"])
         for r in training_shuffle(docs_df, n_buckets=4, seed="s2").collect()}
    assert a != b  # different permutation...
    assert set(a) == set(b)  # ...same membership


def test_c4_clean_rules(spark):
    from news_crawler_spark.operators import c4_clean

    rows = [
        # 2 good lines -> kept, keep=True; nav line dropped (no
        # terminal punct AND badword)
        (1, "nav menu javascript\nThis is a real sentence.\n"
            "Another proper line ends here!"),
        # only 1 good line -> keep=False (min_kept_lines=2)
        (2, "short.\nOne good line survives today."),
        # doc-level lorem ipsum -> keep=False even with 2 good lines
        (3, "This is a real sentence.\nAnother proper line ends here!\n"
            "lorem ipsum dolor"),
        # curly brace poisons the doc
        (4, "This is a real sentence.\nAnother proper line ends here!\n"
            "var x = { a: 1 };"),
        # line fails the word floor ("Too short." = 2 words)
        (5, "Too short.\nBut this line is long enough honestly."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_clean(df).collect()}

    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 2
    assert out[1]["keep"] is True
    # kept lines re-joined in original order
    want = hashlib.sha256(
        b"This is a real sentence.\nAnother proper line ends here!"
    ).hexdigest()
    assert out[1]["clean_sha"] == want

    assert out[2]["n_kept"] == 1 and out[2]["keep"] is False
    assert out[3]["n_kept"] == 2 and out[3]["keep"] is False
    assert out[4]["keep"] is False
    assert out[5]["n_kept"] == 1 and out[5]["keep"] is False
    # "short." has 1 word -> dropped by the word floor; sha is the
    # surviving line alone
    assert out[2]["clean_sha"] == hashlib.sha256(
        b"One good line survives today.").hexdigest()


def test_paragraph_dedup_first_wins(spark):
    from news_crawler_spark.operators import paragraph_dedup

    NAV = "subscribe now"
    rows = [
        (1, NAV + "\n\n" + "body one unique" + "\n\n" + "footer a"),
        (2, NAV + "\n\n" + "body two unique" + "\n\n" + "footer a"),
        (3, NAV + "\n\n" + NAV),                    # dup within one doc
        (4, "body two unique"),                      # seen in doc 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}

    # serial first-wins replay
    seen, model = set(), {}
    for doc_id, text in rows:
        paras = [p.strip() for p in text.split("\n\n") if p.strip()]
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        model[doc_id] = (len(paras), len(kept), kept)

    for doc_id, (n_paras, n_kept, kept) in model.items():
        assert out[doc_id]["n_paras"] == n_paras, doc_id
        assert out[doc_id]["n_kept"] == n_kept, doc_id
        if kept:
            want = hashlib.sha256("\n\n".join(kept).encode()).hexdigest()
            assert out[doc_id]["kept_sha"] == want, doc_id
        else:
            assert out[doc_id]["kept_sha"] is None, doc_id
    # doc 4's only paragraph was claimed by doc 2 -> nothing survives
    assert out[4]["n_kept"] == 0 and out[4]["kept_ratio"] == 0.0
    # every distinct paragraph survives exactly once corpus-wide
    assert sum(v[1] for v in model.values()) == len(seen)


def test_dsir_logratio_matches_serial(spark):
    from news_crawler_spark.operators import dsir_logratio

    rows = [
        (1, "kimchi seoul hangang kimchi seoul", "ko"),
        (2, "kimchi hangang palace seoul news", "ko"),
        (3, "baseball hotdog stadium baseball run", "en"),
        (4, "kimchi seoul baseball mixed bag here", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r
           for r in dsir_logratio(
               df, df.filter("lang = 'ko'"), n_buckets=64).collect()}

    def feats(text):
        t = _toks(text)
        g = t + [f"{a} {b}" for a, b in zip(t, t[1:])]
        return [_sha_long(x, 0, 8) % 64 for x in g]

    raw, tgt = {}, {}
    for _, text, lang in rows:
        for b in feats(text):
            raw[b] = raw.get(b, 0) + 1
            if lang == "ko":
                tgt[b] = tgt.get(b, 0) + 1
    n_raw, n_tgt = sum(raw.values()), sum(tgt.values())

    for doc_id, text, _ in rows:
        fs = feats(text)
        lrs = [
            math.log((tgt.get(b, 0) + 1) / (n_tgt + 64))
            - math.log((raw[b] + 1) / (n_raw + 64))
            for b in fs
        ]
        assert out[doc_id]["n_feats"] == len(fs)
        assert out[doc_id]["dsir_logw"] == pytest.approx(
            round(sum(lrs) / len(lrs), 6), abs=1e-6), doc_id

    # in-domain docs weigh above the out-of-domain doc
    assert min(out[1]["dsir_logw"], out[2]["dsir_logw"]) \
        > out[3]["dsir_logw"]


def test_kmeans_fit_recovers_planted_clusters(spark):
    from news_crawler_spark.operators import kmeans_fit

    # 3 planted directions in R^8, 5 jittered members each; ids are
    # ordered so the first-3-by-id seed starts one centroid per group
    import random
    rng = random.Random(7)
    axes = [[1, 0, 0, 0, 0, 0, 0, 0],
            [0, 1, 0, 0, 0, 0, 0, 0],
            [0, 0, 1, 0, 0, 0, 0, 0]]
    rows = []
    vid = 0
    for rep in range(5):
        for g, ax in enumerate(axes):
            vec = [x + rng.uniform(-0.05, 0.05) for x in ax]
            rows.append((vid, [float(v) for v in vec], g))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {r["vec_id"]: r["cell"]
           for r in kmeans_fit(df, k=3, iters=2).collect()}
    assert len(got) == len(rows)
    # every member of a planted group lands in the same final cell,
    # and distinct groups land in distinct cells
    cells = {}
    for vid_, _, g in rows:
        cells.setdefault(g, set()).add(got[vid_])
    assert all(len(s) == 1 for s in cells.values()), cells
    assert len({next(iter(s)) for s in cells.values()}) == 3


def test_span_dedup_first_wins_by_kind(spark):
    from news_crawler_spark.operators import span_dedup

    def s(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref,
                "offset": off}

    rows = [
        (1, [s("text", "nav bar", "", 0), s("text", "body one", "", 1),
             s("media", "", "img/logo", 2)]),
        (2, [s("text", "nav bar", "", 0), s("media", "", "img/logo", 1),
             s("text", "body two", "", 2)]),
        # same text in a 'link' span still collides with the text span
        (3, [s("link", "nav bar", "", 0), s("media", "", "img/unique", 1)]),
    ]
    schema = ("doc_id long, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    out = {r["doc_id"]: r
           for r in span_dedup(
               spark.createDataFrame(rows, schema)).collect()}

    # doc 1 is first everywhere: keeps all 3 spans
    assert out[1]["n_kept"] == 3 and out[1]["n_media_kept"] == 1
    assert out[1]["kept_text_sha"] == hashlib.sha256(
        b"nav bar body one").hexdigest()
    # doc 2 loses the nav text and the logo media, keeps its body
    assert out[2]["n_kept"] == 1 and out[2]["n_media_kept"] == 0
    assert out[2]["kept_text_sha"] == hashlib.sha256(
        b"body two").hexdigest()
    # doc 3's link span dups doc 1's nav text; its media is fresh
    assert out[3]["n_kept"] == 1 and out[3]["n_media_kept"] == 1
    assert out[3]["kept_text_sha"] is None


def test_recrawl_intervals_estimator(spark):
    from news_crawler_spark.operators import recrawl_intervals

    rows = [
        # url 1: 5 fetches 100s apart, 2 changes
        *[(1, 1000 + i * 100, i in (1, 3)) for i in range(5)],
        # url 2: never changed -> cold branch, max interval
        *[(2, 1000 + i * 50, False) for i in range(4)],
        # url 3: single fetch -> inestimable
        (3, 1000, True),
        # url 4: changes every fetch -> rate clamps interval to min
        *[(4, 1000 + i, True) for i in range(10)],
    ]
    df = spark.createDataFrame(
        rows, "url_id long, fetch_sec long, changed boolean")
    out = {r["url_id"]: r
           for r in recrawl_intervals(
               df, min_interval=60.0, max_interval=86400.0).collect()}

    r_hat = -math.log((5 - 2 + 0.5) / (5 + 0.5))
    rate = r_hat / (400 / 4)
    assert out[1]["n_fetches"] == 5 and out[1]["n_changes"] == 2
    assert out[1]["change_rate"] == pytest.approx(rate, rel=1e-6)
    assert out[1]["next_interval_sec"] == pytest.approx(
        min(max(1.0 / rate, 60.0), 86400.0), rel=1e-6)

    assert out[2]["change_rate"] is None
    assert out[2]["next_interval_sec"] == 86400.0
    assert out[3]["change_rate"] is None
    assert out[3]["next_interval_sec"] == 86400.0
    # x == n stays finite and fast: interval hits the floor
    assert out[4]["next_interval_sec"] == 60.0
    # more observed changes => shorter interval (monotonicity)
    assert (out[4]["next_interval_sec"] < out[1]["next_interval_sec"]
            < out[2]["next_interval_sec"])


_PARA = st.sampled_from(["aa bb", "bb cc", "cc aa", "aa aa", "dd"])
_PARA_TEXT = st.lists(_PARA, min_size=1, max_size=6).map("\n\n".join)


@given(texts=st.lists(_PARA_TEXT, min_size=1, max_size=6))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_paragraph_dedup_property(spark, texts):
    """Generative: a 5-paragraph alphabet forces dense cross-doc and
    within-doc collisions. Invariants: (1) corpus-wide, every distinct
    paragraph survives EXACTLY once (sum of n_kept == distinct
    paragraph count); (2) per doc, n_kept matches the serial
    first-wins replay in (doc_id, pos) order."""
    from news_crawler_spark.operators import paragraph_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}

    seen = set()
    distinct = set()
    for doc_id, text in rows:
        paras = [p.strip() for p in text.split("\n\n") if p.strip()]
        kept = 0
        for para in paras:
            distinct.add(para)
            if para not in seen:
                seen.add(para)
                kept += 1
        assert out[doc_id]["n_paras"] == len(paras)
        assert out[doc_id]["n_kept"] == kept
    assert sum(r["n_kept"] for r in out.values()) == len(distinct)


_LINE = st.sampled_from([
    "good line here.",          # kept: terminal + 3 words
    "Another fine line today!",  # kept
    "no terminal punct",         # dropped
    "short.",                    # dropped: 1 word
    "javascript heavy line.",    # dropped: badword
])
_LINE_TEXT = st.lists(_LINE, min_size=1, max_size=8).map("\n".join)


@given(texts=st.lists(_LINE_TEXT, min_size=1, max_size=5))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_c4_line_filter_idempotent(spark, texts):
    """Line-filter idempotence: re-cleaning the kept-line text keeps
    every line (kept lines each pass the line rules and contain no
    newline, so the second pass is the identity on them)."""
    from news_crawler_spark.operators import c4_clean

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    first = {r["doc_id"]: r for r in c4_clean(df).collect()}

    # serial replay of the line rules to rebuild the kept text
    def keep_line(line):
        words = [w for w in line.split() if w]
        return (line[-1:] in ".!?\""
                and len(words) >= 3
                and "javascript" not in line.lower())

    rebuilt = []
    for doc_id, text in rows:
        kept = [ln.strip() for ln in text.split("\n")
                if ln.strip() and keep_line(ln.strip())]
        assert first[doc_id]["n_kept"] == len(kept)
        if kept:
            want = hashlib.sha256("\n".join(kept).encode()).hexdigest()
            assert first[doc_id]["clean_sha"] == want
            rebuilt.append((doc_id, "\n".join(kept)))

    if rebuilt:
        df2 = spark.createDataFrame(rebuilt, "doc_id long, text string")
        second = {r["doc_id"]: r for r in c4_clean(df2).collect()}
        for doc_id, text in rebuilt:
            assert second[doc_id]["n_kept"] == second[doc_id]["n_lines"]
            assert second[doc_id]["clean_sha"] == first[doc_id]["clean_sha"]


def test_hits_scores_hand_graph(spark):
    from news_crawler_spark.operators import hits_scores

    # 0 and 4 are hubs pointing into {1,2,3}; 1 gets both hubs
    edges = [(0, 1), (0, 2), (0, 3), (4, 1), (4, 2), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r for r in hits_scores(df, iterations=2).collect()}

    # serial replay with the same round-after-normalize trajectory
    nodes = sorted({n for e in edges for n in e})
    h = {n: 1.0 for n in nodes}
    a = {}
    for _ in range(2):
        a_raw = {}
        for s, d in edges:
            a_raw[d] = a_raw.get(d, 0.0) + h.get(s, 0.0)
        mx = max(a_raw.values())
        a = {n: round(v / mx, 6) for n, v in a_raw.items()}
        h_raw = {}
        for s, d in edges:
            if d in a:
                h_raw[s] = h_raw.get(s, 0.0) + a[d]
        mx = max(h_raw.values())
        h = {n: round(v / mx, 6) for n, v in h_raw.items()}

    # full outer: every node holding either score appears — pure
    # sources (0, 4: hubs with no in-edge) must NOT be dropped
    assert set(out) == set(a) | set(h)
    for n in out:
        if n in a:
            assert out[n]["auth"] == pytest.approx(a[n], abs=1e-9), n
        else:
            assert out[n]["auth"] is None, n
        if n in h:
            assert out[n]["hub"] == pytest.approx(h[n], abs=1e-9), n
        else:
            assert out[n]["hub"] is None, n
    assert {0, 4} <= set(out) and out[0]["auth"] is None
    # node 1 is the strongest authority, node 0 the strongest hub
    assert max(a, key=a.get) == 1
    assert max(h, key=h.get) == 0
