"""BPE merge learning (operators/bpe.py): serial-model equality on
the classic corpus, greedy overlap semantics, segmentation replay."""

from __future__ import annotations

from collections import Counter

from news_crawler_spark.operators.bpe import bpe_segment, bpe_train


def serial_bpe(words: dict[str, int], n_merges: int):
    syms = {w: [c for c in w] for w in words}
    traj = []
    for step in range(1, n_merges + 1):
        pc: Counter = Counter()
        for w, cnt in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[s[i] + " " + s[i + 1]] += cnt
        if not pc:
            break
        best_c = max(pc.values())
        pair = min(p for p, c in pc.items() if c == best_c)
        a, b = pair.split(" ")
        for w, s in syms.items():
            new, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(s[i])
                    i += 1
            syms[w] = new
        vocab = len({x for s in syms.values() for x in s})
        traj.append((step, pair, a + b, best_c, vocab))
    return traj, syms


CORPUS = {"low": 5, "lower": 2, "lowest": 2, "newest": 6, "widest": 3,
          "aaaa": 4, "xy": 1}


def _words(spark, corpus):
    return spark.createDataFrame(list(corpus.items()),
                                 "word string, cnt long")


def test_matches_serial_model(spark):
    got = [tuple(r) for r in
           bpe_train(_words(spark, CORPUS), n_merges=5)
           .orderBy("step").collect()]
    exp, _ = serial_bpe(CORPUS, 5)
    assert got == exp


def test_greedy_overlap_on_runs(spark):
    # 'aaaa' with merge (a,a): greedy left pass yields (aa)(aa) — the
    # paren wrapper is what makes literal replace equal this
    traj = [tuple(r) for r in
            bpe_train(_words(spark, {"aaaa": 10}), n_merges=2)
            .orderBy("step").collect()]
    exp, syms = serial_bpe({"aaaa": 10}, 2)
    assert traj == exp
    assert syms["aaaa"] == ["aaaa"]  # step2 merges (aa,aa)
    assert traj[0][1] == "a a" and traj[1][1] == "aa aa"


def test_segment_replays_merges(spark):
    traj, syms = serial_bpe(CORPUS, 5)
    merges = [tuple(t[1].split(" ")) for t in traj]
    out = bpe_segment(_words(spark, CORPUS), merges)
    got = {r.word: list(r.pieces) for r in out.collect()}
    assert got == syms


def test_single_char_words_contribute_no_pairs(spark):
    traj = bpe_train(_words(spark, {"a": 100, "bc": 1}), n_merges=2).collect()
    assert len(traj) == 1  # only one mergeable pair exists, then dry
    assert traj[0].pair == "b c"


def test_checkpointed_long_run_trajectory_unchanged(spark):
    """25 merges with in-loop checkpointing every 5 steps must produce
    the exact serial trajectory AND equal the unchckpointed run — the
    periodic localCheckpoint is a lineage reset, never a semantic
    change, and it keeps the lazy replace chain linear instead of
    quadratic at large n_merges."""
    corpus = {w: c for w, c in zip(
        ("abab", "ababab", "cdcd", "cdcdcd", "abcd", "dcba", "aabb",
         "ccdd", "abcabc", "xyzxyz", "wxyz", "zyxw", "mnmn", "nopq",
         "qponm", "lowlow", "newest", "widest", "lowest", "slowest"),
        range(20, 0, -1))}
    got_ck = [tuple(r) for r in
              bpe_train(_words(spark, corpus), n_merges=25,
                        checkpoint_every=5).orderBy("step").collect()]
    got_plain = [tuple(r) for r in
                 bpe_train(_words(spark, corpus), n_merges=25,
                           checkpoint_every=0).orderBy("step").collect()]
    exp, _ = serial_bpe(corpus, 25)
    assert got_ck == exp
    assert got_ck == got_plain
