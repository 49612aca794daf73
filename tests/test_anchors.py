"""Anchor-text profile (operators/anchors.py): term weighting,
tie-break determinism, short-token and top-k cutoffs."""

from __future__ import annotations

from news_crawler_spark.operators.anchors import anchor_text_profile


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, anchor string")


def test_counts_rank_and_ties(spark):
    rows = [
        ("s1", "d1", "World News today"),
        ("s2", "d1", "world NEWS"),
        ("s3", "d1", "breaking news!"),
        ("s4", "d2", "a zz yy"),  # 'a' dropped (len<2); zz/yy tie on count
    ]
    got = {(r.dst, r.rank): (r.term, r.n_links)
           for r in anchor_text_profile(_edges(spark, rows)).collect()}
    assert got[("d1", 1)] == ("news", 3)
    assert got[("d1", 2)] == ("world", 2)
    assert got[("d1", 3)] == ("breaking", 1)  # then 'today' at 4
    assert got[("d2", 1)] == ("yy", 1)  # tie → term asc
    assert got[("d2", 2)] == ("zz", 1)
    assert ("d2", 3) not in got


def test_top_k_cutoff(spark):
    rows = [("s", "d", " ".join(f"t{i:02d}" for i in range(10)))]
    out = anchor_text_profile(_edges(spark, rows), top_terms=3).collect()
    assert sorted(r.term for r in out) == ["t00", "t01", "t02"]
    assert all(r.rank <= 3 for r in out)


def test_punctuation_only_anchor_yields_nothing(spark):
    out = anchor_text_profile(
        _edges(spark, [("s", "d", "!!! ... ???")])).collect()
    assert out == []
