"""Inverted-index construction (operators/postings.py)."""

from __future__ import annotations

from news_crawler_spark.operators.postings import build_postings


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_positions_docs_and_df(spark):
    rows = [("d1", "to be or not to be"),
            ("d2", "be quick"),
            ("d3", "or else")]
    got = {r.term: (r.df, r.postings) for r in
           build_postings(_docs(spark, rows)).collect()}
    # 'to' appears at raw positions 0 and 4 in d1
    assert got["to"] == (1, "d1:0,4")
    assert got["be"] == (2, "d1:1,5;d2:0")  # docs ordered by id
    assert got["or"] == (2, "d1:2;d3:0")
    assert got["quick"] == (1, "d2:1")
    assert "else" in got


def test_positions_count_dropped_tokens(spark):
    # punctuation splits produce dropped short tokens, but positions
    # index the RAW token stream so phrase-distance stays meaningful
    got = {r.term: r.postings for r in
           build_postings(_docs(spark, [("d", "x hello a b world")]))
           .collect()}
    assert got["hello"] == "d:1"
    assert got["world"] == "d:4"


def test_min_df_prunes_hapax_terms(spark):
    rows = [("d1", "common rare1"), ("d2", "common rare2")]
    got = [r.term for r in
           build_postings(_docs(spark, rows), min_df=2).collect()]
    assert got == ["common"]
