"""Property tests for session-6 operators: budget exact-sum /
serial-model equality on arbitrary masses, WARC record framing
round-trip on arbitrary binary payloads, BPE greedy-merge equality
on arbitrary word tables."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from news_crawler_spark.sources.warc import parse_segment, record_bytes

FAST = settings(max_examples=20, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(payloads=st.lists(st.binary(min_size=0, max_size=300),
                         min_size=1, max_size=12))
@settings(max_examples=50, deadline=None)
def test_warc_framing_round_trips_arbitrary_binary(payloads):
    # includes payloads containing \r\n\r\nWARC/1.0 by chance — the
    # Content-Length slicing must never split on payload content
    blob = b"".join(
        record_bytes(f"https://x.test/{i}", "2026-01-01T00:00:00Z",
                     "application/octet-stream", p)
        for i, p in enumerate(payloads))
    got = [p for _, p in parse_segment(blob)]
    assert got == payloads


@given(masses=st.lists(st.integers(min_value=0, max_value=10**9),
                       min_size=1, max_size=40),
       budget_extra=st.integers(min_value=0, max_value=5000))
@FAST
def test_budget_exact_sum_and_serial_equality(spark, masses, budget_extra):
    from tests.test_budget import serial_alloc

    from news_crawler_spark.crawl.budget import allocate_host_budget

    hosts = {f"h{i:03d}": m for i, m in enumerate(masses)}
    budget = len(hosts) + budget_extra  # always feasible at floor=1
    df = spark.createDataFrame(list(hosts.items()), "host string, mass long")
    got = {r.host: r.alloc for r in
           allocate_host_budget(df, budget).collect()}
    assert sum(got.values()) == budget
    assert got == serial_alloc(hosts, budget)


@given(words=st.dictionaries(
    st.text(alphabet="abcd", min_size=1, max_size=6),
    st.integers(min_value=1, max_value=50), min_size=1, max_size=15))
@FAST
def test_bpe_matches_serial_on_arbitrary_word_tables(spark, words):
    from tests.test_bpe import serial_bpe

    from news_crawler_spark.operators.bpe import bpe_train

    got = [tuple(r) for r in
           bpe_train(spark.createDataFrame(
               list(words.items()), "word string, cnt long"),
               n_merges=2).orderBy("step").collect()]
    exp, _ = serial_bpe(words, 2)
    assert got == exp
