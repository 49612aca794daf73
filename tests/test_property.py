"""Property-based tests (hypothesis): operator semantics vs plain
Python reference implementations on arbitrary inputs — the class of
test the reference lacks entirely (SURVEY.md §5 item 5)."""

from __future__ import annotations

import hashlib

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from news_crawler_spark.crawl.bloom import BloomShards, probe_negative_mask
from news_crawler_spark.fixtures.sitegen import SiteConfig, synth_html, synth_page
from news_crawler_spark.functions.htmlspans import html_to_spans

FAST = settings(max_examples=20, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(keys=st.lists(st.integers(min_value=-(2**62), max_value=2**62),
                     min_size=0, max_size=500))
@settings(max_examples=30, deadline=None)
def test_bloom_never_false_negative(keys):
    b = BloomShards(n_shards=4, capacity=256)
    arr = np.array(keys, dtype=np.int64)
    b.add(arr)
    if len(arr):
        assert not probe_negative_mask(b.snapshot(), arr).any()


@given(st.integers(min_value=0, max_value=10**9), st.integers(0, 50))
@settings(max_examples=50, deadline=None)
def test_html_roundtrip_for_any_page(seed, page_idx):
    """render → parse is the identity on span sequences for every
    synthetic page (the input_hint invariant, generatively)."""
    cfg = SiteConfig(seed=seed, n_hosts=4, base_pages=60, richness=2)
    url = cfg.page_url(page_idx % 4, page_idx)
    page, html = synth_html(cfg, url)
    assert html_to_spans(html) == page["spans"]


# --- first-wins dedup vs a serial Python reference ----------------------
ROWS = st.lists(
    st.tuples(st.integers(0, 5),           # key
              st.integers(0, 20),          # order value
              st.integers(0, 10**6)),      # payload/tiebreak
    min_size=0, max_size=60,
)


@given(rows=ROWS)
@FAST
def test_first_wins_dedup_matches_python(spark, rows):
    from news_crawler_spark.operators import first_wins_dedup

    df = spark.createDataFrame(rows, "k int, ord int, v long") if rows else None
    if df is None:
        return
    got = {(r.k, r.ord, r.v) for r in first_wins_dedup(
        df, ["k"], [F.col("ord").asc(), F.col("v").asc()]).collect()}

    ref = {}
    for k, o, v in sorted(rows, key=lambda t: (t[1], t[2])):
        ref.setdefault(k, (k, o, v))
    assert got == set(ref.values())


@given(url=st.from_regex(r"http://h000[0-3]\.test/p[0-9]{1,3}", fullmatch=True))
@settings(max_examples=50, deadline=None)
def test_sha_priority_twins_agree(url):
    """The native priority expression's Python twin (already tested via
    Spark) round-trips through the same hash domain."""
    from news_crawler_spark.fixtures.sitegen import url_priority

    p = url_priority(42, url)
    assert 0.0 <= p < 1.0
    d = hashlib.sha256(f"42|{url}|prio".encode()).hexdigest()
    assert p == (int(d[:15], 16) % 100_000) / 100_000.0


@given(st.integers(min_value=0, max_value=10**6))
@settings(max_examples=50, deadline=None)
def test_synth_page_deterministic_and_well_formed(i):
    cfg = SiteConfig(seed=7, n_hosts=3, base_pages=40)
    url = cfg.page_url(i % 3, i % 40)
    a, b = synth_page(cfg, url), synth_page(cfg, url)
    assert a == b  # pure function of (seed, url)
    offsets = [o for (_, _, _, o) in a["spans"]]
    assert offsets == sorted(set(offsets))  # strictly increasing
