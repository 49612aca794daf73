"""Sinks (K3-K6 semantics: idempotent merge, SID continuity) and
streaming (windowed aggs, sessionization) tests — modeled on the
reference's state-evolution golden tests (test_defense.py:83-98:
idempotent merge across two calls)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from news_crawler_spark.plans import news_digest
from news_crawler_spark.sources.sinks import (
    BASE_SID_IP,
    RulesSink,
    block_hashes,
    block_ips,
    block_urls,
    ipset_batch,
    digest_rows,
)
from news_crawler_spark.streaming import (
    sessionize_batch,
    streaming_event_counts,
    windowed_event_aggs,
)

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- sinks
def test_block_ips_idempotent_merge_and_sid_continuity(spark, tmp_path):
    sink = RulesSink(spark, str(tmp_path), "rules_ip", BASE_SID_IP)
    batch1 = spark.createDataFrame(
        [("1[.]2[.]3[.]4",), ("8.8.8.8",), ("999.1.1.1",), (" ",)], "value string")
    added1 = block_ips(sink, batch1)
    assert added1 == 2  # invalid + blank dropped (P6/F6)

    batch2 = spark.createDataFrame(
        [("8.8.8.8",), ("9.9.9.9",)], "value string")
    added2 = block_ips(sink, batch2)
    assert added2 == 1  # 8.8.8.8 already present (D5)

    rows = {r.key: r.sid for r in sink.table.read().collect()}
    assert set(rows) == {"1.2.3.4", "8.8.8.8", "9.9.9.9"}
    # SIDs: deterministic, unique, continuing past the base
    assert sorted(rows.values()) == [BASE_SID_IP + 1, BASE_SID_IP + 2, BASE_SID_IP + 3]

    # re-running the same batch adds nothing (reference test_defense.py:83-98)
    assert block_ips(sink, batch2) == 0
    assert sink.table.read().count() == 3


def test_block_urls_and_hashes(spark, tmp_path):
    usink = RulesSink(spark, str(tmp_path), "rules_url", 7_100_000)
    n = block_urls(usink, spark.createDataFrame(
        [("https[:]//bad.example/x?q=1",), ("https://bad.example/x?q=1",)],
        "value string"))
    assert n == 1  # defang-normalized forms collide → one rule (P5+D4)

    hsink = RulesSink(spark, str(tmp_path), "rules_hash", 7_200_000)
    n = block_hashes(hsink, spark.createDataFrame(
        [("D41D8CD98F00B204E9800998ECF8427E",),
         ("d41d8cd98f00b204e9800998ecf8427e",), ("zznothash",)], "value string"))
    assert n == 1  # lowercase-dedup (P8/D4), invalid dropped


def test_ipset_batch_dedup(spark):
    out = ipset_batch(spark.createDataFrame(
        [("1.1.1.1",), ("1.1.1.1",), ("2[.]2[.]2[.]2",), ("bad",)], "value string"))
    assert sorted(r.ip for r in out.collect()) == ["1.1.1.1", "2.2.2.2"]


def test_digest_rows(spark):
    news = spark.createDataFrame([("T1", "http://a/1")], "title string, url string")
    iocs = spark.createDataFrame([("ip", "1.1.1.1"), ("ip", "2.2.2.2")],
                                 "kind string, value string")
    got = {(r.section, r.line) for r in digest_rows(news, iocs).collect()}
    assert got == {("item", "- [T1](http://a/1)"), ("count", "ip: 2")}


# --------------------------------------------------------------- digest plan
def test_news_digest_replays_reference_job_semantics(spark):
    """F1→F3→L1→D1→L2 composition on crafted rows (reference
    news.py:126-163: today-only, keyword, newest-first, first-wins,
    capped)."""
    today = datetime.date(2025, 6, 2)
    ts = lambda h: datetime.datetime(2025, 6, 2, h)
    rows = [
        ("해킹 alert A", "http://x/a", ts(9)),
        ("XSS bug B", "http://x/b", ts(11)),
        ("boring news", "http://x/c", ts(10)),          # no keyword → dropped
        ("해킹 alert A dup", "http://x/a", ts(8)),       # same link → first-wins
        ("malware old", "http://x/d", datetime.datetime(2025, 6, 1, 9)),  # not today
        ("exploit E", "http://x/e", None),               # null published → dropped by F1
    ]
    items = spark.createDataFrame(rows, "title string, link string, published timestamp")
    got = [(r.title, r.link) for r in
           news_digest(items, ["해킹", "XSS", "malware", "exploit"], today, limit=10).collect()]
    assert got == [("XSS bug B", "http://x/b"), ("해킹 alert A", "http://x/a")]


# ---------------------------------------------------------------- streaming
def test_windowed_aggs_static_equals_streaming(spark, tmp_path):
    """The same plan over the same rows: batch result == streaming
    result driven to completion via the memory sink."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    static = {(r.w_start, r.event_type): (r.n, r.total)
              for r in windowed_event_aggs(events).collect()}

    src = str(tmp_path / "events_dir")  # stream sources need a directory
    events.write.parquet(src)
    stream_df = streaming_event_counts(spark, src, window="1 hour")
    q = (stream_df.writeStream.outputMode("complete")
         .format("memory").queryName("ev_counts").start())
    try:
        q.processAllAvailable()
        streamed = {(r.w_start, r.event_type): (r.n, r.total)
                    for r in spark.sql("SELECT * FROM ev_counts").collect()}
    finally:
        q.stop()
    assert streamed == static


def test_sessionize_batch(spark):
    t0 = datetime.datetime(2025, 1, 1, 0, 0)
    mins = lambda m: t0 + datetime.timedelta(minutes=m)
    rows = [
        (1, mins(0), 7), (2, mins(10), 7), (3, mins(70), 7),  # gap>30 → new session
        (4, mins(75), 7), (5, mins(0), 8),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {r.event_id: r.session_no for r in sessionize_batch(df, 30).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sliding_window_static_equals_streaming(spark, tmp_path):
    """Sliding windows (1 h / 30 min) through the SAME plan, batch and
    streamed — each event must land in exactly two windows on both
    paths (the batch twin of the sliding_window_agg contract query)."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    static = {(r.w_start, r.event_type): (r.n, r.total)
              for r in windowed_event_aggs(
                  events, slide="30 minutes").collect()}
    assert sum(n for n, _ in static.values()) == 2 * events.count()

    src = str(tmp_path / "events_sliding")
    events.write.parquet(src)
    stream_df = streaming_event_counts(spark, src, window="1 hour",
                                       slide="30 minutes")
    q = (stream_df.writeStream.outputMode("complete")
         .format("memory").queryName("ev_sliding").start())
    try:
        q.processAllAvailable()
        streamed = {(r.w_start, r.event_type): (r.n, r.total)
                    for r in spark.sql("SELECT * FROM ev_sliding").collect()}
    finally:
        q.stop()
    assert streamed == static


def test_watermark_drops_late_events_in_append_mode(spark, tmp_path):
    """Late-data semantics, not just plan sameness: after the
    watermark (2 h) passes a window's end, a straggler for that
    window arriving in a later micro-batch is DROPPED — the closed
    window's append-mode emission never includes it, which is the
    bounded-state guarantee that lets a 100 TB stream discard old
    window state."""
    from news_crawler_spark.streaming.events import EVENTS_SCHEMA

    t0 = datetime.datetime(2025, 3, 1, 10, 0, 0)

    def ev(eid, minutes, etype="view"):
        return (eid, t0 + datetime.timedelta(minutes=minutes), 1,
                etype, 1.0, "{}")

    src = str(tmp_path / "stream_src")
    # batch 1: three events in [10:00, 11:00) + one at 14:00 that
    # advances the watermark to 12:00 (> 11:00 → window closes)
    spark.createDataFrame(
        [ev(1, 5), ev(2, 20), ev(3, 40), ev(4, 240)],
        EVENTS_SCHEMA).coalesce(1).write.mode("overwrite").parquet(src)

    q = (streaming_event_counts(spark, src, window="1 hour")
         .writeStream.outputMode("append")
         .format("memory").queryName("late_drop").start())
    try:
        q.processAllAvailable()
        # batch 2: a straggler at 10:30 — 90 min behind the watermark
        spark.createDataFrame([ev(5, 30)], EVENTS_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        # batch 3: push the watermark far ahead so every open window
        # (including 14:00's) flushes its append-mode emission
        spark.createDataFrame([ev(6, 24 * 60)], EVENTS_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = {(r.w_start, r.n)
                for r in spark.sql("SELECT * FROM late_drop").collect()}
    finally:
        q.stop()
    # the 10:00 window emitted exactly once, WITHOUT the straggler
    assert (t0, 3) in rows
    assert (t0, 4) not in rows


def test_correlate_events_watermark_property(spark, tmp_path_factory):
    """Property check on the hardest streaming semantics in the repo:
    for RANDOM event layouts (dup timestamps, shared users, arbitrary
    view/purchase interleavings) plus stragglers arriving a full
    watermark behind, the stream-stream interval join must (a) emit
    exactly the batch twin of the ON-TIME events — stragglers dropped,
    never partially joined — and (b) actually expire its join state
    (numRowsTotal collapses to the sentinel rows once the watermark
    passes the main cluster)."""
    import uuid

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from news_crawler_spark.streaming import correlate_events
    from news_crawler_spark.streaming.events import EVENTS_SCHEMA

    t0 = datetime.datetime(2025, 3, 1, 0, 0, 0)

    def rows(evs, start_id):
        return [(start_id + i, t0 + datetime.timedelta(minutes=m), u, k,
                 1.0, "{}") for i, (u, k, m) in enumerate(evs)]

    EV = st.tuples(st.integers(0, 3),
                   st.sampled_from(["view", "purchase"]),
                   st.integers(0, 600))

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(main=st.lists(EV, min_size=4, max_size=25),
           stragglers=st.lists(EV, min_size=1, max_size=8))
    def check(main, stragglers):
        # sentinels advance BOTH streams' watermarks past the main
        # cluster (global watermark = min across inputs) without ever
        # pairing: user 999 is unused and their own gap exceeds the band
        batch1 = rows(main, 0) + [
            (900, t0 + datetime.timedelta(minutes=2000), 999, "view", 1.0, "{}"),
            (901, t0 + datetime.timedelta(minutes=2130), 999, "purchase", 1.0, "{}"),
        ]
        b1 = spark.createDataFrame(batch1, EVENTS_SCHEMA)
        expected = {(r.user_id, r.v_id, r.a_id, r.gap_us)
                    for r in correlate_events(
                        b1.filter(F.col("event_type") == "view"),
                        b1.filter(F.col("event_type") == "purchase"),
                        gap_minutes=60).collect()}

        src = str(tmp_path_factory.mktemp("corr_prop") / "src")
        name = f"corr_prop_{uuid.uuid4().hex[:8]}"
        b1.coalesce(1).write.mode("overwrite").parquet(src)

        def stream(kind):
            return (spark.readStream.schema(EVENTS_SCHEMA)
                    .format("parquet").load(src)
                    .filter(F.col("event_type") == kind))

        q = (correlate_events(stream("view"), stream("purchase"),
                              gap_minutes=60)
             .writeStream.outputMode("append")
             .format("memory").queryName(name).start())
        try:
            q.processAllAvailable()
            # stragglers land ~23 h behind the watermark → dropped on
            # BOTH sides, joined with nothing, leave no state
            spark.createDataFrame(rows(stragglers, 500), EVENTS_SCHEMA) \
                .coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
            got = {(r.user_id, r.v_id, r.a_id, r.gap_us)
                   for r in spark.sql(f"SELECT * FROM {name}").collect()}
            states = [p["stateOperators"][0]["numRowsTotal"]
                      for p in q.recentProgress
                      if p.get("stateOperators")]
        finally:
            q.stop()
        assert got == expected
        # state expiry: after the straggler batch runs under the
        # advanced watermark, only the two sentinel rows may survive
        assert states and states[-1] <= 4, states

    check()


def test_stream_stream_join_equals_batch(spark, tmp_path):
    """correlate_events as a real stream-stream interval join (both
    sides watermarked readStreams) produces exactly the batch twin's
    pairs — the §2.12 join shape whose time band bounds join state."""
    from news_crawler_spark.streaming import correlate_events
    from news_crawler_spark.streaming.events import EVENTS_SCHEMA

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    views_b = events.filter(F.col("event_type") == "view")
    buys_b = events.filter(F.col("event_type") == "purchase")
    batch = {(r.user_id, r.v_id, r.a_id, r.gap_us)
             for r in correlate_events(views_b, buys_b,
                                       gap_minutes=60).collect()}
    assert batch  # non-degenerate fixture

    src = str(tmp_path / "corr_src")
    events.write.parquet(src)

    def stream():
        return (spark.readStream.schema(EVENTS_SCHEMA)
                .format("parquet").load(src))

    out = correlate_events(
        stream().filter(F.col("event_type") == "view"),
        stream().filter(F.col("event_type") == "purchase"),
        gap_minutes=60)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("corr").start())
    try:
        q.processAllAvailable()
        streamed = {(r.user_id, r.v_id, r.a_id, r.gap_us)
                    for r in spark.sql("SELECT * FROM corr").collect()}
    finally:
        q.stop()
    assert streamed == batch
