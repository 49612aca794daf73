"""applyInPandasWithState custom stateful operator: streaming result
(after all micro-batches) equals the batch aggregate twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_crawler_spark.streaming.events import EVENTS_SCHEMA
from news_crawler_spark.streaming.stateful import (
    running_user_totals,
    running_user_totals_batch,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stateful_stream_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = str(tmp_path / "stream_src")
    # two files → two micro-batches (maxFilesPerTrigger=1): the state
    # must genuinely carry counts across batches
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        src, mode="overwrite")
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append").parquet(src)

    batch = {r.user_id: (r.n_events, r.total_value)
             for r in running_user_totals_batch(events).collect()}

    stream = (spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
              .option("maxFilesPerTrigger", 1).load(src))
    q = (running_user_totals(stream).writeStream.outputMode("update")
         .format("memory").queryName("state_totals").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM state_totals").collect()
    finally:
        q.stop()
    assert len(rows) > len(batch), "expected one emission per key per batch"
    latest: dict = {}
    for r in rows:  # n_events is monotone per user → max = final state
        if r.user_id not in latest or r.n_events > latest[r.user_id][0]:
            latest[r.user_id] = (r.n_events, r.total_value)
    assert latest == batch


def test_streaming_dedup_within_watermark_matches_batch(spark, tmp_path):
    """Planted duplicates (same event replayed in both micro-batches,
    plus in-batch copies) are dropped exactly once by key; the surviving
    set equals the batch dropDuplicates twin."""
    from news_crawler_spark.streaming.events import streaming_dedup

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(200)
    dupes = events.filter(F.col("event_id") % 10 == 0)  # replayed rows
    src = str(tmp_path / "dedup_src")
    events.unionAll(dupes).coalesce(1).write.parquet(src, mode="overwrite")
    dupes.coalesce(1).write.mode("append").parquet(src)  # cross-batch replay

    want = {r.event_id for r in streaming_dedup(events).collect()}

    stream = (spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
              .option("maxFilesPerTrigger", 1).load(src))
    q = (streaming_dedup(stream).writeStream.outputMode("append")
         .format("memory").queryName("dedup_stream").start())
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT event_id FROM dedup_stream").collect()
    finally:
        q.stop()
    assert len(got) == len(want), "each key must be emitted exactly once"
    assert {r.event_id for r in got} == want
