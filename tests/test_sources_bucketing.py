"""Source-format readers, bucketed co-located joins, foreachBatch sink."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F
from pyspark.sql import types as T

from news_crawler_spark.sources.readers import (
    read_documents_jsonl,
    read_seeds_csv,
)
from news_crawler_spark.tables import SnapshotTable
from news_crawler_spark.tables.bucketed import bucketed_join, save_bucketed

SF_DIR = "/root/testdata/sf0.001"


def test_read_seeds_csv(spark, tmp_path):
    p = tmp_path / "seeds.csv"
    p.write_text("url,priority\nhttp://a.test/p0,0.9\nhttp://b.test/p0,\n")
    got = {r.url: r.priority for r in read_seeds_csv(spark, str(p)).collect()}
    assert got == {"http://a.test/p0": 0.9, "http://b.test/p0": 1.0}


def test_read_documents_jsonl(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text('{"doc_id": 1, "text": "hello world", "lang": "en", '
                 '"source": "s", "n_chars": 11}\n')
    r = read_documents_jsonl(spark, str(p)).collect()[0]
    assert (r.doc_id, r.text, r.n_chars) == (1, "hello world", 11)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Identically-bucketed tables join WITHOUT a shuffle on either
    side — the layout the big state tables adopt at 10^10 scale."""
    frontier_like = spark.range(10_000).select(
        F.xxhash64("id").alias("url_hash"), F.col("id").alias("a"))
    resolved_like = spark.range(5_000).select(
        F.xxhash64("id").alias("url_hash"), F.col("id").alias("b"))
    try:
        save_bucketed(frontier_like, "t_frontier", n_buckets=8)
        save_bucketed(resolved_like, "t_resolved", n_buckets=8)

        joined = bucketed_join(spark, "t_frontier", "t_resolved", "url_hash")
        # bucketed scans defeat auto-broadcast only for big tables;
        # force the non-broadcast path to expose the bucketing property
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            assert "Exchange" not in plan, "bucketed join must not shuffle"
            assert joined.count() == 5_000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                           str(64 * 1024 * 1024))
    finally:
        spark.sql("DROP TABLE IF EXISTS t_frontier")
        spark.sql("DROP TABLE IF EXISTS t_resolved")


def test_foreach_batch_snapshot_sink(spark, tmp_path):
    from news_crawler_spark.streaming.events import EVENTS_SCHEMA
    from news_crawler_spark.streaming.sink import snapshot_table_sink

    src = str(tmp_path / "src")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(100)
    events.coalesce(1).write.parquet(src)

    out_schema = T.StructType(
        [T.StructField("event_type", T.StringType(), True),
         T.StructField("n", T.LongType(), False),
         T.StructField("epoch", T.LongType(), True)]
    )
    table = SnapshotTable(spark, str(tmp_path), "agg_sink", out_schema)
    stream = (spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(src)
              .groupBy("event_type").agg(F.count("*").alias("n")))
    q = (stream.writeStream.outputMode("complete")
         .foreachBatch(snapshot_table_sink(table))
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batch_counts = {r.event_type: r.n for r in
                    events.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    got = {r.event_type: r.n for r in table.read().collect()}
    assert got == batch_counts

    # replayed epoch is a no-op (idempotent sink)
    snapshot_table_sink(table)(table.read().drop("epoch"), 0)
    assert table.read().count() == len(batch_counts)


def test_orc_roundtrip(spark, tmp_path):
    from news_crawler_spark.sources.readers import read_documents_orc

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text", "lang", "source", "n_chars")
    p = str(tmp_path / "docs_orc")
    docs.write.orc(p)
    got = read_documents_orc(spark, p)
    assert got.count() == docs.count()
    assert {r.doc_id for r in got.limit(50).collect()} <= \
        {r.doc_id for r in docs.collect()}
