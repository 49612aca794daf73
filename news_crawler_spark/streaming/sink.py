"""Streaming → snapshot-table sink via foreachBatch.

Exactly-once shape: each micro-batch lands as ONE atomic snapshot
append tagged with its epoch; replays of an epoch (restart after a
sink-side failure) are made idempotent by checking the last committed
epoch first — the streaming analog of the engine's lineage-gated
round commits (and of the reference's idempotent rule sinks K3-K6).

A table is bound to ONE logical stream: the epoch guard compares
against the max committed epoch *for this stream_id*, so a restart
with a fresh checkpoint (epoch ids reset to 0) under a NEW stream_id
appends normally instead of being silently dropped. Reusing the same
stream_id with a wiped checkpoint is the one unsafe combination — the
guard logs a loud warning whenever it skips, so replay protection is
never silent data loss.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_crawler_spark.tables import SnapshotTable

log = logging.getLogger(__name__)


def snapshot_table_sink(table: SnapshotTable, stream_id: str = "default"):
    """foreachBatch function writing each epoch atomically-once.

    If the table schema carries ``epoch`` (and optionally
    ``stream_id``) columns, batches whose epoch was already committed
    for this stream are skipped — loudly, never silently.
    """
    fields = [f.name for f in table.schema.fields]

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if "epoch" in fields:
            existing = table.read()
            if "stream_id" in fields:
                existing = existing.filter(F.col("stream_id") == stream_id)
                batch_df = batch_df.withColumn("stream_id", F.lit(stream_id))
            already = (existing.select(F.max("epoch").alias("m")).collect()[0]["m"]
                       if table.current_snapshot() >= 0 else None)
            if already is not None and epoch_id <= already:
                log.warning(
                    "snapshot_table_sink(%s): skipping epoch %d <= committed %d "
                    "for stream_id=%r — replayed batch (expected after a sink "
                    "failure). If this stream restarted with a NEW checkpoint "
                    "against this table, pass a new stream_id or data will be "
                    "dropped.", table.name, epoch_id, already, stream_id)
                return
            batch_df = batch_df.withColumn("epoch", F.lit(epoch_id))
        table.append(batch_df)

    return write_batch
