"""Streaming → snapshot-table sink via foreachBatch.

Exactly-once shape: each micro-batch lands as ONE atomic snapshot
append tagged with its epoch; replays of an epoch (restart after a
sink-side failure) are made idempotent by checking the last committed
epoch first — the streaming analog of the engine's lineage-gated
round commits (and of the reference's idempotent rule sinks K3-K6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_crawler_spark.tables import SnapshotTable


def snapshot_table_sink(table: SnapshotTable):
    """foreachBatch function writing each epoch atomically-once."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        existing = table.read()
        if "epoch" in [f.name for f in table.schema.fields]:
            already = (existing.select(F.max("epoch").alias("m")).collect()[0]["m"]
                       if table.current_snapshot() >= 0 else None)
            if already is not None and epoch_id <= already:
                return  # replayed epoch: already committed, skip
            batch_df = batch_df.withColumn("epoch", F.lit(epoch_id))
        table.append(batch_df)

    return write_batch
