"""Custom stateful streaming operator via applyInPandasWithState.

The reference keeps cross-run state in files reloaded per run
(T6, ``scheduler.py:44-89``); the streaming-native equivalent is a
keyed state store updated per micro-batch. This operator maintains a
per-user running profile (event count, value total, last-seen ts) —
the shape every "seen-set + counters" crawler-side stream needs, and
the pattern to copy for per-host politeness token buckets fed by a
fetch-results stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)
STATE = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("total", T.DoubleType(), False),
    ]
)


def _update(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: per-user running (count, value-total) kept in keyed
    state across micro-batches. ``events`` must be a streaming DF with
    (user_id, value)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT,
            stateStructType=STATE,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def running_user_totals_batch(events: DataFrame) -> DataFrame:
    """The batch twin — final state per user (oracle for the stream)."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 2).alias("total_value"),
    )
