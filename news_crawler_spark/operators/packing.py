"""Sequence packing for LLM training shards (training-data op).

Packing assigns documents to fixed token-budget bins by contiguous
greedy packing: a document starting at cumulative token offset ``c``
lands in bin ``floor(c / budget)``, straddling allowed (the
pack-then-split convention — the trainer splits the straddler at the
bin boundary).

The scale question is what the cumulative-sum window PARTITIONS on. A
global ``orderBy`` window funnels the whole corpus through one task;
partitioning only on a natural column (language, source) caps
parallelism at that column's cardinality — a monolingual 100 TB corpus
would pack in ONE task. So the engine-level operator composes the
caller's shard columns with an explicit hash shard
``pmod(hash(id), n_shards)``: parallelism is ``|shard_cols values| ×
n_shards`` regardless of corpus shape, every shard packs
independently, and the hash is sha2-derived (``topk.row_salt``) so any
SQL engine replays the exact same binning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from news_crawler_spark.operators.topk import row_salt


def pack_sequences(df: DataFrame, token_col: str, budget: int,
                   shard_cols: Sequence[str] = (), n_shards: int = 16,
                   id_col: str = "doc_id") -> DataFrame:
    """Greedy contiguous packing within ``(*shard_cols, shard)`` where
    ``shard = pmod(sha2-hash(id_col), n_shards)``.

    Returns the input's ``(*shard_cols, id_col, token_col)`` plus
    ``shard``, ``offset`` (cumulative token start inside the shard,
    deterministic ``id_col`` order) and ``bin_id``
    (= floor(offset / budget), local to the shard). Invariants:
    offsets are contiguous per shard (each doc's offset equals the sum
    of all previous docs' tokens) and a bin never holds more than
    ``budget`` tokens except via its last, straddling document.

    One window over (*shard_cols, shard) — no global sort, no
    single-partition exchange; the shard count is the caller's
    parallelism lever, independent of data skew in ``shard_cols``.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    shard = row_salt(id_col, n_shards)
    w = (Window.partitionBy(*shard_cols, "shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (
        df.select(*shard_cols, id_col,
                  F.col(token_col).cast("long").alias(token_col))
        .withColumn("shard", shard)
        .withColumn(
            "offset",
            F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long"))
        .withColumn("bin_id", F.floor(F.col("offset") / F.lit(budget)))
    )
