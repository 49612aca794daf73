"""Corpus composition operators: domain mixture weights and the
deterministic global training shuffle.

Two jobs every LLM training-data pipeline runs after filtering/dedup:

- **Mixture weighting** (``domain_mixture``): per-domain token counts
  reweighted by a temperature exponent alpha (GPT-3 / Pile-style
  ``p_d ∝ tokens_d^alpha``), yielding sampling probabilities and an
  expected token budget per domain.
- **Global shuffle** (``training_shuffle``): a deterministic,
  seed-keyed permutation of the corpus into ``n_buckets`` output
  shards with a stable within-shard order — what you materialize
  before writing training shards so examples from one source aren't
  adjacent.

Scale shape (100 TB):
- ``domain_mixture`` is one map-side-combinable groupBy on the domain
  column (cardinality ~10^4-10^6 domains — tiny result), then a 1-row
  broadcast for the normalizer. The corpus is scanned once; the
  token count is an ``aggregate`` over the split array, row-local.
- ``training_shuffle`` derives a 60-bit sha256 shuffle key per doc —
  row-local — and assigns shards by ``pmod``; within-shard order is a
  rank over the shard partition (n_buckets partitions, each 1/n of
  the corpus; at scale you pick n_buckets = number of output files,
  thousands, so partitions stay bounded). The production write path
  is the same key fed to ``repartitionByRange(key).sortWithin
  Partitions(key)`` + write; this operator materializes the
  assignment so it can be checked engine-to-engine.

Reference lineage: the reference daemon has no notion of corpus
composition (it emits one digest per round, ``src/secbot/asec.py``);
these are the §2.8 beyond-reference aggregation family applied to the
training-export stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def domain_mixture(
    documents: DataFrame,
    *,
    alpha: float = 0.3,
    budget_tokens: int = 1_000_000,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled sampling weights per domain.

    Returns ``(source, n_docs, n_tokens, mixture_weight,
    expected_tokens)`` where ``mixture_weight = tokens^alpha /
    sum(tokens^alpha)`` rounded to 6 decimals and ``expected_tokens``
    is the rounded share of ``budget_tokens``. NULL/empty texts count
    as 0 tokens.
    """
    ntok = F.coalesce(
        F.size(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda x: x != "",
            )
        ),
        F.lit(0),
    )
    per_domain = (
        documents.select(F.col(group_col).alias("source"), ntok.alias("_n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").cast("long").alias("n_tokens"),
        )
        .withColumn("_w", F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha))))
    )
    total = per_domain.agg(F.sum("_w").alias("_tw"))
    weight = F.round(F.col("_w") / F.col("_tw"), 6)
    return (
        per_domain.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            weight.alias("mixture_weight"),
            F.round(weight * F.lit(float(budget_tokens)), 0)
            .cast("long")
            .alias("expected_tokens"),
        )
    )


def training_shuffle(
    documents: DataFrame,
    *,
    n_buckets: int = 16,
    seed: str = "r4",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic seed-keyed shard + order assignment.

    Returns ``(doc_id, shard, shard_pos)``: ``shard = pmod(key,
    n_buckets)`` and ``shard_pos`` the 1-based rank of the doc inside
    its shard ordered by ``(key, doc_id)`` — a reproducible global
    permutation any engine can replay (key = 60-bit sha256 prefix of
    ``seed:doc_id``).
    """
    key = F.conv(
        F.substring(
            F.sha2(F.concat_ws(":", F.lit(seed), F.col(id_col)), 256), 1, 15
        ),
        16,
        10,
    ).cast("long")
    with_key = documents.select(
        F.col(id_col).alias("doc_id"), key.alias("_key")
    ).withColumn("shard", F.pmod(F.col("_key"), F.lit(n_buckets)))
    order = Window.partitionBy("shard").orderBy("_key", "doc_id")
    return with_key.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        F.row_number().over(order).cast("long").alias("shard_pos"),
    )
