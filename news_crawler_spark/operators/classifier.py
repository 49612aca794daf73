"""Hashed linear quality classifier (fastText-style) — zero shuffle.

LLM data pipelines gate documents with a cheap linear model over
hashed bag-of-words features (fastText / DSIR-style quality
classifiers). This operator implements the *serving* side of that
pattern Spark-first: per-token feature weights are looked up by
feature hash and folded into a per-document score entirely inside one
row — ``aggregate`` over the token array — so scoring 100 TB costs a
single scan with **no exchange at all** (compare a weights-table
join, which would shuffle every token).

The weight function here is a deterministic stand-in derived from the
feature hash itself (``bucket/(B-1) - 0.5``, scaled to [-1, 1]): the
plumbing — hash, bucket, fold, sigmoid, threshold — is exactly what a
learned model needs; swapping in trained weights means broadcasting a
B-entry double array and indexing it with the same bucket id, still
row-local.

Hashes are sha256-prefix derived so the DuckDB correctness oracle
replays scores bit-for-bit (after the documented 6-decimal rounding,
which also guards the sigmoid's last-ulp libm divergence).

Reference lineage: generalizes the F-family keyword filters
(reference ``src/secbot/asec.py`` keyword any-match) from hand-written
predicates to a scored, thresholded model gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _token_weight(tok: Column, n_buckets: int) -> Column:
    """Deterministic weight in [-1, 1] from the token's feature bucket.

    bucket = sha256-32-bit-prefix mod n_buckets — the same formula the
    oracle replays as ``('0x'||substr(sha256(x),1,8))::BIGINT % B``.
    """
    bucket = F.pmod(
        F.conv(F.substring(F.sha2(tok, 256), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )
    return (bucket / F.lit(float(n_buckets - 1)) - F.lit(0.5)) * F.lit(2.0)


def hashed_classifier_scores(
    documents: DataFrame,
    *,
    n_buckets: int = 4096,
    bias: float = 0.0,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document with the hashed linear model.

    Returns ``(doc_id, n_tokens, score, keep)``; ``score`` is
    sigmoid(mean token weight + bias) rounded to 6 decimals, and
    ``keep`` thresholds the *rounded* score so any engine replaying
    the arithmetic reaches the same decision. Documents with NULL text
    or zero tokens get NULL score and keep=false.

    The token array is inlined into two expressions (size + fold), so
    tokenization runs twice per row — deliberate: the expensive part
    (the sha256 fold) is evaluated once, and keeping everything in one
    projection avoids a Generate + groupBy + join-back that would cost
    two exchanges just to share the split.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )
    n = F.size(toks)
    wsum = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, x: acc + _token_weight(x, n_buckets),
    )
    mean = wsum / n
    score = F.when(
        n > 0,
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-(mean + F.lit(float(bias))))), 6
        ),
    )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        score.alias("score"),
        F.coalesce(score >= F.lit(float(threshold)), F.lit(False)).alias(
            "keep"
        ),
    )
