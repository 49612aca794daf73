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
    from news_crawler_spark.operators.par import spread_scan

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
    # the sha256 fold below is pure per-row work with no exchange at
    # all — widen a narrow scan so it parallelizes (no-op at scale)
    documents = spread_scan(documents)
    return documents.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        score.alias("score"),
        F.coalesce(score >= F.lit(float(threshold)), F.lit(False)).alias(
            "keep"
        ),
    )


def dsir_logratio(
    documents: DataFrame,
    target: DataFrame,
    *,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how much more likely its hashed-ngram bag is under the
    TARGET (in-domain) distribution than under the RAW distribution —
    ``log p_target(x) - log p_raw(x)`` per feature, averaged over the
    document's features. Training pipelines resample the raw corpus
    proportionally to this weight to tilt it toward the target domain.

    Features are unigrams + bigrams hashed into ``n_buckets`` buckets
    with the same sha256-prefix formula as the serving-side classifier
    (``_token_weight``), so the DuckDB oracle replays the bucketing
    exactly. Distributions are Laplace-smoothed bag-of-buckets
    multinomials: ``p_b = (c_b + 1) / (total + n_buckets)``.

    Returns ``(doc_id, n_feats, dsir_logw)`` for every raw document
    that has at least one feature; ``dsir_logw`` is the mean
    per-feature log ratio rounded to 6 decimals.

    Scale shape: the corpus explodes ONCE per counting pass into
    (doc, bucket) rows; both count tables groupBy the bucket id —
    <= n_buckets perfectly-balanced keys with map-side partial
    aggregation — and the per-bucket log-ratio table (<= n_buckets
    rows) BROADCASTS back onto the exploded grams, so the only
    corpus-sized shuffle is the final per-document fold. The corpus is
    scanned twice (count pass + scoring pass) — at 100 TB that beats
    materializing the exploded gram table, and the scan is
    column-pruned to (id, text).
    """
    from news_crawler_spark.operators.par import spread_scan

    def gram_buckets(df: DataFrame) -> DataFrame:
        # per-doc gram rows stay contiguous (explode of a row-wise
        # repartitioned table), so counts and the per-doc mean are
        # partition-invariant; widening the narrow scan parallelizes
        # the sha256 gram hashing (no-op at scale)
        df = spread_scan(df)
        toks = F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda x: x != "",
        )
        n = F.size(toks)
        bi = F.when(
            n >= 2,
            F.zip_with(
                F.slice(toks, F.lit(1), n - 1),
                F.slice(toks, F.lit(2), n - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return df.select(
            F.col(id_col),
            F.explode(F.concat(toks, bi)).alias("_g"),
        ).select(
            id_col,
            F.pmod(
                F.conv(F.substring(F.sha2("_g", 256), 1, 8), 16, 10)
                .cast("long"),
                F.lit(n_buckets),
            ).alias("bucket"),
        )

    raw = gram_buckets(documents)
    # the two bucket-count tables are <= n_buckets rows by construction
    # — they come to the driver (the same tiny-side/heavy-side split
    # ivf_assign uses for centroids) and the per-bucket counts re-enter
    # the scoring pass as INTEGER literal arrays. This removes the
    # totals aggregation crossJoins and the broadcast ratio join (plus
    # its broadcast-build job) from the plan: scoring is now a single
    # Project/Generate pass over the corpus grams ending in the per-doc
    # fold. Counts are exact integers and the log-ratio still evaluates
    # in the JVM expression engine from those exact counts, so every
    # lr double — and the rounded per-doc mean — is bit-identical to
    # the joined form.
    cr = {int(r["bucket"]): int(r["cr"])
          for r in raw.groupBy("bucket").agg(
              F.count("*").alias("cr")).collect()}
    ct = {int(r["bucket"]): int(r["ct"])
          for r in gram_buckets(target).groupBy("bucket").agg(
              F.count("*").alias("ct")).collect()}
    n_raw = float(sum(cr.values()))
    n_tgt = float(sum(ct.values()))
    b = float(n_buckets)
    cr_arr = "array(" + ",".join(
        str(cr.get(i, 0)) for i in range(n_buckets)) + ")"
    ct_arr = "array(" + ",".join(
        str(ct.get(i, 0)) for i in range(n_buckets)) + ")"
    # element_at is 1-based; every scored gram's bucket has cr >= 1 by
    # construction (it was counted from this same gram table), matching
    # the old inner join's domain
    lr = F.expr(
        f"log((element_at({ct_arr}, cast(bucket as int) + 1) + 1) / "
        f"{repr(n_tgt + b)}D) - "
        f"log((element_at({cr_arr}, cast(bucket as int) + 1) + 1) / "
        f"{repr(n_raw + b)}D)")
    return (
        raw.select(id_col, lr.alias("lr"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.round(F.avg("lr"), 6).alias("dsir_logw"),
        )
    )
