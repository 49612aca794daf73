"""Weighted sampling WITHOUT replacement, exact k (Efraimidis &
Spirakis 2006, A-ES): each row draws key = u^(1/w) and the k largest
keys ARE a weighted sample without replacement — one projection plus
a TakeOrderedAndProject top-k, no rejection loop, no iteration. This
is the exact-k companion to quality_weighted_sample's accept/reject
(FineWeb-style) pass: mixtures that must hit a row budget exactly use
this one.

Determinism contract: u is the sha256 60-bit-prefix / 2^60 draw the
repo standardizes on (power-of-two divisor → the double is
engine-exact); the one transcendental (pow) is rounded to 12 dp with
an id tiebreak BEFORE ranking, so a last-ulp libm divergence between
engines cannot flip membership. Weights must be > 0 — zero-weight
rows are excluded by definition (their key is 0)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TWO_60 = float(1 << 60)


def es_key_col(id_col: str, weight_col: str, seed: str = "es") -> F.Column:
    """round(u^(1/w), 12) with u = sha2(seed|id) 60-bit / 2^60."""
    u = (
        F.conv(F.substring(
            F.sha2(F.concat(F.lit(seed + "|"),
                            F.col(id_col).cast("string")), 256),
            1, 15), 16, 10).cast("long").cast("double")
        / F.lit(_TWO_60))
    return F.round(F.pow(u, F.lit(1.0) / F.col(weight_col)), 12)


def weighted_sample_k(df: DataFrame, weight_col: str, k: int,
                      id_col: str, seed: str = "es") -> DataFrame:
    """The k rows with the largest A-ES keys (key desc, id asc):
    a weighted sample without replacement, deterministic in
    (seed, ids, weights). orderBy().limit() plans as
    TakeOrderedAndProject — per-partition partial top-k, never a
    global sort."""
    keyed = (df.where(F.col(weight_col) > 0)
             .withColumn("es_key", es_key_col(id_col, weight_col, seed)))
    return keyed.orderBy(F.col("es_key").desc(), id_col).limit(k)
