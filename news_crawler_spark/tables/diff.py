"""Snapshot diffing: what changed between two corpus versions.

The reference crawler only ever appends (reference: news_crawler's
digest log grows monotonically); a recrawl pipeline needs the
between-snapshots delta — which pages appeared, vanished, or changed
content — both to feed the change-rate estimator
(operators/recrawl.py consumes exactly the "changed" stream) and to
ship incremental corpus updates downstream instead of full re-exports.

Shape: ONE full-outer equi-join on the key between the two version
reads (SnapshotTable.read(snapshot_id) — time-travel makes both sides
plain parquet scans of immutable files), comparing a content digest
column. At 100 TB both sides shuffle once on the key; with the key as
the bucketing column the join co-locates and the diff is shuffle-free.
Everything native; the digest is whatever the caller trusts
(sha2(text), span digests, …).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, key: str,
                  digest_col: str = "digest") -> DataFrame:
    """Row-level delta: (key, status ∈ added|removed|changed|unchanged,
    old_digest, new_digest). ``old``/``new`` must carry one row per
    key (dedup upstream — this operator reports state, it does not
    adjudicate duplicates)."""
    # presence travels as explicit markers, NEVER inferred from digest
    # nullness: a NULL digest is a legal value (flatten_text yields
    # NULL for media-only docs), and a key present on both sides with
    # a NULL digest on one must read changed/unchanged, not
    # added/removed
    o = old.select(F.col(key).alias(key), F.col(digest_col).alias("_od"),
                   F.lit(True).alias("_po"))
    n = new.select(F.col(key).alias(key), F.col(digest_col).alias("_nd"),
                   F.lit(True).alias("_pn"))
    j = o.join(n, key, "full_outer")
    same = (F.col("_od").eqNullSafe(F.col("_nd")))
    status = (
        F.when(F.col("_po").isNull(), "added")
        .when(F.col("_pn").isNull(), "removed")
        .when(~same, "changed")
        .otherwise("unchanged"))
    return j.select(
        key, status.alias("status"),
        F.col("_od").alias("old_digest"), F.col("_nd").alias("new_digest"))


def diff_summary(old: DataFrame, new: DataFrame, key: str,
                 digest_col: str = "digest") -> DataFrame:
    """(status, n) rollup of snapshot_diff — the four counters an
    incremental-export job logs per run. One extra partial-agg
    groupBy over the diff."""
    return (snapshot_diff(old, new, key, digest_col)
            .groupBy("status").agg(F.count(F.lit(1)).alias("n")))


def table_diff(table, old_snapshot: int, new_snapshot: int | None,
               key: str, digest: F.Column) -> DataFrame:
    """Diff two versions of a SnapshotTable (tables/snapshot.py):
    time-travel both sides, derive the digest column, delegate.
    ``new_snapshot=None`` means the current version."""
    o = table.read(old_snapshot).select(key, digest.alias("digest"))
    n = table.read(new_snapshot).select(key, digest.alias("digest"))
    return snapshot_diff(o, n, key)
