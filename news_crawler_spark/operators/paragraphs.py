"""Paragraph-level exact deduplication (training-data op).

Web-scale training corpora dedup below the document: the same
boilerplate paragraph (nav blurb, subscribe box, copyright footer)
repeats across millions of pages while the bodies differ, so
document-level fingerprints miss it entirely. RefinedWeb (Penedo et
al. 2023) and Dolma (Soldaini et al. 2024) both run an exact
paragraph/line-level pass with FIRST-WINS semantics: the earliest
occurrence of each paragraph survives, every later copy is stripped.

This generalizes the reference crawler's first-wins ordered dedup
(D1, /root/reference/src/secbot/fetchers/news.py:154-163 dedup of
entries by link — earliest kept) from whole records to paragraph
granularity.

Scale shape: one Generate (posexplode of the split), one map-side-
combinable ``min`` groupBy on the paragraph fingerprint (the witness
table — partial aggregation makes hot boilerplate keys cheap), one
equi-join back on the fingerprint (hot keys are exactly the
boilerplate paragraphs; AQE skew-join splitting covers them — same
note as boilerplate_profile), one groupBy per doc to fold the verdict
back. No Python on the data plane, nothing all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# witness key = doc_id * POS_BASE + pos: a single BIGINT that orders
# (doc_id, pos) lexicographically, so "earliest occurrence" is a plain
# scalar min — map-side combinable, and any SQL engine replays it
# without struct-ordering semantics. Caps paragraphs/doc at POS_BASE.
POS_BASE = 1_000_000


def paragraph_rows(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", sep: str = "\n\n") -> DataFrame:
    """Explode a corpus into fingerprinted paragraph occurrences:
    ``(doc_id, pos, para, fp, okey)`` where ``fp`` is the paragraph's
    sha256 and ``okey = doc_id * POS_BASE + pos`` is the scalar
    occurrence key first-wins semantics minimize over. Shared by the
    batch operator (:func:`paragraph_dedup`) and the persisted
    cross-batch state (ingest.ParagraphState) so both dedup the exact
    same paragraph structure."""
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.transform(F.split(F.col(text_col), sep),
                            lambda p: F.trim(p)),
                lambda p: p != F.lit(""))).alias("pos", "para"),
    ).select(
        id_col, "pos", "para",
        F.sha2(F.col("para"), 256).alias("fp"),
        (F.col(id_col) * POS_BASE + F.col("pos")).alias("okey"),
    )


def paragraph_dedup(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    sep: str = "\n\n") -> DataFrame:
    """First-wins paragraph dedup: per doc returns ``n_paras``,
    ``n_kept`` (paragraphs this doc is the corpus-wide first witness
    of), ``kept_ratio`` (surviving character fraction, 6 dp), and
    ``kept_sha`` — sha256 of the surviving paragraphs re-joined in
    document order (NULL when every paragraph was seen earlier).

    A paragraph occurrence survives iff its (doc_id, pos) is the
    minimum over all occurrences of that paragraph's sha256
    fingerprint — deterministic, engine-independent, and exactly the
    serial "keep the first time you see it" semantics.
    """
    # paras feeds both the witness groupBy and the join-back left side
    # — Spark has no common-subplan reuse across join inputs, so
    # without the pin the corpus explode + per-paragraph sha256 ran
    # TWICE. localCheckpoint (not persist): blocks release with the
    # df. The witness stays a groupBy + equi-join back (NOT a window
    # over fp): hot boilerplate fingerprints are the skew case and
    # AQE skew-join splitting only covers joins.
    paras = paragraph_rows(df, text_col, id_col, sep).localCheckpoint(
        eager=True)
    witness = paras.groupBy("fp").agg(F.min("okey").alias("wkey"))
    flagged = (
        paras.join(witness, "fp")
        .select(id_col, "pos", "para",
                (F.col("okey") == F.col("wkey")).alias("kept"))
    )
    kept_struct = F.when(F.col("kept"), F.struct("pos", "para"))
    agg = flagged.groupBy(id_col).agg(
        F.count("*").alias("n_paras"),
        F.sum(F.col("kept").cast("int")).alias("n_kept"),
        F.sum(F.length("para")).alias("_chars"),
        F.sum(F.when(F.col("kept"), F.length("para")).otherwise(F.lit(0)))
        .alias("_kchars"),
        F.array_sort(F.collect_list(kept_struct)).alias("_ks"),
    )
    return agg.select(
        id_col, "n_paras", "n_kept",
        F.round(F.col("_kchars") / F.col("_chars"), 6).alias("kept_ratio"),
        F.when(
            F.col("n_kept") > 0,
            F.sha2(F.array_join(
                F.transform("_ks", lambda s: s.getField("para")), sep), 256))
        .alias("kept_sha"),
    )


def span_dedup(documents: DataFrame, id_col: str = "doc_id",
               spans_col: str = "spans") -> DataFrame:
    """First-wins dedup at SPAN granularity over the interleaved
    text+media document table (doc_id, spans:array<struct<kind,text,
    media_ref,offset>>) — the paragraph pass expressed on the
    north-rule input shape directly, no flattening. Text and link
    spans key on sha256 of their text; media spans key on their
    media_ref (the payload a media span actually carries), so the
    same asset embedded on many pages dedups exactly like repeated
    boilerplate text. The earliest (doc_id, offset) occurrence of
    each key survives.

    Returns per doc: ``n_spans``, ``n_kept``, ``n_media_kept``, and
    ``kept_text_sha`` — sha256 of the surviving text-bearing spans
    re-joined in offset order (NULL when none survive), i.e. the
    span-sequence invariant digest of the deduped document.

    Same scale shape as paragraph_dedup: one Generate, one map-side-
    combinable min-witness groupBy on the span fingerprint, one
    equi-join back (hot keys = sitewide boilerplate spans; AQE
    skew-split covers them), one per-doc fold.
    """
    sp = documents.select(F.col(id_col), F.explode(spans_col).alias("s"))
    key = F.when(
        F.col("s.kind") == "media",
        F.concat(F.lit("m:"), F.col("s.media_ref")),
    ).otherwise(F.concat(F.lit("t:"), F.col("s.text")))
    flat = sp.select(
        id_col,
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("sptext"),
        F.col("s.offset").alias("offset"),
        F.sha2(key, 256).alias("fp"),
        (F.col(id_col) * POS_BASE + F.col("s.offset")).alias("okey"),
    ).localCheckpoint(eager=True)  # feeds witness AND join-back: pin
    # so the span explode + sha256 run once (same note as
    # paragraph_dedup above)
    witness = flat.groupBy("fp").agg(F.min("okey").alias("wkey"))
    flagged = (
        flat.join(witness, "fp")
        .select(id_col, "kind", "sptext", "offset",
                (F.col("okey") == F.col("wkey")).alias("kept"))
    )
    kept_text = F.when(F.col("kept") & (F.col("sptext") != ""),
                       F.struct("offset", "sptext"))
    agg = flagged.groupBy(id_col).agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("kept").cast("int")).alias("n_kept"),
        F.sum((F.col("kept") & (F.col("kind") == "media")).cast("int"))
        .alias("n_media_kept"),
        F.array_sort(F.collect_list(kept_text)).alias("_kt"),
    )
    return agg.select(
        id_col, "n_spans", "n_kept", "n_media_kept",
        F.when(
            F.size("_kt") > 0,
            F.sha2(F.concat_ws(
                " ", F.transform("_kt", lambda s: s.getField("sptext"))),
                256))
        .alias("kept_text_sha"),
    )
