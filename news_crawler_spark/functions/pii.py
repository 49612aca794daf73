"""PII scrubbing as native column expressions (training-data op).

A corpus that feeds a training pipeline redacts personal identifiers
before anything else sees the text. Patterns are deliberately
conservative-but-simple (the auditable regex family production
pipelines start from — emails, dotted-quad IPs, international-ish
phone numbers, 16-digit card runs): every rule is a single
``regexp_replace``/``regexp_extract_all`` that any engine can replay,
so redaction is value-checkable end to end, and the whole scrub is
one codegen'd projection — no UDF, no shuffle.

Order matters: cards redact before phones (a 16-digit run must not be
half-eaten as a phone number), IPs before phones (dotted quads share
digit runs). ``pii_counts`` applies the same precedence by counting
on the progressively-redacted text.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# precedence-ordered (kind, pattern, placeholder)
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b", "<CARD>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,3}[ -]\d{3,4}[ -]\d{3,4}(?:[ -]\d{3,4})?", "<PHONE>"),
]


def _c(col):
    return F.col(col) if isinstance(col, str) else col


def pii_redact(col) -> F.Column:
    """Text with every PII match replaced by its typed placeholder,
    rules applied in precedence order."""
    out = _c(col)
    for _, pat, ph in PII_RULES:
        out = F.regexp_replace(out, pat, ph)
    return out


def pii_counts(col) -> dict[str, F.Column]:
    """{kind: count} columns counting matches at that rule's point in
    the precedence chain (a card never double-counts as a phone)."""
    cur = _c(col)
    out: dict[str, F.Column] = {}
    for kind, pat, ph in PII_RULES:
        out[kind] = F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        cur = F.regexp_replace(cur, pat, ph)
    return out
