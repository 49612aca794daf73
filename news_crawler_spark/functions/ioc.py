"""IOC (indicator-of-compromise) extraction + normalization as native
column expressions.

Reference semantics: compiled regex sets for IPv4 (incl. defanged
``[.]`` octets), MD5/SHA1/SHA256 hex, URLs (incl. defanged
``https[:]//``) at ``asec.py:44-53`` / ``parsers/ioc.py:34-53`` (X1);
``findall`` + set-union per kind (X2/D3); defang-reversal
``[.] -> .`` at ``main.py:38-42`` (P5); ``ipaddress`` validation at
``suricata.py:113-123`` (P6).

Everything here is ``regexp_extract_all`` / ``regexp_replace`` /
``explode`` — JVM-side, codegen'd, no Python on the data plane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# X1 pattern set (the asec feed set, ``asec.py:44-53``). Keys mirror
# the reference's dict keys ("ip"|"hash"|"url"). Loose octets +
# defanged forms; extraction defang-normalizes.
IOC_PATTERNS: dict[str, str] = {
    # IPv4, defanged or not: 1.2.3.4 / 1.2.3[.]4 / 1[.]2[.]3[.]4
    "ip": r"\b(?:\d{1,3}(?:\.|\[\.\])){3}\d{1,3}\b",
    # MD5 / SHA-1 / SHA-256 hex runs (32/40/64)
    "hash": r"\b[a-fA-F0-9]{64}\b|\b[a-fA-F0-9]{40}\b|\b[a-fA-F0-9]{32}\b",
    # http(s) URLs, defanged variants hxxp / https[:]//
    "url": r"\bh(?:xx|tt)ps?(?::|\[:\])//[^\s\"'<>]+",
}

# The reference keeps a SECOND, canonical pattern set
# (``parsers/ioc.py:34-53``) and the two differ on purpose: strict
# IPv4 octets (999.1.2.3 is NOT an ip), URLs with an optional :port
# and a bounded host charset, case-insensitive scheme, and NO defanged
# forms. "1.2.3.4:8080" extracts ip=1.2.3.4 here but the loose asec
# set is what catches "1[.]2[.]3[.]4".
_OCTET_STRICT = r"(?:25[0-5]|2[0-4]\d|1?\d{1,2})"
IOC_PATTERNS_CANONICAL: dict[str, str] = {
    "ip": rf"\b(?:{_OCTET_STRICT}\.){{3}}{_OCTET_STRICT}\b",
    "url": r"(?i)https?://[A-Za-z0-9\-_\.]+(?::[0-9]{1,5})?(?:/[^\s'\"<>]*)?",
    "hash": r"\b[a-fA-F0-9]{64}\b|\b[a-fA-F0-9]{40}\b|\b[a-fA-F0-9]{32}\b",
}


def defang_reverse(col: F.Column | str) -> F.Column:
    """P5 + URL-sink normalization: ``[.]``->``.``, ``[:]``->``:``,
    ``hxxp``->``http`` (reference main.py:38-42, suricata_url.py:85-88)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"\[\.\]", ".")
    c = F.regexp_replace(c, r"\[:\]", ":")
    return F.regexp_replace(c, r"\bhxxp", "http")


_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"


def valid_ipv4(col: F.Column | str) -> F.Column:
    """P6 validity predicate (reference suricata.py:118-123) — native
    regex equivalent of ``ipaddress.ip_address`` for dotted-quad v4."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(rf"^{_OCTET}\.{_OCTET}\.{_OCTET}\.{_OCTET}$")


def _findall_long(df: DataFrame, patterns: dict[str, str], text_col: str,
                  id_col: str) -> DataFrame:
    per_kind = [
        df.select(
            F.col(id_col),
            F.lit(kind).alias("kind"),
            F.explode(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).alias("raw"),
        )
        for kind, pat in patterns.items()
    ]
    out = per_kind[0]
    for p in per_kind[1:]:
        out = out.unionByName(p)  # U1/U2
    return out


def extract_iocs_long(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """X1/X2/D3: findall per kind (asec set) → long format
    (id, kind, value), defang-normalized and deduplicated.

    The reference's ``Dict[str, Set[str]]`` becomes a long DataFrame —
    sets are ``dropDuplicates``, the dict shape is presentation
    (SURVEY.md §1.1).
    """
    out = _findall_long(df, IOC_PATTERNS, text_col, id_col)
    return (
        out.select(id_col, "kind", defang_reverse("raw").alias("value"))
        .dropDuplicates([id_col, "kind", "value"])  # D3 set semantics
    )


def extract_iocs_canonical_long(df: DataFrame, text_col: str = "text",
                                id_col: str = "doc_id") -> DataFrame:
    """Canonical extractor (reference ``parsers/ioc.py:68-88``):
    strict-octet IPs, port-aware URLs, NO defang normalization —
    values come back verbatim, sorted-unique set semantics."""
    out = _findall_long(df, IOC_PATTERNS_CANONICAL, text_col, id_col)
    return (
        out.select(id_col, "kind", F.col("raw").alias("value"))
        .dropDuplicates([id_col, "kind", "value"])
    )
