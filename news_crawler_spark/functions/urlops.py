"""URL splitting as native expressions (P7/P10, reference
``suricata_url.py:85-88``: urlparse → hostname/path/query).

``parse_url`` is built-in, but the DuckDB oracle lacks it, so these
are defined with regexes that both engines evaluate identically —
and regexes are codegen'd just the same.
"""

from __future__ import annotations

from pyspark.sql import functions as F

HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"
QUERY_RE = r"\?([^#]*)"


def _c(col):
    return F.col(col) if isinstance(col, str) else col


def url_host(col) -> F.Column:
    return F.regexp_extract(_c(col), HOST_RE, 1)


def url_path(col) -> F.Column:
    """Path component; '/' when absent (matches frontier convention)."""
    return F.coalesce(F.nullif(F.regexp_extract(_c(col), PATH_RE, 1), F.lit("")), F.lit("/"))


def url_query(col) -> F.Column:
    return F.regexp_extract(_c(col), QUERY_RE, 1)


def url_origin(col) -> F.Column:
    """scheme://host — the join base for relative refs (P10)."""
    return F.regexp_extract(_c(col), r"^([a-z][a-z0-9+.-]*://[^/?#]+)", 1)


def url_unquote(col) -> F.Column:
    """Percent-decoding with ``urllib.parse.unquote`` semantics
    (reference ``suricata_url.py:85-88``): '+' is a literal plus, and
    malformed escapes ('100% off', a truncated '%E') pass through
    unchanged instead of crashing. Spark's built-in ``url_decode`` is
    form-decoding ('+' → space) and throws CANNOT_DECODE_URL on a
    stray '%' under ANSI, so lone percents are escaped to %25 and
    pluses shielded as %2B first. Stays native/codegen — no UDF.
    (No DuckDB oracle: v1.0 has no url_decode; parity is unit-tested
    against urllib.parse.unquote directly.)"""
    guarded = F.regexp_replace(_c(col), r"%(?![0-9A-Fa-f]{2})", "%25")
    return F.url_decode(F.regexp_replace(guarded, r"\+", "%2B"))
