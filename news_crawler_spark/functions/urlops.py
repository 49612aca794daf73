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


TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref_src)(=|$)"


def url_normalize(col) -> F.Column:
    """Canonical URL for frontier/seen-set dedup: lowercase scheme and
    host, default port stripped (:80 for http, :443 for https),
    fragment dropped, tracking params removed (utm_*, fbclid, gclid,
    msclkid, ref_src), remaining query params SORTED — so the same
    resource fetched via differently-ordered or tracker-decorated
    links hashes to one frontier slot instead of being crawled twice.

    All native (regexp_extract / filter / array_sort / concat) —
    codegen'd, and every step is replayable by the DuckDB oracle.
    Path is preserved verbatim ('' stays '', no trailing-slash
    guessing): normalization must never merge two URLs a server could
    treat differently. Scheme-less / malformed inputs (no
    ``scheme://`` prefix) pass through as the trimmed original —
    otherwise distinct inputs like 'a?x=1' and 'b?x=1' would both
    collapse to '://?x=1' and share one frontier slot.
    """
    c = F.trim(_c(col))
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host0 = F.lower(F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(host0, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host0, r":443$", ""))
        .otherwise(host0)
    )
    path = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    query = F.regexp_extract(c, QUERY_RE, 1)
    kept = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    ))
    qnorm = F.array_join(kept, "&")
    normalized = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", c).otherwise(normalized)


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
