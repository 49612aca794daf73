"""Column-level building blocks — all native Spark SQL expressions
(whole-stage-codegen'd), no UDFs (SURVEY.md §2.11/§2.13)."""

from news_crawler_spark.functions.ioc import (
    IOC_PATTERNS,
    IOC_PATTERNS_CANONICAL,
    defang_reverse,
    extract_iocs_canonical_long,
    extract_iocs_long,
    valid_ipv4,
)
from news_crawler_spark.functions.pii import pii_counts, pii_redact
from news_crawler_spark.functions.urlops import (
    url_host,
    url_normalize,
    url_origin,
    url_path,
    url_query,
)
from news_crawler_spark.functions.textstats import (
    dominant_script,
    fingerprint,
    lang_guess,
    quality_score,
    script_fracs,
    token_count,
)

__all__ = [
    "IOC_PATTERNS",
    "IOC_PATTERNS_CANONICAL",
    "defang_reverse",
    "extract_iocs_canonical_long",
    "extract_iocs_long",
    "valid_ipv4",
    "pii_counts",
    "pii_redact",
    "url_host",
    "url_normalize",
    "url_origin",
    "url_path",
    "url_query",
    "fingerprint",
    "dominant_script",
    "lang_guess",
    "script_fracs",
    "quality_score",
    "token_count",
]
