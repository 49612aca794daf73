"""Crawl-trap detection: hosts whose URL space explodes without new
content (calendar pages, session ids in paths, faceted-search
combinatorics). The reference crawler never meets traps — its
frontier is a fixed RSS seed list (reference:
src/secbot/fetchers/news.py:34 RSS_FEEDS)
— but a frontier that follows links at 10^10 scale dies without this
guard: a single trap host can fill the entire fetch budget with
unique-looking URLs.

Signal: normalize each path to its TEMPLATE (digit runs → 'N', long
hex/uuid-ish runs → 'H') and compare per-host distinct-path count to
distinct-template count. Organic sites add templates as they add
paths (ratio stays small); traps mint unbounded paths from a handful
of templates (ratio grows with crawl depth). Everything is native
expressions and ONE map-side-combinable groupBy on host — at scale
this runs over the frontier/seen table and shuffles only per-host
partial counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# order matters: hex runs first (a digit run is also a hex run), then
# remaining digit runs. Deliberately boundary-free (no lookaround):
# the patterns must mean the same thing under Java regex AND RE2, so
# any SQL engine replays the template identically
_HEX_RUN = "[0-9a-f]{8,}"
_DIGIT_RUN = "[0-9]+"


def path_template(col: F.Column) -> F.Column:
    """Collapse the volatile parts of a path: /2026/08/17/p123 and
    /2025/01/02/p999 both become /N/N/N/pN; session-id-ish hex runs
    (/s/deadbeef42cafe01) become /s/H."""
    return F.regexp_replace(
        F.regexp_replace(col, _HEX_RUN, "H"), _DIGIT_RUN, "N")


def trap_signals(urls: DataFrame, ratio_threshold: float = 8.0,
                 min_urls: int = 20) -> DataFrame:
    """Per-host trap report from (host, path) rows.

    Returns (host, n_urls, n_paths, n_templates, max_depth,
    trap_ratio, is_trap): trap_ratio = distinct paths per distinct
    template (rounded 6dp so downstream thresholding replays exactly
    in any engine); is_trap gates on both the ratio and a minimum URL
    count so tiny hosts can't trip the detector. The caller feeds
    is_trap hosts into the frontier's exclusion rules (K3/K4 sinks) —
    detection and enforcement stay decoupled, like robots gating.
    """
    t = urls.select(
        "host", "path",
        path_template(F.col("path")).alias("tmpl"),
        (F.size(F.split(F.col("path"), "/")) - 1).alias("depth"))
    per = t.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("path").alias("n_paths"),
        F.countDistinct("tmpl").alias("n_templates"),
        F.max("depth").alias("max_depth"))
    ratio = F.round(F.col("n_paths") / F.col("n_templates"), 6)
    return per.select(
        "host", "n_urls", "n_paths", "n_templates", "max_depth",
        ratio.alias("trap_ratio"),
        ((ratio >= F.lit(ratio_threshold))
         & (F.col("n_urls") >= F.lit(min_urls))).alias("is_trap"))
