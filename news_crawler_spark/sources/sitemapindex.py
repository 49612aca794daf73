"""Sitemap INDEX parsing + two-level expansion.

Large hosts don't serve one urlset — they serve a ``<sitemapindex>``
of child sitemap locations (sitemaps.org caps a urlset at 50k URLs /
50 MB, so any host worth a 10^10 frontier slot has an index). The
reference never reads sitemaps at all (sources/sitemap.py covers the
urlset half); this module adds the index half and the expansion join
between them.

Discovery and fetching stay decoupled, like robots gating: the index
parse yields child-sitemap URLs (frontier rows for the normal fetch
round), and ``expand_index`` joins the fetched child bodies back and
parses every urlset in one distributed Generate pass. The index's
``lastmod`` travels alongside each entry as ``index_lastmod`` — the
freshness hint the scheduler uses when a child urlset omits per-URL
lastmod (common in the wild).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_crawler_spark.sources.sitemap import parse_sitemap

# sitemaps.org sitemapindex subset (loc required, lastmod optional)
SITEMAP_INDEX_SCHEMA = "sitemap array<struct<loc:string, lastmod:string>>"


def robots_sitemaps(df: DataFrame, host_col: str = "host",
                    body_col: str = "body") -> DataFrame:
    """``Sitemap:`` directives from robots.txt bodies — host-wide per
    RFC 9309 §2.3 (they live OUTSIDE user-agent groups, which is why
    this is not part of sources/robots.py's group-scoped parse). The
    discovery link that chains robots → sitemap index → urlsets with
    zero page fetches: one line explode + one anchored, RE2-safe
    case-insensitive extract. Returns distinct (host, sitemap_url)."""
    t = df.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(body_col), "\n")).alias("line"))
    url = F.regexp_extract(F.col("line"), r"(?i)^\s*sitemap\s*:\s*(\S+)", 1)
    return (t.select("host", url.alias("sitemap_url"))
            .where(F.col("sitemap_url") != "")
            .distinct())


def parse_sitemap_index(df: DataFrame, xml_col: str = "xml",
                        keep_cols: list[str] | None = None) -> DataFrame:
    """One row per child sitemap: (sitemap_loc, index_lastmod:date).
    try_to_date for the same ANSI reason as parse_sitemap — one
    malformed index must not crash the distributed pass."""
    keep = keep_cols or []
    rows = df.select(
        *keep,
        F.explode(
            F.from_xml(F.col(xml_col), SITEMAP_INDEX_SCHEMA)
            .getField("sitemap")).alias("_s"))
    return rows.select(
        *keep,
        F.col("_s.loc").alias("sitemap_loc"),
        F.try_to_date(F.col("_s.lastmod")).alias("index_lastmod"))


def expand_index(index_rows: DataFrame, child_bodies: DataFrame,
                 loc_col: str = "sitemap_loc",
                 xml_col: str = "xml") -> DataFrame:
    """Join fetched child-sitemap bodies onto parsed index rows and
    parse every urlset: (sitemap_loc, index_lastmod, loc, lastmod,
    changefreq, priority). ``child_bodies`` carries (sitemap_loc,
    xml) from the fetch round; an index entry whose body never
    arrived drops out of the join (it stays pending in the frontier —
    correct, not an error)."""
    joined = index_rows.select(loc_col, "index_lastmod").join(
        child_bodies.select(loc_col, xml_col), loc_col)
    return parse_sitemap(joined, xml_col=xml_col,
                         keep_cols=[loc_col, "index_lastmod"])
