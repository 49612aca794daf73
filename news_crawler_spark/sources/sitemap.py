"""Sitemap XML parsing: urlset documents → frontier candidate rows.

Beyond the reference (it discovers URLs only from page links —
``fetchers/news.py`` anchor harvest), but the canonical crawl-side
companion to RSS: a host's sitemap.xml IS its self-declared frontier,
with lastmod/priority driving freshness scoring. Same architecture as
``sources/rss.py``: one fetched sitemap body is one row, Spark-native
``from_xml`` parses it JVM-side, ``<url>`` entries explode to one row
each — a million sitemaps parse as one distributed Generate pass, no
Python on the data plane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sitemaps.org urlset subset (loc required; the rest optional)
SITEMAP_SCHEMA = (
    "url array<struct<loc:string, lastmod:string, "
    "changefreq:string, priority:string>>"
)


def parse_sitemap(df: DataFrame, xml_col: str = "xml",
                  keep_cols: list[str] | None = None) -> DataFrame:
    """One row per sitemap ``<url>`` entry:
    (loc, lastmod:date, changefreq, priority:double).

    lastmod/priority use try-conversions: under ANSI mode a single
    malformed value in one sitemap must yield null for that entry,
    not crash the whole distributed parse (the rss.py pubDate
    rationale)."""
    keep = keep_cols or []
    rows = df.select(
        *keep,
        F.explode(
            F.from_xml(F.col(xml_col), SITEMAP_SCHEMA).getField("url")
        ).alias("_u"),
    )
    return rows.select(
        *keep,
        F.col("_u.loc").alias("loc"),
        F.try_to_date(F.col("_u.lastmod")).alias("lastmod"),
        F.col("_u.changefreq").alias("changefreq"),
        F.col("_u.priority").try_cast("double").alias("priority"),
    )


def sitemap_candidates(parsed: DataFrame, default_priority: float = 0.5) -> DataFrame:
    """Project parsed sitemap rows into frontier seed shape
    (url, priority) — the CrawlEngine.init input contract."""
    return parsed.select(
        F.col("loc").alias("url"),
        F.coalesce("priority", F.lit(default_priority)).alias("priority"),
    )
