"""RSS feed parsing: XML bytes → advisory rows (S2/P2).

The reference fetches live RSS with feedparser and normalizes entries
(reference ``src/secbot/fetchers/advisory.py:61-109``): title/link/
summary trimmed, published timestamp → Asia/Seoul date with a
regex-date fallback, newest-first per-source limit. Here the XML→rows
stage is Spark-native ``from_xml`` (one parse per feed document, JVM
side — no Python), and the normalization is the same column algebra
the P2 contract query uses.

A feed document is one row (e.g. fetched body bytes); items explode
to one row each, so a million feeds parse as one distributed pass —
the reference's serial ``feedparser.parse`` loop becomes a Generate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_crawler_spark.operators.topk import top_k_per_group

# RSS 2.0 subset the reference consumes (feedparser fields title/link/
# published/summary ↔ item title/link/pubDate/description)
RSS_SCHEMA = (
    "channel struct<title:string, "
    "item:array<struct<title:string, link:string, pubDate:string, "
    "description:string>>>"
)


def parse_rss(df: DataFrame, xml_col: str = "xml",
              keep_cols: list[str] | None = None) -> DataFrame:
    """One row per feed item: (title, link, pub_ts, description).

    ``pubDate`` is RFC-822 ("Wed, 02 Oct 2002 13:00:05 GMT"); Spark 3+
    cannot *parse* a day-of-week field, so the weekday prefix is
    stripped before parsing (the formatter side still emits it).
    ``try_to_timestamp``, not ``to_timestamp``: under ANSI mode (this
    engine's default) a single malformed or differently-zoned pubDate
    ("... +0000") would otherwise crash the whole distributed parse —
    malformed dates must yield null pub_ts so callers fall back, as
    the reference does via ``_parse_date``.
    """
    keep = keep_cols or []
    items = df.select(
        *keep,
        F.explode(
            F.from_xml(F.col(xml_col), RSS_SCHEMA)
            .getField("channel").getField("item")
        ).alias("_i"),
    )
    pub = F.try_to_timestamp(
        F.regexp_replace(F.col("_i.pubDate"), r"^[A-Za-z]{3}, ", ""),
        F.lit("dd MMM yyyy HH:mm:ss 'GMT'"),
    )
    return items.select(
        *keep,
        F.col("_i.title").alias("title"),
        F.col("_i.link").alias("link"),
        pub.alias("pub_ts"),
        F.col("_i.description").alias("description"),
    )


def normalize_advisories(items: DataFrame, default_date: str = "1970-01-01",
                         keep_cols: list[str] | None = None) -> DataFrame:
    """P2 normalization (reference advisory.py:80-109): trimmed
    title/link/summary, UTC→Asia/Seoul publication date, regex
    YYYY-MM-DD fallback from the description when pubDate is absent."""
    seoul = F.to_date(F.from_utc_timestamp(F.col("pub_ts"), "Asia/Seoul"))
    fallback = F.coalesce(
        F.nullif(F.regexp_extract(F.col("description"),
                                  r"(\d{4}-\d{2}-\d{2})", 1), F.lit("")),
        F.lit(default_date),
    ).cast("date")
    return items.select(
        *(keep_cols or []),
        F.trim("title").alias("title"),
        F.trim("link").alias("link"),
        F.coalesce(seoul, fallback).alias("published"),
        F.trim("description").alias("summary"),
        "pub_ts",
    )


def latest_per_feed(advisories: DataFrame, feed_col: str, limit: int = 10) -> DataFrame:
    """S2 per-source limit (reference ``feed.entries[:limit]``,
    advisory.py:78 / news.py per-source cap): newest-first top-k per
    feed. Ranks by the full timestamp (not just the normalized date —
    two same-day items must keep the later one) with a deterministic
    link tiebreak."""
    return top_k_per_group(
        advisories, [feed_col],
        [F.col("published").desc(), F.col("pub_ts").desc_nulls_last(),
         F.col("link").asc()], limit,
        rank_col="feed_rank",
    )
