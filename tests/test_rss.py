"""S2/P2: RSS XML → advisory rows, reference-style canned payloads
(model: reference src/tests/test_fetchers.py:22-49 — feed a known
feed, assert exact parsed titles/links/dates)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from news_crawler_spark.sources.rss import (
    latest_per_feed,
    normalize_advisories,
    parse_rss,
)

FEED = """<rss version="2.0"><channel><title>KISA 보안공지</title>
<item><title>  취약점 주의보  </title><link> http://adv.test/1 </link>
<pubDate>Wed, 02 Oct 2002 13:00:05 GMT</pubDate>
<description> patch now 2002-10-01 </description></item>
<item><title>no date item</title><link>http://adv.test/2</link>
<description>fallback 2024-12-31 here</description></item>
<item><title>no date no fallback</title><link>http://adv.test/3</link>
<description>nothing to see</description></item>
</channel></rss>"""


def _parsed(spark):
    df = spark.createDataFrame([("f1", FEED)], "feed string, xml string")
    return parse_rss(df, "xml", keep_cols=["feed"])


def test_rss_items_explode_with_fields(spark):
    rows = {r.link.strip(): r for r in _parsed(spark).collect()}
    assert set(rows) == {"http://adv.test/1", "http://adv.test/2",
                         "http://adv.test/3"}
    first = rows["http://adv.test/1"]
    assert first.title.strip() == "취약점 주의보"
    assert first.pub_ts == dt.datetime(2002, 10, 2, 13, 0, 5)
    assert rows["http://adv.test/2"].pub_ts is None


def test_rss_normalization_seoul_and_fallback(spark):
    adv = {r.link: r for r in normalize_advisories(_parsed(spark)).collect()}
    # 13:00 UTC + 9h = 22:00 Seoul, same date
    assert adv["http://adv.test/1"].published == dt.date(2002, 10, 2)
    assert adv["http://adv.test/1"].title == "취약점 주의보"  # trimmed
    # no pubDate → regex fallback from description
    assert adv["http://adv.test/2"].published == dt.date(2024, 12, 31)
    # neither → default epoch date
    assert adv["http://adv.test/3"].published == dt.date(1970, 1, 1)


def test_rss_seoul_date_rolls_over_midnight(spark):
    xml = ('<rss><channel><item><title>t</title><link>l</link>'
           '<pubDate>Tue, 01 Oct 2002 16:30:00 GMT</pubDate>'
           '<description>d</description></item></channel></rss>')
    df = spark.createDataFrame([(xml,)], "xml string")
    row = normalize_advisories(parse_rss(df)).collect()[0]
    # 16:30 UTC + 9h = 01:30 NEXT day in Seoul
    assert row.published == dt.date(2002, 10, 2)


def test_per_feed_limit_newest_first(spark):
    items = "".join(
        f"<item><title>t{i}</title><link>http://x/{i}</link>"
        f"<pubDate>Wed, {i:02d} Oct 2002 10:00:00 GMT</pubDate>"
        f"<description>d</description></item>"
        for i in range(1, 8))
    xml = f"<rss><channel>{items}</channel></rss>"
    df = spark.createDataFrame([("feedA", xml)], "feed string, xml string")
    adv = normalize_advisories(parse_rss(df, "xml", keep_cols=["feed"]),
                               keep_cols=["feed"])
    top = latest_per_feed(adv, "feed", limit=3).collect()
    assert [r.link for r in sorted(top, key=lambda r: r.feed_rank)] == [
        "http://x/7", "http://x/6", "http://x/5"]


def test_parse_rss_malformed_pubdate_yields_null_not_crash(spark):
    """One bad (or merely differently-zoned) pubDate must not kill the
    distributed parse under ANSI mode: null pub_ts + date fallback."""
    xml = ('<rss version="2.0"><channel><title>f</title>'
           '<item><title>ok</title><link>http://t/1</link>'
           '<pubDate>Wed, 02 Oct 2002 13:00:05 GMT</pubDate>'
           '<description>fine</description></item>'
           '<item><title>offset</title><link>http://t/2</link>'
           '<pubDate>Wed, 02 Oct 2002 13:00:05 +0000</pubDate>'
           '<description>body 2024-05-06 text</description></item>'
           '<item><title>garbage</title><link>http://t/3</link>'
           '<pubDate>not a date at all</pubDate>'
           '<description>no date here</description></item>'
           '</channel></rss>')
    df = spark.createDataFrame([(xml,)], "xml string")
    rows = {r.link: r for r in
            normalize_advisories(parse_rss(df, "xml")).collect()}
    assert rows["http://t/1"].pub_ts is not None
    assert rows["http://t/2"].pub_ts is None
    assert str(rows["http://t/2"].published) == "2024-05-06"  # regex fallback
    assert rows["http://t/3"].pub_ts is None
    assert str(rows["http://t/3"].published) == "1970-01-01"  # default


def test_parse_sitemap_and_candidates(spark):
    """Sitemap urlset parse: good entries get typed lastmod/priority;
    malformed values yield null (never an ANSI crash); candidates
    project to the CrawlEngine.init (url, priority) seed shape with a
    default for missing priority."""
    from news_crawler_spark.sources.sitemap import (
        parse_sitemap, sitemap_candidates)

    xml = ('<urlset>'
           '<url><loc>http://h/a</loc><lastmod>2025-02-03</lastmod>'
           '<changefreq>daily</changefreq><priority>0.8</priority></url>'
           '<url><loc>http://h/b</loc><lastmod>yesterday-ish</lastmod>'
           '<priority>high</priority></url>'
           '<url><loc>http://h/c</loc></url>'
           '</urlset>')
    df = spark.createDataFrame([("h", xml)], "host string, xml string")
    rows = {r.loc: r for r in parse_sitemap(df, keep_cols=["host"]).collect()}
    assert str(rows["http://h/a"].lastmod) == "2025-02-03"
    assert rows["http://h/a"].priority == 0.8
    assert rows["http://h/a"].changefreq == "daily"
    assert rows["http://h/b"].lastmod is None      # malformed date -> null
    assert rows["http://h/b"].priority is None     # malformed float -> null
    assert rows["http://h/c"].priority is None
    cand = {r.url: r.priority
            for r in sitemap_candidates(parse_sitemap(df)).collect()}
    assert cand == {"http://h/a": 0.8, "http://h/b": 0.5, "http://h/c": 0.5}


def test_parse_robots_groups_comments_and_delay(spark):
    """robots.txt parsing: multi-agent groups, comments, empty
    Disallow (allow-all, no rule), bot-specific groups ignored for
    '*', min crawl-delay across applicable groups, comments-only body
    -> allow-all row, and the HOSTS-table projection."""
    from news_crawler_spark.sources.robots import parse_robots, robots_to_hosts

    body_a = ("# policy\n"
              "User-agent: fancybot\n"
              "Disallow: /only-bot\n"
              "\n"
              "User-agent: other\n"
              "User-agent: *\n"
              "Disallow: /private  # inline comment\n"
              "Disallow: /tmp\n"
              "Crawl-delay: 2.5\n"
              "\n"
              "User-agent: *\n"
              "Disallow: /b\n"
              "Crawl-delay: 1\n")
    body_b = "User-agent: *\nDisallow:\n"   # empty Disallow = allow all
    body_c = "# nothing but comments\n"
    df = spark.createDataFrame(
        [("a", body_a), ("b", body_b), ("c", body_c)], "host string, body string")
    rows = {r.host: r for r in parse_robots(df).collect()}
    assert rows["a"].disallow == ["/b", "/private", "/tmp"]
    assert rows["a"].crawl_delay == 1.0        # min across the two * groups
    assert rows["b"].disallow == [] and rows["b"].crawl_delay is None
    assert rows["c"].disallow == [] and rows["c"].crawl_delay is None

    hosts = {r.host: r for r in robots_to_hosts(parse_robots(df), budget=5).collect()}
    assert hosts["c"].crawl_delay == 1.0 and hosts["c"].budget == 5
    assert hosts["a"].disallow == ["/b", "/private", "/tmp"]

    # the bot-specific group applies when asked for that agent
    bot = {r.host: r for r in parse_robots(df, agent="FancyBot").collect()}
    assert "/only-bot" in bot["a"].disallow
