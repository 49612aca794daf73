"""Sitemap index expansion + WARC→documents bridge
(sources/sitemapindex.py)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from news_crawler_spark.sources.sitemapindex import (
    expand_index,
    parse_sitemap_index,
    robots_sitemaps,
)
from news_crawler_spark.sources.warc import warc_to_documents

INDEX_XML = (
    "<sitemapindex>"
    "<sitemap><loc>http://a.test/s1.xml</loc>"
    "<lastmod>2026-01-05</lastmod></sitemap>"
    "<sitemap><loc>http://a.test/s2.xml</loc></sitemap>"
    "<sitemap><loc>http://a.test/s3.xml</loc>"
    "<lastmod>not-a-date</lastmod></sitemap>"
    "</sitemapindex>")

S1 = ("<urlset><url><loc>http://a.test/p1</loc>"
      "<lastmod>2026-01-04</lastmod></url>"
      "<url><loc>http://a.test/p2</loc></url></urlset>")
S2 = "<urlset><url><loc>http://a.test/p3</loc></url></urlset>"


def test_parse_index_and_try_date(spark):
    idx = parse_sitemap_index(
        spark.createDataFrame([(INDEX_XML,)], "xml string"))
    got = {r.sitemap_loc: r.index_lastmod for r in idx.collect()}
    assert got == {
        "http://a.test/s1.xml": datetime.date(2026, 1, 5),
        "http://a.test/s2.xml": None,
        "http://a.test/s3.xml": None,  # malformed date → null, no crash
    }


def test_expand_joins_fetched_children_only(spark):
    idx = parse_sitemap_index(
        spark.createDataFrame([(INDEX_XML,)], "xml string"))
    bodies = spark.createDataFrame(
        [("http://a.test/s1.xml", S1), ("http://a.test/s2.xml", S2)],
        "sitemap_loc string, xml string")  # s3 never fetched
    out = expand_index(idx, bodies).collect()
    by_loc = {r.loc: r for r in out}
    assert set(by_loc) == {"http://a.test/p1", "http://a.test/p2",
                           "http://a.test/p3"}
    assert by_loc["http://a.test/p1"].lastmod == datetime.date(2026, 1, 4)
    assert by_loc["http://a.test/p1"].index_lastmod == \
        datetime.date(2026, 1, 5)
    assert by_loc["http://a.test/p3"].index_lastmod is None


def test_warc_to_documents_text_and_media(spark, tmp_path):
    from news_crawler_spark.sources.warc import read_warc, write_warc

    rows = [("http://a.test/p1", "2026-01-01T00:00:00Z", "text/plain",
             bytearray("hello spans".encode())),
            ("http://a.test/img", "2026-01-01T00:00:00Z", "image/png",
             bytearray(b"\x89PNG..."))]
    df = spark.createDataFrame(
        rows, "url string, warc_date string, content_type string, "
              "payload binary")
    out = str(tmp_path / "w")
    write_warc(df, out)
    docs = {r.doc_id: r.spans for r in
            warc_to_documents(read_warc(spark, out)).collect()}
    t = docs["http://a.test/p1"][0]
    assert (t.kind, t.text, t.media_ref, t.offset) == \
        ("text", "hello spans", "", 0)
    m = docs["http://a.test/img"][0]
    assert m.kind == "media" and m.text == "" and \
        m.media_ref.startswith("<urn:sha256:")
    # the bridge output IS the operators' input shape
    from news_crawler_spark.operators.spanops import flatten_text
    flat = {r.doc_id: r.text for r in flatten_text(
        warc_to_documents(read_warc(spark, out))).collect()}
    assert flat["http://a.test/p1"] == "hello spans"
    assert flat["http://a.test/img"] is None  # media-only doc → NULL


def test_robots_sitemaps_directives(spark):
    body = ("User-agent: *\nDisallow: /x\n"
            "Sitemap: http://a.test/sm-index.xml\n"
            "sitemap:   http://a.test/news.xml\n"  # lowercase + spaces
            "# Sitemap: http://a.test/commented.xml\n"
            "NotSitemap: http://a.test/no.xml\n"
            "Sitemap: http://a.test/sm-index.xml\n")  # duplicate
    got = sorted(
        (r.host, r.sitemap_url) for r in robots_sitemaps(
            spark.createDataFrame([("a.test", body)],
                                  "host string, body string")).collect())
    assert got == [("a.test", "http://a.test/news.xml"),
                   ("a.test", "http://a.test/sm-index.xml")]
