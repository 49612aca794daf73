"""Crawl-trap detection (crawl/traps.py): template collapse, the
path/template ratio signal, and the min-URL guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_crawler_spark.crawl.traps import path_template, trap_signals


def _urls(spark, rows):
    return spark.createDataFrame(rows, "host string, path string")


def test_path_template_collapses_volatile_segments(spark):
    df = spark.createDataFrame(
        [("/2026/08/17/p123",), ("/2025/01/02/p999",),
         ("/s/deadbeef42cafe01/view",), ("/about",)], "path string")
    got = [r.t for r in df.select(path_template(F.col("path")).alias("t"))
           .collect()]
    assert got == ["/N/N/N/pN", "/N/N/N/pN", "/s/H/view", "/about"]


def test_trap_host_flags_and_organic_host_does_not(spark):
    rows = [("cal.example", f"/cal/2026/01/{i}") for i in range(30)]
    rows += [("org.example", p) for p in
             ("/about", "/contact", "/news/world", "/news/local",
              "/sports", "/tech", "/science", "/arts", "/travel",
              "/food", "/health", "/opinion", "/live", "/video",
              "/audio", "/weather", "/jobs", "/games", "/books",
              "/style")]
    got = {r.host: r for r in trap_signals(_urls(spark, rows)).collect()}
    cal, org = got["cal.example"], got["org.example"]
    assert cal.n_paths == 30 and cal.n_templates == 1
    assert cal.trap_ratio == 30.0 and cal.is_trap
    assert org.n_templates == org.n_paths and org.trap_ratio == 1.0
    assert not org.is_trap


def test_min_urls_guard_spares_small_hosts(spark):
    rows = [("tiny.example", f"/x/{i}") for i in range(10)]
    sig = trap_signals(_urls(spark, rows)).collect()[0]
    assert sig.trap_ratio == 10.0 and not sig.is_trap  # ratio high, count low


def test_repeat_fetches_dont_inflate_the_ratio(spark):
    # same 3 paths fetched 10x each: n_urls 30, n_paths 3, ratio 1
    rows = [("re.example", f"/p/{i % 3}") for i in range(30)]
    sig = trap_signals(_urls(spark, rows)).collect()[0]
    assert (sig.n_urls, sig.n_paths, sig.n_templates) == (30, 3, 1)
    assert sig.trap_ratio == 3.0 and not sig.is_trap
