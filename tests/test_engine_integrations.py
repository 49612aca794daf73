"""Engine integrations: per-round WET-style WARC archiving,
trap_report over the resolved set, plan_budgets over pending mass."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from news_crawler_spark.crawl import CrawlEngine, SyntheticFetcher
from news_crawler_spark.fixtures import SiteConfig, host_rows, seed_rows
from news_crawler_spark.operators.spanops import flatten_text
from news_crawler_spark.schemas import HOSTS
from news_crawler_spark.sources.warc import read_warc

CFG = SiteConfig(seed=11, n_hosts=5, base_pages=20, hot_factor=4, n_seeds=3)
N_ROUNDS = 3


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("arch_state"))
    archive = str(tmp_path_factory.mktemp("arch_warc"))
    hosts = spark.createDataFrame(host_rows(CFG), HOSTS)
    eng = CrawlEngine(spark, state, hosts,
                      SyntheticFetcher(CFG, parse_html=True),
                      seed=CFG.seed, max_attempts=CFG.max_attempts,
                      archive_dir=archive)
    eng.init(spark.createDataFrame(seed_rows(CFG),
                                   "url string, priority double"))
    stats = eng.run(N_ROUNDS)
    return eng, archive, stats


def test_archive_covers_exactly_the_ok_fetches(spark, crawl):
    eng, archive, stats = crawl
    recs = read_warc(spark, archive + "/round-*")
    got_urls = sorted(r.url for r in recs.select("url").collect())
    seen = sorted(r.url for r in eng.url_seen_df().collect())
    assert got_urls == seen  # one conversion record per ok fetch
    assert recs.count() == sum(s["ok"] for s in stats)
    assert recs.select("warc_type").distinct().collect()[0][0] == "conversion"


def test_archive_payloads_match_flattened_documents(spark, crawl):
    eng, archive, _ = crawl
    recs = read_warc(spark, archive + "/round-*").select(
        F.col("url").alias("doc_id"),
        F.decode(F.col("payload"), "UTF-8").alias("archived"))
    flat = flatten_text(eng.documents.read().select("doc_id", "spans")) \
        .select("doc_id", F.coalesce("text", F.lit("")).alias("text"))
    joined = recs.join(flat, "doc_id")
    assert joined.count() == recs.count()
    assert joined.where(F.col("archived") != F.col("text")).count() == 0


def test_archive_replay_is_byte_identical(spark, crawl, tmp_path):
    # re-serializing the same round's ok-set writes identical records:
    # the record date comes from the round number, ids are content
    # addresses — so resumed/replayed rounds can't fork the archive
    eng, archive, _ = crawl
    staged = eng.documents.read().select(
        F.col("doc_id"), "spans").limit(50)
    eng2_dir = str(tmp_path / "replay")
    old = eng.archive_dir
    try:
        eng.archive_dir = eng2_dir
        m1 = eng._archive_round(99, staged)
        m2 = eng._archive_round(99, staged)
    finally:
        eng.archive_dir = old
    assert [m["payload_sha256"] for m in m1] == \
        [m["payload_sha256"] for m in m2]
    segs = sorted(glob.glob(eng2_dir + "/round-00000099/*.warc"))
    assert segs and all(open(s, "rb").read() for s in segs)


def test_compressed_archive_reads_back_identical(spark, crawl, tmp_path):
    """archive_compress=True writes .warc.gz segments (one gzip member
    per record) that read back record-identical to the plain archive,
    and the manifests attest the same uncompressed stream."""
    eng, _, _ = crawl
    staged = eng.documents.read().select(F.col("doc_id"), "spans").limit(50)
    plain_dir, gz_dir = str(tmp_path / "plain"), str(tmp_path / "gz")
    old_dir, old_comp = eng.archive_dir, eng.archive_compress
    try:
        eng.archive_dir, eng.archive_compress = plain_dir, False
        m_plain = eng._archive_round(7, staged)
        eng.archive_dir, eng.archive_compress = gz_dir, True
        m_gz = eng._archive_round(7, staged)
    finally:
        eng.archive_dir, eng.archive_compress = old_dir, old_comp
    key = lambda ms: sorted((m["n_records"], m["n_bytes"],  # noqa: E731
                             m["payload_sha256"]) for m in ms)
    assert key(m_plain) == key(m_gz)
    assert glob.glob(gz_dir + "/round-00000007/*.warc.gz")
    want = sorted((r.url, bytes(r.payload)) for r in
                  read_warc(spark, plain_dir + "/round-*").collect())
    got = sorted((r.url, bytes(r.payload)) for r in
                 read_warc(spark, gz_dir + "/round-*").collect())
    assert got == want and got


def test_trap_report_counts_resolved_urls(crawl):
    eng, _, stats = crawl
    rep = eng.trap_report(min_urls=5).collect()
    assert sum(r.n_urls for r in rep) == sum(s["scheduled"] for s in stats)
    assert all(r.n_templates <= r.n_paths for r in rep)
    assert all(r.trap_ratio >= 1.0 for r in rep)


def test_plan_budgets_sums_exactly(crawl):
    eng, _, _ = crawl
    plan = eng.plan_budgets(500).collect()
    assert sum(r.alloc for r in plan) == 500
    assert all(r.alloc >= 1 for r in plan)
