"""S4: the real HTTP fetch path, e2e against a loopback server.

No external network — a threaded stdlib server on 127.0.0.1 serves
deterministic HTML, and the assertions run the SAME distributed DAG
(fetch_round's mapInPandas, executors fetching over the socket) as a
production crawl. Covers the status-code semantics the engine's
dispositions depend on: 200 parses to spans, 404 is a real 404 (dead,
not retried), connection refused / timeout is -1 (retryable).
"""

from __future__ import annotations

import hashlib
import http.server
import threading

import pytest
from pyspark.sql import functions as F

from news_crawler_spark.crawl.fetch import HttpFetcher, fetch_round
from news_crawler_spark.functions.htmlspans import html_to_spans

PAGES = {
    "/a": ("<html><head><title>Page A</title></head><body>"
           "alpha text <a href='/b'>to b</a> tail</body></html>"),
    "/b": ("<html><head><title>Page B</title></head><body>"
           "beta <a href='/c'>to c</a></body></html>"),
    "/c": "<html><head><title>Page C</title></head><body>gamma</body></html>",
}


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 — stdlib API name
        body = PAGES.get(self.path)
        if body is None:
            self.send_error(404)
            return
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # keep test output clean
        pass


@pytest.fixture(scope="module")
def http_base():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_fetcher_statuses_and_spans(http_base):
    f = HttpFetcher(timeout=5.0)
    ok = f.fetch(f"{http_base}/a")
    assert ok["status"] == 200
    assert ok["spans"] == html_to_spans(PAGES["/a"])
    assert any(k == "link" and m == "/b" for k, _, m, _ in ok["spans"])

    missing = f.fetch(f"{http_base}/nope")
    assert missing["status"] == 404  # a 404 IS a response, not a -1

    refused = HttpFetcher(timeout=0.5).fetch("http://127.0.0.1:9/x")
    assert refused["status"] == -1  # connection error → retryable


def test_fetch_round_over_loopback_http(spark, http_base):
    """The distributed fetch DAG with the REAL fetcher: executors GET
    over the socket inside the Arrow UDF; statuses and span sequences
    come back exactly as the serial parser produces them."""
    paths = ["/a", "/b", "/c", "/missing"]
    rows = [
        (f"{http_base}{p}",
         int.from_bytes(hashlib.sha256(p.encode()).digest()[:4], "big"),
         hashlib.sha256(p.encode()).hexdigest(),
         "127.0.0.1", p, 0.5, 0, 0, i)
        for i, p in enumerate(paths)
    ]
    sel = spark.createDataFrame(
        rows,
        "url string, url_hash long, url_sha string, host string, "
        "path string, priority double, discovered_round int, "
        "attempt int, seq int",
    ).withColumn("crawl_delay", F.lit(0.0))
    got = {r.path: r for r in fetch_round(sel, HttpFetcher(timeout=5.0)).collect()}
    assert len(got) == 4
    for p, html in PAGES.items():
        assert got[p].status == 200
        spans = [(s.kind, s.text, s.media_ref, s.offset) for s in got[p].spans]
        assert spans == html_to_spans(html)
    assert got["/missing"].status == 404
    assert got["/missing"].spans is None


N_SITE = 18  # /p0 … /p17, chain+skip links → strongly reachable from /p0


def _site_page(k: int) -> str:
    links = [f"/p{(k + 1) % N_SITE}", f"/p{(3 * k + 7) % N_SITE}"]
    extra = ""
    if k % 5 == 0:
        extra += "<a href='/admin/secret'>admin</a> "   # robots-disallowed
    if k == 2:
        extra += "<a href='/missing'>gone</a> "         # permanent 404
    body = " ".join(f"<a href='{u}'>link{j}</a>" for j, u in enumerate(links))
    return (f"<html><head><title>P{k}</title></head><body>"
            f"text {k} {body} {extra}</body></html>")


class _SiteHandler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802
        if self.path.startswith("/p") and self.path[2:].isdigit() \
                and int(self.path[2:]) < N_SITE:
            data = _site_page(int(self.path[2:])).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
        else:
            self.send_error(404)

    def log_message(self, *a):
        pass


def test_full_engine_crawl_over_loopback_http(spark, tmp_path):
    """The COMPLETE engine — frontier, politeness budget, robots
    gate, fetch UDF, link extraction, dedup, snapshot commits —
    against a real HTTP server on 127.0.0.1. Invariants: the whole
    reachable site is crawled exactly once, spans equal the serial
    parser on the served bodies, the robots-disallowed path is never
    fetched, and the dangling /missing link dies as a 404."""
    from news_crawler_spark.crawl import CrawlEngine
    from news_crawler_spark.schemas import HOSTS

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _SiteHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    host = base.split("//")[1]
    try:
        hosts = spark.createDataFrame(
            [(host, 0.0, 7, ["/admin"])], HOSTS)
        eng = CrawlEngine(spark, str(tmp_path / "state"), hosts,
                          HttpFetcher(timeout=5.0), seed=1, max_attempts=2)
        eng.init(spark.createDataFrame([(f"{base}/p0", 1.0)],
                                       "url string, priority double"))
        for _ in range(8):
            if eng.run_round()["scheduled"] == 0:
                break

        seen = {r.url for r in eng.url_seen_df().collect()}
        assert seen == {f"{base}/p{k}" for k in range(N_SITE)}
        dead = {r.url for r in eng.dead_df().collect()}
        assert dead == {f"{base}/missing"}
        assert not any("/admin" in r.url
                       for r in eng.resolved.read().collect())
        dup = (eng.resolved.read().groupBy("url_sha", "attempt").count()
               .filter("count > 1").count())
        assert dup == 0

        docs = {r.doc_id: [(s.kind, s.text, s.media_ref, s.offset)
                           for s in r.spans]
                for r in eng.documents.read().collect()}
        for k in range(N_SITE):
            assert docs[f"{base}/p{k}"] == html_to_spans(_site_page(k))
    finally:
        srv.shutdown()
