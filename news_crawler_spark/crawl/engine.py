"""CrawlEngine: the per-round DAG + resumable state (SURVEY.md §3.4, §7).

One round = one declarative DataFrame DAG::

    frontier scan → latest-attempt → anti-join url_seen/dead
      → robots + budget gate (broadcast hosts)
      → salt-local + per-host priority top-k          (selection)
      → (host, salt) repartition → fetch/parse UDF    (the only Python)
      → link extraction (native) → first-wins anti-join vs frontier
      → state appends: url_seen, dead, documents, crawl_log, frontier
      → lineage row                                    (commit marker)

Exactly-once per URL: the lineage row for round r is appended *after*
every state append; resume pins each table to the snapshot ids of the
last complete lineage row, so a job killed mid-round replays only the
unfinished round and no URL twice (SURVEY.md §7.4 — a deliberate
upgrade over the reference's mark-before-send at-most-once,
``scheduler.py:60-89``).

The reference's daily-cron loop (``scheduler.py:92-111``) maps to the
driver calling :meth:`run_round` per round; batch rounds, not
Structured Streaming, because frontier feedback (this round's links
are next round's input) is a cyclic dataflow that streaming cannot
express.
"""

from __future__ import annotations

import datetime as _dt
import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_crawler_spark import schemas
from news_crawler_spark.crawl import frontier as frontier_ops
from news_crawler_spark.crawl.fetch import Fetcher, extract_links, fetch_round
from news_crawler_spark.tables import SnapshotTable

RETRYABLE = (503, -1)


def url_priority_col(seed: int, url_col: str = "url") -> F.Column:
    """Native equivalent of fixtures.sitegen.url_priority: the first
    8 bytes of sha256(f"{seed}|{url}|prio") as u64, mod 1e5, / 1e5."""
    digest = F.sha2(F.concat_ws("|", F.lit(str(seed)), F.col(url_col), F.lit("prio")), 256)
    u64 = F.conv(F.substring(digest, 1, 16), 16, 10).cast("decimal(20,0)")
    return (F.pmod(u64, F.lit(100000)).cast("double") / F.lit(100000.0))


class CrawlEngine:
    def __init__(self, spark: SparkSession, state_dir: str, hosts: DataFrame,
                 fetcher: Fetcher, seed: int = 42, max_attempts: int = 3,
                 n_salts: int = 8):
        self.spark = spark
        self.hosts = hosts
        self.fetcher = fetcher
        self.seed = seed
        self.max_attempts = max_attempts
        self.n_salts = n_salts
        st = lambda name, schema: SnapshotTable(spark, state_dir, name, schema)
        self.frontier = st("frontier", schemas.FRONTIER)
        self.url_seen = st("url_seen", schemas.URL_SEEN)
        self.dead = st("dead", schemas.URL_SEEN)
        self.documents = st("documents", schemas.DOCUMENTS)
        self.crawl_log = st("crawl_log", schemas.EXPECTED_CRAWL)
        self.lineage = st("lineage", schemas.LINEAGE)
        self.next_round = 0

    # -- lifecycle --------------------------------------------------------
    def init(self, seeds: DataFrame) -> None:
        """Install the seed list (url, priority) as frontier round -1."""
        rows = seeds.select(
            "url",
            F.xxhash64("url").alias("url_hash"),
            F.sha2(F.col("url"), 256).alias("url_sha"),
            F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host"),
            F.coalesce(
                F.nullif(F.regexp_extract("url", r"^https?://[^/]+(/.*)$", 1), F.lit("")),
                F.lit("/"),
            ).alias("path"),
            F.col("priority").cast("double"),
            F.lit(0).alias("discovered_round"),
            F.lit(0).alias("attempt"),
            F.lit(0).alias("not_before"),
        )
        self.frontier.append(rows)
        self._commit_lineage(-1, 0, 0, 0, 0, "")
        self.next_round = 0

    def _commit_lineage(self, round_no: int, scheduled: int, ok: int,
                        errors: int, new_urls: int, bloom_digest: str) -> None:
        row = [(round_no, scheduled, ok, errors, new_urls,
                self.frontier.current_snapshot(),
                self.url_seen.current_snapshot(),
                self.dead.current_snapshot(),
                self.documents.current_snapshot(),
                self.crawl_log.current_snapshot(),
                bloom_digest,
                _dt.datetime.now(_dt.timezone.utc).isoformat())]
        self.lineage.append(self.spark.createDataFrame(row, schemas.LINEAGE))

    def resume(self) -> int:
        """Pin all state tables to the last complete lineage row.

        Returns the next round to run. Any appends from a round whose
        lineage row never committed are rolled back (never replayed
        partially) — the kill/resume invariant of SURVEY.md §7.2 M5.
        """
        rows = self.lineage.read().orderBy(F.col("round").desc()).limit(1).collect()
        if not rows:
            raise RuntimeError("resume() before init(): no lineage rows")
        last = rows[0]
        self.frontier.rollback(last.frontier_snapshot)
        self.url_seen.rollback(last.url_seen_snapshot)
        self.dead.rollback(last.dead_snapshot)
        self.documents.rollback(last.documents_snapshot)
        self.crawl_log.rollback(last.crawl_log_snapshot)
        self.next_round = last["round"] + 1
        return self.next_round

    # -- the round DAG ----------------------------------------------------
    def run_round(self, round_no: int | None = None) -> dict:
        r = self.next_round if round_no is None else round_no
        selected = frontier_ops.select_candidates(
            self.frontier.read(), self.url_seen.read(), self.dead.read(),
            self.hosts, r,
        )
        fetched = fetch_round(selected, self.fetcher, n_salts=self.n_salts)
        fetched.persist()
        try:
            scheduled = fetched.count()
            if scheduled == 0:
                self.next_round = r + 1
                return {"round": r, "scheduled": 0, "ok": 0, "errors": 0, "new_urls": 0}

            ok = fetched.filter(F.col("status") == 200)
            exhausted = F.col("status").isin(list(RETRYABLE)) & (
                F.col("attempt") + 1 >= self.max_attempts
            )
            dead_rows = fetched.filter((F.col("status") == 404) | exhausted)
            retries = fetched.filter(
                F.col("status").isin(list(RETRYABLE)) & (F.col("attempt") + 1 < self.max_attempts)
            )

            seen_cols = ["url_hash", "url_sha", "url"]
            n_ok = ok.count()
            self.url_seen.append(
                ok.select(*seen_cols, F.lit(r).alias("seen_round")))
            n_err = scheduled - n_ok
            self.dead.append(
                dead_rows.select(*seen_cols, F.lit(r).alias("seen_round")))

            # first-wins (D2): candidates never re-enter the frontier —
            # every previously discovered URL already has a frontier row
            candidates = (
                extract_links(fetched)
                .join(self.frontier.read().select("url_sha"), "url_sha", "left_anti")
                .select(
                    "url", "url_hash", "url_sha", "host", "path",
                    url_priority_col(self.seed).alias("priority"),
                    F.lit(r).alias("discovered_round"),
                    F.lit(0).alias("attempt"),
                    F.lit(0).alias("not_before"),
                )
            )
            retry_rows = retries.select(
                "url", "url_hash", "url_sha", "host", "path", "priority",
                "discovered_round",
                (F.col("attempt") + 1).alias("attempt"),
                (F.lit(r + 1) + F.col("attempt")).cast("int").alias("not_before"),
            )
            appended = candidates.unionByName(retry_rows)
            appended.persist()
            n_new = candidates.count()
            self.frontier.append(appended)
            appended.unpersist()

            self.documents.append(
                ok.select(F.col("url").alias("doc_id"), "spans"))
            self.crawl_log.append(
                fetched.select(F.lit(r).alias("round"), "host", "seq", "url"))

            self._commit_lineage(r, scheduled, n_ok, n_err, n_new,
                                 self._seen_digest())
            self.next_round = r + 1
            return {"round": r, "scheduled": scheduled, "ok": n_ok,
                    "errors": n_err, "new_urls": n_new}
        finally:
            fetched.unpersist()

    def _seen_digest(self) -> str:
        """Cheap order-insensitive digest of url_seen for lineage audit."""
        row = self.url_seen.read().agg(
            F.expr("bit_xor(url_hash)").alias("s"), F.count("*").alias("n")
        ).collect()[0]
        return hashlib.sha256(f"{row['s']}|{row['n']}".encode()).hexdigest()[:16]

    def run(self, n_rounds: int) -> list[dict]:
        return [self.run_round() for _ in range(n_rounds)]
