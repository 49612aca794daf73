"""Pure-Python reference oracle: replays the reference crawler's
semantics serially over the synthetic site graph.

Encodes, in one readable loop, exactly the semantics SURVEY.md §2
attributes to the reference:

* sort by priority desc with stable URL tiebreak — the reference's
  newest-first sort (``news.py:151-152``, L1) with a deterministic
  tiebreak so a parallel engine can match it;
* first-wins ordered dedup + per-host budget cap (``news.py:154-163``,
  D1/L2/L4);
* cross-run URL-seen anti-join on SHA-256 keys (``scheduler.py:42-89``,
  D2/P9/J1);
* per-host politeness budget (``news.py:134-135``, T3) enforced at
  selection time;
* robots gating (north_rule) at selection time;
* retry with bounded attempts for 503/timeout, errors never silently
  dropped (``utils/retry.py:29-77`` T4, ``news.py:136-138`` T5);
* span-sequence parse equality (``news.py:98-122``, input_hint).

The Spark engine (news_crawler_spark.crawl) must reproduce this
oracle's crawl log (round, host, per-host seq, url), URL-seen set and
per-doc span sequences bit-for-bit. The oracle is O(n) serial Python —
fine for fixtures, which is its only job.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from dataclasses import dataclass, field

from news_crawler_spark.fixtures.sitegen import (
    EXCLUDED_HOST,
    SiteConfig,
    host_rows,
    resolve_ref,
    seed_rows,
    synth_page,
    url_priority,
)


def sha_url(url: str) -> str:
    return hashlib.sha256(url.encode()).hexdigest()


@dataclass
class PendingEntry:
    priority: float
    discovered_round: int
    attempt: int
    not_before: int


@dataclass
class OracleResult:
    crawl_log: list[tuple[int, str, int, str]]  # (round, host, seq, url)
    url_seen: dict[str, int]                    # url -> seen_round (status 200)
    dead: dict[str, int]                        # url -> round it died
    documents: dict[str, list[tuple[str, str, str, int]]]  # url -> spans
    pending_after: dict[str, PendingEntry] = field(default_factory=dict)


def retry_gap(seed: int, url: str, attempt: int, jitter_span: int = 0) -> int:
    """Exponential backoff in round units (reference utils/retry.py:29-36):
    a slot that failed attempt ``a`` retries after 2**a rounds (gaps
    1, 2, 4, ...) plus optional deterministic seeded jitter — the exact
    twin of CrawlEngine._retry_gap_col."""
    gap = 1 << attempt
    if jitter_span > 0:
        d = hashlib.sha256(f"{seed}|{url}|retry{attempt}".encode()).hexdigest()
        gap += int(d[:15], 16) % (jitter_span + 1)
    return gap


class CrawlOracle:
    def __init__(self, cfg: SiteConfig, retry_jitter_span: int = 0):
        self.cfg = cfg
        self.hosts = {h["host"]: h for h in host_rows(cfg)}
        self.retry_jitter_span = retry_jitter_span

    def _disallowed(self, host: str, path: str) -> bool:
        h = self.hosts.get(host)
        if h is None:
            return True  # unknown hosts are never crawled
        return any(path.startswith(p) for p in h["disallow"])

    @staticmethod
    def _split(url: str) -> tuple[str, str]:
        rest = url.split("//", 1)[-1]
        host, _, path = rest.partition("/")
        return host, "/" + path

    def run(self, n_rounds: int) -> OracleResult:
        cfg = self.cfg
        pending: dict[str, PendingEntry] = {
            s["url"]: PendingEntry(s["priority"], 0, 0, 0) for s in seed_rows(cfg)
        }
        seen: dict[str, int] = {}
        dead: dict[str, int] = {}
        documents: dict[str, list] = {}
        crawl_log: list[tuple[int, str, int, str]] = []

        for r in range(n_rounds):
            # -- selection: politeness budget + robots + priority top-k --
            by_host: dict[str, list[tuple[float, str]]] = defaultdict(list)
            for url, e in pending.items():
                if e.not_before > r or url in seen or url in dead:
                    continue
                host, path = self._split(url)
                if self._disallowed(host, path):
                    continue
                by_host[host].append((e.priority, url))

            selected: list[tuple[str, int, str]] = []  # (host, seq, url)
            for host, items in by_host.items():
                items.sort(key=lambda t: (-t[0], t[1]))  # priority desc, url asc
                for seq, (_, url) in enumerate(items[: self.hosts[host]["budget"]], 1):
                    selected.append((host, seq, url))

            # -- fetch + parse + state transition ------------------------
            for host, seq, url in sorted(selected):
                crawl_log.append((r, host, seq, url))
                entry = pending.pop(url)
                page = synth_page(cfg, url)
                if page["status"] == 200:
                    seen[url] = r
                    documents[url] = page["spans"]
                    for kind, _text, ref, _off in page["spans"]:
                        if kind != "link":
                            continue
                        tgt = resolve_ref(url, ref)
                        if tgt is None or EXCLUDED_HOST in tgt:
                            continue
                        if tgt in pending or tgt in seen or tgt in dead:
                            continue  # first-wins (D1/D2)
                        pending[tgt] = PendingEntry(
                            url_priority(cfg.seed, tgt), r, 0, 0
                        )
                elif page["status"] == 404:
                    dead[url] = r
                elif entry.attempt + 1 < cfg.max_attempts:
                    pending[url] = PendingEntry(
                        entry.priority, entry.discovered_round,
                        entry.attempt + 1,
                        r + retry_gap(cfg.seed, url, entry.attempt,
                                      self.retry_jitter_span),
                    )
                else:
                    dead[url] = r

        return OracleResult(crawl_log, seen, dead, documents, pending)
