"""Deterministic synthetic site graph — the fixture "web".

Models the intent of the reference's canned-payload tests
(reference ``src/tests/test_fetchers.py:22-49``: feed a known page,
assert exact parsed titles/links/dates) at graph scale: every page is
a *pure function* of ``(seed, url)``, so the Spark fetch UDF and the
pure-Python oracle observe byte-identical content with no shared
lookup table — which is also what makes the fixture scale to any
frontier size without materializing the web.

Page content is an ordered span sequence
``(kind, text, media_ref, offset)`` per the BASELINE input_hint,
mirroring the reference's ordered BeautifulSoup traversal
(``news.py:98-122``, ``asec.py:97-105``). Spans include defanged IOC
text (exercises X1/P5), keyword-bearing titles (F3), Korean-format
dates (P1), relative links (P10), and links to excluded hosts (F4).

Zipf-ish host sizing makes host 0 hot, exercising salted-key
skew handling (SURVEY.md §4).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from datetime import datetime, timedelta

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu breach patch botnet kernel zero trust vector payload"
).split()

# keyword list models the reference's 28-term Korean/English filter
# (reference news.py:38-68)
KEYWORDS = ["해킹", "랜섬웨어", "XSS", "취약점", "malware", "phishing", "exploit", "breach"]

DEFANGED_IOCS = [
    "185[.]220[.]101[.]5",
    "45[.]33[.]12[.]8",
    "hxxps[:]//evil-cdn.example/drop.bin",
    "https[:]//bad.example/p?x=1",
    "d41d8cd98f00b204e9800998ecf8427e",  # md5
    "da39a3ee5e6b4b0d3255bfef95601890afd80709",  # sha1
]

EXCLUDED_HOST = "excluded.test"  # F4 domain-exclusion target
BASE_DATE = datetime(2025, 6, 1)


@dataclass(frozen=True)
class SiteConfig:
    seed: int = 42
    n_hosts: int = 8
    base_pages: int = 40          # pages on a normal host
    hot_factor: int = 6           # host 0 has base_pages * hot_factor pages
    out_links: int = 4            # outlinks per page (upper bound)
    n_seeds: int = 4              # seed list length (one per host)
    max_attempts: int = 3
    budgets: tuple[int, ...] = (3, 5, 4, 6)   # round-robin per host index
    richness: int = 1             # text-span multiplier: ~1 KB pages at 1;
                                  # real news pages are 50-500 KB, so the
                                  # throughput bench uses a higher value

    def pages_on(self, host_idx: int) -> int:
        return self.base_pages * (self.hot_factor if host_idx == 0 else 1)

    def host_name(self, host_idx: int) -> str:
        return f"h{host_idx:04d}.test"

    def page_url(self, host_idx: int, page_idx: int) -> str:
        return f"http://{self.host_name(host_idx)}/p{page_idx}"


def _h(cfg_seed: int, url: str, what: str) -> int:
    """Deterministic 64-bit draw for (seed, url, purpose)."""
    d = hashlib.sha256(f"{cfg_seed}|{url}|{what}".encode()).digest()
    return int.from_bytes(d[:8], "big")


def url_priority(cfg_seed: int, url: str) -> float:
    """Freshness-ish priority of a discovered URL in [0, 1).

    Domain is the first 15 hex chars (60 bits) of the sha256 so the
    Spark twin (crawl.engine.url_priority_col) stays in long
    arithmetic — a decimal(20,0) path for the full 64 bits measurably
    drags at millions of candidate rows per round.
    """
    d = hashlib.sha256(f"{cfg_seed}|{url}|prio".encode()).hexdigest()
    return (int(d[:15], 16) % 100_000) / 100_000.0


def synth_page(cfg: SiteConfig, url: str) -> dict:
    """The synthetic web: page content as a pure function of the URL.

    Returns ``{status, fetch_ms, title, published, spans}`` with spans
    ``[(kind, text, media_ref, offset), ...]``.
    """
    h = _h(cfg.seed, url, "page")
    status_roll = h % 100
    if status_roll < 85:
        status = 200
    elif status_roll < 92:
        status = 404
    elif status_roll < 97:
        status = 503
    else:
        status = -1  # timeout

    # host/page coordinates (urls outside the universe are always 404)
    host = url.split("//", 1)[-1].split("/", 1)[0]
    try:
        host_idx = int(host[1:5]) if host.startswith("h") and host.endswith(".test") else -1
        page_idx = int(url.rsplit("/p", 1)[1])
    except (ValueError, IndexError):
        host_idx, page_idx = -1, -1
    if host_idx < 0 or host_idx >= cfg.n_hosts or page_idx < 0 or page_idx >= cfg.pages_on(host_idx):
        return {"status": 404, "fetch_ms": 5, "title": "", "published": None, "spans": []}

    fetch_ms = 10 + (h >> 8) % 200

    title_words = [WORDS[(h >> (4 * i)) % len(WORDS)] for i in range(4)]
    if (h >> 16) % 2 == 0:
        title_words.insert((h >> 20) % 4, KEYWORDS[(h >> 24) % len(KEYWORDS)])
    title = " ".join(title_words)

    published = None if (h >> 28) % 20 == 0 else BASE_DATE + timedelta(
        days=(h >> 32) % 30, hours=(h >> 37) % 24
    )

    spans: list[tuple[str, str, str, int]] = []
    offset = 0
    spans.append(("title", title, "", offset))
    offset += 1
    if published is not None:
        # Korean-format date string, the reference's parse target (news.py:116-121)
        kdate = f"{published.year}년 {published.month:02d}월 {published.day:02d}일 {published.hour:02d}:00"
        spans.append(("date", kdate, "", offset))
        offset += 1

    n_text = (2 + (h >> 40) % 4) * cfg.richness
    for i in range(n_text):
        th = _h(cfg.seed, url, f"text{i}")
        words = [WORDS[(th >> (5 * j)) % len(WORDS)] for j in range(6)]
        if th % 10 == 0:  # ~10% of text spans carry a defanged IOC (X1/P5)
            words.insert(3, DEFANGED_IOCS[(th >> 30) % len(DEFANGED_IOCS)])
        spans.append(("text", " ".join(words), "", offset))
        offset += 1
        if th % 7 == 0:
            spans.append(("media", "", f"http://{host}/img{(th >> 33) % 50}.png", offset))
            offset += 1

    # outlinks (kind='link'), deterministic targets
    n_links = 1 + (h >> 45) % cfg.out_links
    for k in range(n_links):
        lh = _h(cfg.seed, url, f"link{k}")
        roll = lh % 100
        if roll < 60:  # same-host absolute-path (relative) link — exercises P10
            # max(1, ...): a 1-page host would otherwise divide by zero
            tgt_page = (page_idx + 1 + (lh >> 8) % max(1, cfg.pages_on(host_idx) - 1)) % cfg.pages_on(host_idx)
            ref = f"/p{tgt_page}"
        elif roll < 90:  # cross-host absolute link
            tgt_host = (host_idx + 1 + (lh >> 8) % max(1, cfg.n_hosts - 1)) % cfg.n_hosts
            tgt_page = (lh >> 24) % cfg.pages_on(tgt_host)
            ref = cfg.page_url(tgt_host, tgt_page)
        elif roll < 95:  # excluded-domain link — exercises F4
            ref = f"http://{EXCLUDED_HOST}/x{(lh >> 8) % 10}"
        else:  # off-universe link (ftp/mailto) — exercises scheme filter F5/F6
            ref = f"mailto:abuse@{host}"
        anchor = WORDS[(lh >> 50) % len(WORDS)]
        spans.append(("link", anchor, ref, offset))
        offset += 1

    return {"status": status, "fetch_ms": fetch_ms, "title": title,
            "published": published, "spans": spans}


_HTML_KIND_RENDER = {
    "title": lambda t, m: f"<title>{t}</title>",
    "date": lambda t, m: f'<time datetime="{t}"></time>',
    "text": lambda t, m: f"<p>{t}</p>",
    "link": lambda t, m: f'<a href="{m}">{t}</a>',
    "media": lambda t, m: f'<img src="{m}" alt="{t}">',
}


def synth_html(cfg: SiteConfig, url: str) -> tuple[dict, str]:
    """Render the synthetic page as real HTML.

    Returns (page_dict, html). ``html_to_spans(html)`` reconstructs the
    page's span sequence exactly (round-trip verified in the e2e
    tests), so the fetch path can exercise the real parser at a
    realistic per-page cost instead of short-circuiting to spans.
    """
    page = synth_page(cfg, url)
    body = "\n  ".join(
        _HTML_KIND_RENDER[k](t, m) for (k, t, m, _off) in page["spans"]
    )
    html = (
        "<!DOCTYPE html>\n<html>\n<head>\n"
        '<meta charset="utf-8">\n'
        f'<!-- synthetic fixture page for {url} -->\n'
        "</head>\n<body>\n  " + body + "\n</body>\n</html>\n"
    )
    return page, html


def resolve_ref(page_url: str, ref: str) -> str | None:
    """Absolute-path / absolute-URL resolution (P10), engine+oracle shared rule.

    Returns None for refs outside http(s) (F5/F6 validity filter).
    """
    if ref.startswith("http://") or ref.startswith("https://"):
        return ref
    if ref.startswith("/"):
        scheme_host = page_url.split("/", 3)
        return f"{scheme_host[0]}//{scheme_host[2]}{ref}"
    return None


def robots_disallow(cfg: SiteConfig, host_idx: int) -> list[str]:
    """Deterministic per-host robots Disallow path prefixes."""
    if host_idx % 3 == 1:
        return [f"/p{1 + host_idx % 3}"]  # prefix: blocks /p1, /p1x, /p1xx...
    if host_idx % 3 == 2:
        return ["/admin", f"/p{2 + host_idx % 5}"]
    return []


def host_rows(cfg: SiteConfig) -> list[dict]:
    return [
        {
            "host": cfg.host_name(i),
            "crawl_delay": 1.0,
            "budget": cfg.budgets[i % len(cfg.budgets)],
            "disallow": robots_disallow(cfg, i),
        }
        for i in range(cfg.n_hosts)
    ]


def seed_rows(cfg: SiteConfig) -> list[dict]:
    """Seed list: page 0 of the first n_seeds hosts, priority 1.0."""
    return [
        {"url": cfg.page_url(i, 0), "priority": 1.0}
        for i in range(min(cfg.n_seeds, cfg.n_hosts))
    ]
