"""robots.txt → politeness-gate rules.

The reference has no robots handling (north_rule adds it); the engine
gates selection on per-host ``disallow`` prefix arrays
(crawl/frontier.py). This module parses real robots.txt bodies for
the HTTP path — grouped user-agent records per RFC 9309 basics.

Two consumption modes:

* :func:`parse_robots`→``rules["disallow"]`` feeds the native gate
  (``exists(disallow, p -> startswith(path, p))``) — exact whenever a
  host has no Allow exemptions (the overwhelmingly common case);
* :func:`is_allowed` is the exact longest-match evaluator (Allow vs
  Disallow) for the robots-refresh UDF when exemptions exist.

Pure Python by design — it runs in the per-host robots-refresh UDF,
a designated Python island (SURVEY §2.13); per-URL evaluation stays
native.
"""

from __future__ import annotations


def parse_robots(body: str, agent: str = "news-crawler-spark") -> dict:
    """Rules for ``agent`` (most specific group; ``*`` fallback):
    ``{"disallow": [prefixes...], "allow": [prefixes...]}``.
    Unparseable input → empty rules (unknown hosts are never crawled
    anyway — the gate inner-joins the hosts table)."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[str], list[str]]] = []
    cur_agents: list[str] = []
    cur_dis: list[str] = []
    cur_allow: list[str] = []
    in_body = False

    def flush():
        nonlocal cur_agents, cur_dis, cur_allow, in_body
        if cur_agents:
            groups.append((cur_agents, cur_dis, cur_allow))
        cur_agents, cur_dis, cur_allow, in_body = [], [], [], False

    try:
        for raw in body.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            field, _, value = line.partition(":")
            field, value = field.strip().lower(), value.strip()
            if field == "user-agent":
                if in_body:
                    flush()
                cur_agents.append(value.lower())
            elif field in ("disallow", "allow"):
                in_body = True
                if value:
                    (cur_dis if field == "disallow" else cur_allow).append(value)
        flush()
    except Exception:
        return {"disallow": [], "allow": []}

    best = None  # (specificity, dis, allow); '*' scores 0
    for agents, dis, allow in groups:
        for a in agents:
            score = 0 if a == "*" else (len(a) if a in agent else None)
            if score is None:
                continue
            if best is None or score > best[0]:
                best = (score, dis, allow)
    if best is None:
        return {"disallow": [], "allow": []}
    return {"disallow": best[1], "allow": best[2]}


def is_allowed(path: str, rules: dict) -> bool:
    """Exact RFC 9309 longest-match: the longest matching rule wins;
    ties go to Allow; no match → allowed."""
    best_len, allowed = -1, True
    for p in rules.get("allow", ()):
        if path.startswith(p) and len(p) >= best_len:
            best_len, allowed = len(p), True
    for p in rules.get("disallow", ()):
        if path.startswith(p) and len(p) > best_len:
            best_len, allowed = len(p), False
    return allowed
