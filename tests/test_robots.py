"""robots.txt parsing + longest-match evaluation."""

from news_crawler_spark.functions.robots import is_allowed, parse_robots

ROBOTS = """
# global rules
User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /private/press/

User-agent: evilbot
Disallow: /

User-agent: news-crawler-spark
User-agent: otherbot
Disallow: /no-crawlers/
Allow:
"""


def test_specific_agent_group_wins():
    rules = parse_robots(ROBOTS, agent="news-crawler-spark")
    assert rules["disallow"] == ["/no-crawlers/"]


def test_star_fallback_and_allow():
    rules = parse_robots(ROBOTS, agent="somebody-else")
    assert rules["disallow"] == ["/private/", "/tmp"]
    assert rules["allow"] == ["/private/press/"]
    assert not is_allowed("/private/x", rules)
    assert is_allowed("/private/press/today", rules)  # longest match = Allow
    assert not is_allowed("/tmpfile", rules)  # prefix semantics
    assert is_allowed("/public", rules)


def test_blocked_agent():
    rules = parse_robots(ROBOTS, agent="evilbot-2000")
    assert rules["disallow"] == ["/"]
    assert not is_allowed("/", rules)


def test_garbage_fails_open():
    assert parse_robots("\x00\xff not robots at all")["disallow"] == []
    assert parse_robots("")["disallow"] == []
