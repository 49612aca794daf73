"""robots.txt parsing: raw policy bodies → the HOSTS gating table.

The engine gates selection on a (host, crawl_delay, budget, disallow)
table (schemas.HOSTS; crawl/frontier.py select_candidates). This
module closes the loop the north rule describes: fetch each host's
``/robots.txt`` once per epoch, parse ALL of them in one distributed
pass, and emit that table — no Python on the data plane (the
reference-adjacent ``urllib.robotparser`` is a serial per-host loop).

Grammar subset (robotstxt.org): ``#`` comments; group = consecutive
``User-agent:`` lines followed by rule lines; ``Disallow:`` path
prefixes (empty value = allow all, contributes no rule);
``Crawl-delay:`` seconds. A group applies if any of its user-agents
is ``*`` or equals the caller's agent (case-insensitive). Multiple
applicable groups union their disallows and take the MIN crawl-delay
(most conservative).

Shape: one body is one row; lines explode once (Generate), the group
id is a running sum over a per-host window (parallel across hosts —
robots bodies for 10^7 hosts are 10^7 independent partitionable
units), rules aggregate back to one row per host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(df: DataFrame, body_col: str = "body",
                 host_col: str = "host", agent: str = "*") -> DataFrame:
    """(host, crawl_delay, disallow) from raw robots.txt bodies.

    ``crawl_delay`` is null when unspecified; ``disallow`` is a
    sorted-distinct array of path prefixes from every group matching
    ``agent`` (or ``*``). Hosts whose body has no applicable group
    yield an empty array (allow-all)."""
    agent_lc = agent.lower()
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("_pos", "_raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("_raw"), "#.*$", ""))
    parsed = lines.select(
        "host", "_pos",
        F.lower(F.regexp_extract(clean, r"^([A-Za-z-]+)\s*:", 1)).alias("_k"),
        F.trim(F.regexp_extract(clean, r"^[A-Za-z-]+\s*:\s*(.*)$", 1)).alias("_v"),
    ).filter(F.col("_k") != "")
    w = Window.partitionBy("host").orderBy("_pos")
    is_ua = F.col("_k") == "user-agent"
    group_start = is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))
    grouped = parsed.withColumn(
        "_grp",
        F.sum(group_start.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_group = grouped.groupBy("host", "_grp").agg(
        F.max(
            is_ua & ((F.lower(F.col("_v")) == agent_lc)
                     | (F.col("_v") == "*"))
        ).alias("_applies"),
        F.array_sort(F.array_distinct(F.collect_list(
            F.when((F.col("_k") == "disallow") & (F.col("_v") != ""),
                   F.col("_v"))))).alias("_dis"),
        F.min(F.when(F.col("_k") == "crawl-delay",
                     F.col("_v").try_cast("double"))).alias("_cd"),
    )
    # host universe from the INPUT (a comments-only body must still
    # yield an allow-all row, and its lines never survive the parse)
    return (
        df.select(F.col(host_col).alias("host")).dropDuplicates()
        .join(per_group.filter("_applies"), "host", "left")
        .groupBy("host").agg(
            F.min("_cd").alias("crawl_delay"),
            F.array_sort(F.array_distinct(
                F.flatten(F.collect_list("_dis")))).alias("disallow"),
        )
    )


def robots_to_hosts(parsed: DataFrame, budget: int,
                    default_delay: float = 1.0) -> DataFrame:
    """Project parse_robots output into the schemas.HOSTS gating table
    (the CrawlEngine ``hosts`` input contract)."""
    return parsed.select(
        "host",
        F.coalesce("crawl_delay", F.lit(default_delay)).alias("crawl_delay"),
        F.lit(budget).alias("budget"),
        F.coalesce("disallow", F.array().cast("array<string>")).alias("disallow"),
    )
