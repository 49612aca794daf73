"""Idempotent rule/blocklist sinks — the reference's defense outputs
re-expressed as MERGE-insert snapshot tables (SURVEY.md §2.2 K3-K7).

Reference semantics preserved:

* K3 (``suricata.py:126-195``): new IPs diffed against the existing
  rules, only novel ones appended, deterministic SIDs continuing from
  the existing count (BASE_SID + index);
* K4 (``suricata_url.py:51-102``): URLs defanged, deduped, sorted;
  host/path split into the rule template, SID base 7100000;
* K5 (``suricata_hash.py:49-89``): hashes lowercased/deduped/sorted,
  one idempotent constant rule, SID 7200000;
* K6 (``ipset.py:76-122``): dup-tolerant atomic batch — dedup upstream
  plus one snapshot commit makes the tolerance a no-op;
* K1 digest (``gmail.py:91-134``): tiny final aggregates formatted
  driver-side — engine produces the rows, formatting is presentation.

The file-reparse the reference does on every write (S6) is exactly
what MERGE INTO makes implicit: ``SnapshotTable.merge_insert``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from news_crawler_spark.functions.ioc import defang_reverse, valid_ipv4
from news_crawler_spark.functions.urlops import url_host, url_path
from news_crawler_spark.tables import SnapshotTable

BASE_SID_IP = 7_000_000
BASE_SID_URL = 7_100_000
SID_HASH = 7_200_000

RULES_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),   # normalized value
        T.StructField("sid", T.LongType(), False),
        T.StructField("rule", T.StringType(), False),
    ]
)


class RulesSink:
    """MERGE-insert rules table with deterministic, monotone SIDs.

    SID continuity (reference ``suricata.py:184-186``: new SIDs
    continue from ``len(existing)+1``) is kept by assigning
    ``max(existing sid)+row_number`` over the novel batch in a
    deterministic order (key asc).
    """

    def __init__(self, spark: SparkSession, root: str, name: str, base_sid: int):
        self.spark = spark
        self.base_sid = base_sid
        self.table = SnapshotTable(spark, root, name, RULES_SCHEMA)

    def merge(self, batch: DataFrame, rule_template: str) -> int:
        """Insert-if-absent; returns number of rules added.

        ``batch`` needs a ``key`` column (already normalized) plus any
        columns the template references via ``{col}``.

        SID numbering uses the two-phase global_row_number (range
        partitions + cumulative offsets), never a partitionBy-less
        window — a large novel batch would otherwise funnel through a
        single task. The added-row count rides the append write as an
        Observation instead of two extra table counts.
        """
        from pyspark.sql import Observation

        from news_crawler_spark.operators.topk import global_row_number

        existing = self.table.read()
        max_sid = existing.agg(F.coalesce(F.max("sid"), F.lit(self.base_sid))
                               .alias("m")).collect()[0]["m"]
        novel = (
            batch.dropDuplicates(["key"])
            .join(existing.select("key"), "key", "left_anti")
        )
        rules = (global_row_number(novel, "key", out_col="_rn")
                 .withColumn("sid", F.lit(max_sid) + F.col("_rn")))
        rule_col = F.format_string(
            rule_template.replace("{key}", "%s").replace("{sid}", "%d"),
            F.col("key"), F.col("sid"),
        )
        out = rules.select("key", "sid", rule_col.alias("rule"))
        obs = Observation()
        self.table.append(out.observe(obs, F.count(F.lit(1)).alias("n")))
        return int(obs.get["n"])


def block_ips(sink: RulesSink, values: DataFrame, col: str = "value") -> int:
    """K3: defang-normalize, validate (P6), drop rules for novel IPs."""
    ips = (
        values.select(defang_reverse(col).alias("key"))
        .filter(F.trim("key") != "")
        .filter(valid_ipv4(F.col("key")))
    )
    return sink.merge(ips, 'drop ip {key} any <> any any (msg:"SecBot blocked IP"; sid:{sid}; rev:1;)')


def block_urls(sink: RulesSink, values: DataFrame, col: str = "value") -> int:
    """K4: defang, dedup+sort, host/path split into the rule body."""
    urls = (
        values.select(defang_reverse(col).alias("u"))
        .filter(F.trim("u") != "")
        .select(
            F.col("u").alias("key"),
            url_host("u").alias("host"),
            url_path("u").alias("path"),
        )
        .filter(F.col("host") != "")
    )
    # template only interpolates {key}/{sid}; host/path folded into key
    # presentation the same way suricata_url.py:89-95 builds content:
    keyed = urls.select(
        F.concat(F.col("host"), F.lit("|"), F.col("path")).alias("key"))
    return sink.merge(
        keyed,
        'drop http any any -> any any (msg:"SecBot blocked URL"; content:"{key}"; sid:{sid}; rev:1;)',
    )


def block_hashes(sink: RulesSink, values: DataFrame, col: str = "value") -> int:
    """K5: lower+trim+dedup; the one filemd5 rule is a constant-key
    MERGE (D6) the RulesSink dedup gives for free."""
    hashes = (
        values.select(F.lower(F.trim(F.col(col))).alias("key"))
        .filter(F.col("key").rlike("^[a-f0-9]{32}$|^[a-f0-9]{40}$|^[a-f0-9]{64}$"))
    )
    return sink.merge(hashes, '# hashlist entry {key} (sid:{sid})')


def ipset_batch(values: DataFrame, col: str = "value") -> DataFrame:
    """K6: the atomic dedup'd batch (`ipset restore -!` analog) — one
    deduplicated DataFrame committed as one snapshot by the caller."""
    return (
        values.select(defang_reverse(col).alias("ip"))
        .filter(F.trim("ip") != "")
        .filter(valid_ipv4(F.col("ip")))
        .dropDuplicates(["ip"])
    )


def digest_rows(news: DataFrame, iocs: DataFrame) -> DataFrame:
    """K1/P4: the mail digest's data plane — markdown item lines plus
    per-kind counts (``gmail.py:116-130``), as rows. SMTP is out of
    engine scope (presentation boundary)."""
    lines = news.select(
        F.lit("item").alias("section"),
        F.format_string("- [%s](%s)", F.col("title"), F.col("url")).alias("line"),
    )
    counts = iocs.groupBy("kind").agg(F.count("*").alias("n")).select(
        F.lit("count").alias("section"),
        F.format_string("%s: %d", F.col("kind"), F.col("n")).alias("line"),
    )
    return lines.unionByName(counts)
