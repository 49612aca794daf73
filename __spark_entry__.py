"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator family from
SURVEY.md §2 (or a training-data pipeline op), expressed through the
engine's public modules; ``oracle_sql()`` holds the DuckDB-checkable
ANSI equivalent. Aggregates are rounded on BOTH sides where floating
point could differ in the last ulp.

Span-sequence / crawl-order / URL-seen invariants (the BASELINE
metrics) are verified against the pure-Python reference oracle in
``tests/test_crawl_e2e.py`` — a *stronger* check than SQL. Every
queries() entry, including the near-dup family (whose hashes are
sha256-substring-derived in both engines), carries a value-exact
DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_crawler_spark.functions import (
    defang_reverse,
    extract_iocs_long,
    fingerprint,
    quality_score,
    token_count,
    url_host,
    url_path,
    url_query,
    valid_ipv4,
)
from news_crawler_spark.functions.textstats import punct_ratio
from news_crawler_spark.operators import (
    cosine_topk_bruteforce,
    exact_dedup,
    first_wins_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_buckets,
    top_k_global,
    top_k_per_group,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship: a frontier-selection + content-analytics DAG over sf0.001
# ---------------------------------------------------------------------------

def _synth_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic frontier synthesized from the documents table:
    one URL per doc, host = source, priority = hash-derived."""
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("http://"), F.col("source"), F.lit(".test/d"),
                   F.col("doc_id").cast("string"))
    return docs.select(
        url.alias("url"),
        F.col("source").alias("host"),
        (F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(100000)).cast("double")
         / F.lit(100000.0)).alias("priority"),
        F.col("doc_id"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: frontier top-k selection (L4) + seen anti-join (D2/J1)
    + sha keys (P9) over sf0.001 — the round-selection core of the
    crawl engine on the driver's smoke tables."""
    sf_dir = "/root/testdata/sf0.001"
    frontier = _synth_frontier(spark, sf_dir)
    seen = frontier.filter(F.pmod(F.col("doc_id"), F.lit(7)) == 0).select("url")
    pending = frontier.join(seen, "url", "left_anti")
    selected = top_k_per_group(
        pending, ["host"], [F.col("priority").desc(), F.col("url").asc()], k=5,
        rank_col="seq",
    )
    return selected.select(
        "host", "seq", "url",
        F.sha2(F.col("url"), 256).alias("url_sha"),
        F.round("priority", 5).alias("priority"),
    ).orderBy("host", "seq")


# ---------------------------------------------------------------------------
# gate-checked queries
# ---------------------------------------------------------------------------

def q_f1_date_range_filter(spark, sf_dir):
    """F1/F2: date-window predicate (reference news.py:141-142)."""
    return (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01"))
        .select("o_orderkey", "o_custkey", "o_totalprice",
                F.col("o_orderdate").cast("date").alias("o_date"))
    )


def q_f3_keyword_filter(spark, sf_dir):
    """F3: keyword any-match via rlike (reference news.py:144-149)."""
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.lower(F.col("text")).rlike("(query|join|window)"))
        .select("doc_id", "lang", "source")
    )


def q_f4_exclusion_filter(spark, sf_dir):
    """F4: domain/segment exclusion set + containment (asec.py:107-120)."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(~F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .filter(~F.col("c_name").contains("00"))
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def q_f6_validity_filter(spark, sf_dir):
    """F5/F6: non-empty / non-null validity predicates."""
    return (
        _t(spark, sf_dir, "events")
        .filter((F.trim(F.col("event_type")) != "") & F.col("value").isNotNull()
                & (F.col("value") >= 0))
        .groupBy("event_type").agg(F.count("*").alias("n"))
    )


def q_p5_defang_normalize(spark, sf_dir):
    """P5: defang reversal [.]→. [:]→: (main.py:38-42) on synthesized
    defanged strings."""
    df = _t(spark, sf_dir, "documents")
    defanged = F.concat(F.col("source"), F.lit("[.]test[:]8080/"), F.col("lang"))
    return df.select("doc_id", defang_reverse(defanged).alias("normalized"))


def q_p6_ip_validation(spark, sf_dir):
    """P6: dotted-quad construction + validity filter (suricata.py:113-123).
    Octets >255 occur and must be rejected."""
    ev = _t(spark, sf_dir, "events")
    cand = F.concat_ws(
        ".",
        F.pmod(F.col("event_id"), F.lit(300)).cast("string"),
        F.pmod(F.col("user_id"), F.lit(300)).cast("string"),
        F.pmod(F.floor("value").cast("long"), F.lit(300)).cast("string"),
        F.lit("7"),
    )
    return (
        ev.select(F.col("event_id"), cand.alias("ip"))
        .filter(valid_ipv4(F.col("ip")))
    )


def q_p7_url_split(spark, sf_dir):
    """P7: host/path/query split (suricata_url.py:85-88) on synthesized URLs."""
    df = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("http://"), F.col("source"), F.lit(".test/docs/"),
                   F.col("lang"), F.lit("?id="), F.col("doc_id").cast("string"))
    return df.select(
        "doc_id",
        url_host(url).alias("host"),
        url_path(url).alias("path"),
        url_query(url).alias("query"),
    )


def q_p9_sha2_key(spark, sf_dir):
    """P9: SHA-256 dedup key over concat (scheduler.py:52-53)."""
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.sha2(F.concat(F.col("c_name"), F.lit("|"), F.col("c_custkey").cast("string")), 256)
        .alias("key_hash"),
    )


def q_x1_ioc_extract_defanged(spark, sf_dir):
    """X1/X2/P5/D3: regex IOC findall + defang + set-dedup (asec.py:44-83)
    over synthesized defanged text with per-row variance."""
    ev = _t(spark, sf_dir, "events")
    text = F.concat(
        F.lit("beacon to 10[.]0[.]"),
        F.pmod(F.col("event_id"), F.lit(256)).cast("string"),
        F.lit("[.]"),
        F.pmod(F.col("user_id"), F.lit(256)).cast("string"),
        F.lit(" via hxxps[:]//c2-"),
        F.col("event_type"),
        F.lit(".example/x plus junk 999.999.999.999x"),
    )
    docs = ev.select(F.col("event_id").cast("string").alias("doc_id"), text.alias("text"))
    return extract_iocs_long(docs).select("doc_id", "kind", "value")


def q_x1b_ioc_canonical(spark, sf_dir):
    """X1 canonical set (reference parsers/ioc.py:34-53): strict IPv4
    octets, port-aware case-insensitive URLs, NO defanging. The text
    plants the cases where the two pattern sets diverge: ip:port
    (ip extracted, port dropped), 999.x octets (rejected here, caught
    by the loose asec set), defanged forms (ignored here), a URL with
    an explicit port, and 64/32-hex hashes."""
    from news_crawler_spark.functions import extract_iocs_canonical_long

    ev = _t(spark, sf_dir, "events")
    text = F.concat(
        F.lit("conn from 10.0."),
        F.pmod(F.col("event_id"), F.lit(256)).cast("string"),
        F.lit("."),
        F.pmod(F.col("user_id"), F.lit(256)).cast("string"),
        F.lit(":"),
        (F.lit(1024) + F.pmod(F.col("event_id"), F.lit(40000))).cast("string"),
        F.lit(" bad 999.1.2.3 defanged 1[.]2[.]3[.]4 via HTTP://C2-"),
        F.col("event_type"),
        F.lit(".example:8443/p?x=1 drop "),
        F.sha2(F.col("event_type"), 256),
        F.lit(" md5 "),
        F.substring(F.sha2(F.concat(F.lit("m"), F.col("event_type")), 256), 1, 32),
        F.lit(" end"),
    )
    docs = ev.select(F.col("event_id").cast("string").alias("doc_id"),
                     text.alias("text"))
    return extract_iocs_canonical_long(docs).select("doc_id", "kind", "value")


def q_ioc_pattern_diff(spark, sf_dir):
    """First-class contract demo of the reference's DELIBERATE pattern
    drift between its two IOC extractors (asec.py:44-53 loose set vs
    parsers/ioc.py:34-53 canonical set): run BOTH over the same
    corpus text and return the symmetric difference per kind.

    Text = real documents.text plus planted drift cases derived from
    doc_id/lang: a defanged IP (loose-only after defang-reversal), a
    999.x octet (loose-only — canonical's strict octets reject it), a
    defanged hxxps URL (loose-only), and an UPPERCASE-scheme URL
    (canonical-only — its (?i) flag vs the loose set's literal 'h').
    Values both sets agree on (e.g. a plain ip or a lowercase ip:port's
    host) cancel out of the diff.

    Scale shape: two regexp_extract_all scans (codegen, one pass each)
    + set-difference shuffles on (doc_id, kind, value) — no joins wider
    than the extracted-IOC table itself."""
    docs = _t(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" ping 172[.]16[.]"),
        F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
        F.lit("[.]9 bad 999.88."),
        F.pmod(F.col("doc_id"), F.lit(100)).cast("string"),
        F.lit(".1 up HTTPS://Cdn-"),
        F.col("lang"),
        F.lit(".example:8443/a?q=2 mixed hxxps[:]//c2-"),
        F.col("lang"),
        F.lit(".example/x shared 10.0."),
        F.pmod(F.col("doc_id"), F.lit(199)).cast("string"),
        F.lit(".7 tail"),
    )
    d = docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                    planted.alias("text"))
    from news_crawler_spark.functions import extract_iocs_canonical_long

    loose = extract_iocs_long(d)
    canon = extract_iocs_canonical_long(d)
    return (
        loose.subtract(canon).withColumn("only_in", F.lit("loose"))
        .unionByName(
            canon.subtract(loose).withColumn("only_in", F.lit("canonical")))
    )


def q_x2_word_extract_explode(spark, sf_dir):
    """X2: findall + explode + distinct over real text."""
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id",
                F.explode(F.regexp_extract_all(F.col("text"), F.lit("[a-z]{8,}"), 0))
                .alias("word"))
        .dropDuplicates(["doc_id", "word"])
    )


def q_d1_first_wins_dedup(spark, sf_dir):
    """D1: order-stable first-wins dedup (news.py:154-163)."""
    ev = _t(spark, sf_dir, "events")
    return first_wins_dedup(
        ev, ["user_id", "event_type"], [F.col("ts").asc(), F.col("event_id").asc()]
    ).select("user_id", "event_type", "event_id", F.round("value", 2).alias("value"))


def q_l4_topk_per_group(spark, sf_dir):
    """L4: priority top-k per group (the politeness-budget selection shape)."""
    ev = _t(spark, sf_dir, "events")
    return top_k_per_group(
        ev, ["user_id"], [F.col("value").desc(), F.col("event_id").asc()], k=3
    ).select("user_id", "event_id", F.round("value", 2).alias("value"), "rnk")


def q_frontier_topk_selection(spark, sf_dir):
    """The crawl round-selection core (L4+J1): synthesized frontier,
    seen-set anti-join, per-host budget top-k with stable tiebreaks."""
    frontier = _synth_frontier(spark, sf_dir)
    seen = frontier.filter(F.pmod(F.col("doc_id"), F.lit(7)) == 0).select("url")
    pending = frontier.join(seen, "url", "left_anti")
    return top_k_per_group(
        pending, ["host"], [F.col("priority").desc(), F.col("url").asc()], k=5,
        rank_col="seq",
    ).select("host", "seq", "url", F.round("priority", 5).alias("priority"))


def q_j1_antijoin(spark, sf_dir):
    """J1/D2: left anti join — the URL-seen membership shape."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders.select(F.col("o_custkey").alias("c_custkey")),
                     "c_custkey", "left_anti").select("c_custkey", "c_name")


def q_j2_semijoin(spark, sf_dir):
    """J2: left semi join — keyword/membership match."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big.select(F.col("o_custkey").alias("c_custkey")),
                     "c_custkey", "left_semi").select("c_custkey", "c_acctbal")


def q_u2_union_distinct(spark, sf_dir):
    """U1/U2: union + distinct (multi-feed merge, news.py:132-138)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.union(b).distinct()


def q_u3_except(spark, sf_dir):
    """U3: difference (suricata_url.py:76 novel-only filter)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.subtract(b)


def q_u4_intersect(spark, sf_dir):
    """Intersect (SURVEY §2.10 'absent in reference' row)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


def q_l1_sort_limit(spark, sf_dir):
    """L1/L2: global top-k = TakeOrderedAndProject, stable tiebreak."""
    return top_k_global(
        _t(spark, sf_dir, "orders"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 100,
    ).select("o_orderkey", "o_totalprice")


def q_a1_counts_per_kind(spark, sf_dir):
    """A1: count per kind (gmail.py:120-130) + distinct users."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users"))
    )


def q_a2_group_metrics(spark, sf_dir):
    """A2: per-group merge metrics (asec.py:134-148 analog)."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_chars").alias("total_chars"),
             F.round(F.avg("n_chars"), 2).alias("avg_chars"))
    )


def q_agg_rollup(spark, sf_dir):
    """Rollup aggregate (Catalyst-provided; SURVEY §2.8 'absent' row)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.count("*").alias("n"))
    )


def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 shape: the headline scan→filter→agg pipeline."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_w_running_sum(spark, sf_dir):
    """Windowed running aggregate per user (stateful analytics shape)."""
    w = (Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id",
                F.round(F.sum("value").over(w), 2).alias("running_value"))
    )


def q_dt_trunc_month(spark, sf_dir):
    """Date bucketing (T1 daily-window analog at month grain)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"))
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


def q_json_extract(spark, sf_dir):
    """JSON field extraction from the events props column."""
    return (
        _t(spark, sf_dir, "events")
        .select(F.get_json_object("props", "$.k").alias("k_val"))
        .groupBy("k_val").agg(F.count("*").alias("n"))
    )


def q_dedup_exact(spark, sf_dir):
    """Exact dedup via normalized-text fingerprint (training-data op)."""
    return exact_dedup(_t(spark, sf_dir, "documents"))


def q_text_stats(spark, sf_dir):
    """Token count + punctuation ratio + quality score per doc."""
    df = _t(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.round(punct_ratio("text"), 4).alias("punct_ratio"),
        quality_score("text").alias("quality"),
    )


def q_quality_repetition(spark, sf_dir):
    """Gopher/RefinedWeb repetition quality signal per document:
    duplicate-word and duplicate-3gram fractions (boilerplate and
    keyword stuffing are repetitive). operators/quality.py
    repetition_profile — one Generate + one multi-distinct groupBy."""
    from news_crawler_spark.operators import repetition_profile

    return repetition_profile(_t(spark, sf_dir, "documents"))


def q_tfidf_bm25(spark, sf_dir):
    """Okapi BM25 lexical ranking: top-5 terms per document by BM25
    score (tf / df / dl / corpus-avg dl all computed distributed; the
    1-row corpus constants broadcast back). Ranking orders by the
    ROUNDED score with a term tiebreak so the DuckDB oracle replays
    it deterministically."""
    from news_crawler_spark.operators import bm25_scores

    scored = bm25_scores(_t(spark, sf_dir, "documents"))
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )


def q_url_normalize(spark, sf_dir):
    """Frontier-dedup URL canonicalization (functions/urlops.py
    url_normalize): lowercase scheme/host, default port stripped,
    fragment dropped, tracking params removed, surviving params
    sorted. The synthesized URLs plant every rule: mixed-case
    scheme+host, :80 and :8080 ports, utm_*/gclid params out of
    order, and a fragment."""
    from news_crawler_spark.functions import url_normalize

    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTP://WWW."), F.col("source"),
        F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0, ".Example.COM:80")
        .otherwise(".example.com:8080"),
        F.lit("/Docs/"), F.col("lang"),
        F.lit("?utm_source=feed&z="), F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
        F.lit("&a=1&gclid=xyz&m="), F.pmod(F.col("doc_id"), F.lit(5)).cast("string"),
        F.lit("#frag"),
    )
    return docs.select("doc_id", url.alias("url"),
                       url_normalize(url).alias("norm"))


def _interleaved_spans(docs):
    """Deterministic interleaved text+media spans table — the
    north-rule input shape (doc_id, spans:array<struct<kind,text,
    media_ref,offset>>) — built from documents.text: 10-token chunks;
    every 3rd span is media with a derived media_ref, every 7th a
    link. The spans array is materialized behind a Generate barrier
    (explode of a 1-element array) so its construction runs once per
    doc, not once per consuming expression (CollapseProject re-inlines
    staged projections)."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    staged = docs.select(
        "doc_id", F.explode(F.array(toks)).alias("_toks"))
    n_chunks = F.ceil(F.size("_toks") / F.lit(10.0)).cast("int")
    chunk_text = lambda j: F.concat_ws(" ", F.slice(F.col("_toks"), j * 10 + 1, 10))  # noqa: E731
    kind = lambda j: (F.when(j % 3 == 2, "media")  # noqa: E731
                      .when(j % 7 == 3, "link").otherwise("text"))
    spans = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: F.struct(
            kind(j).alias("kind"),
            F.when(j % 3 == 2, "").otherwise(chunk_text(j)).alias("text"),
            F.when(j % 3 == 2,
                   F.concat(F.lit("ref/"), F.col("doc_id").cast("string"),
                            F.lit("/"), j.cast("string")))
            .otherwise(F.lit("")).alias("media_ref"),
            j.cast("int").alias("offset"),
        ),
    )
    return staged.select(
        "doc_id", F.explode(F.array(spans)).alias("spans"))


def q_interleaved_spans_stats(spark, sf_dir):
    """The north-rule input shape, end to end: build the interleaved
    text+media document table (_interleaved_spans), then run the spans
    operators over it — per-kind counts + text length
    (operators/spanops.span_stats, no explode) and the offset-ordered
    flattened-text sha256 (flatten_text), the engine's span-sequence
    equality digest."""
    from news_crawler_spark.operators import flatten_text, span_stats

    docs = _t(spark, sf_dir, "documents")
    spans_df = _interleaved_spans(docs)
    stats = span_stats(spans_df).select(
        "doc_id",
        F.col("n_spans").cast("long").alias("n_spans"),
        F.col("n_text").cast("long").alias("n_text"),
        F.col("n_link").cast("long").alias("n_link"),
        F.col("n_media").cast("long").alias("n_media"),
        F.col("text_chars").cast("long").alias("text_chars"),
    )
    flat = flatten_text(spans_df).select(
        "doc_id", F.sha2(F.col("text"), 256).alias("flat_sha"))
    return stats.join(flat, "doc_id")


def q_spans_quality_pipeline(spark, sf_dir):
    """The interleaved text+media table as a FIRST-CLASS input to the
    training-data quality ops: build the north-rule spans shape
    (_interleaved_spans), flatten the text-bearing spans in offset
    order (operators/spanops.flatten_text — media spans drop, link/
    title text survives), and feed the flattened text to the
    Gopher-style repetition profiler (operators/quality.
    repetition_profile), keeping each doc's media-span count alongside
    — the per-doc keep/drop signal a multimodal corpus pipeline
    filters on. Docs whose spans carry no text at all flatten to NULL
    and drop out (nothing to score)."""
    from news_crawler_spark.operators import flatten_text, span_stats
    from news_crawler_spark.operators.quality import repetition_profile

    docs = _t(spark, sf_dir, "documents")
    spans_df = _interleaved_spans(docs)
    flat = flatten_text(spans_df)
    rep = repetition_profile(flat)
    media = span_stats(spans_df).select(
        "doc_id", F.col("n_media").cast("long").alias("n_media"))
    return rep.join(media, "doc_id")


def q_lm_perplexity(spark, sf_dir):
    """CCNet-style perplexity filter (operators/quality.py
    lm_cross_entropy): corpus-trained add-one bigram LM, per-doc
    average negative log-probability — the fluency score training
    pipelines band-filter on."""
    from news_crawler_spark.operators.quality import lm_cross_entropy

    return lm_cross_entropy(_t(spark, sf_dir, "documents"))


def q_gopher_gate(spark, sf_dir):
    """Composite Gopher-rules quality gate (operators/quality.py
    gopher_gate): word-count band, mean-word-length band,
    symbol-to-word ratio, alphabetic-word fraction, distinct-stopword
    floor — the keep/drop decision plus every signal it derives from,
    all rounded before thresholding so the oracle replays the decision
    bit-exactly. min_words=20 (sandbox docs are short; the rule
    thresholds are the operator's knobs, not its shape)."""
    from news_crawler_spark.operators import gopher_gate

    return gopher_gate(_t(spark, sf_dir, "documents"), min_words=20)


def q_boilerplate_lines(spark, sf_dir):
    """Cross-document boilerplate detection (operators/quality.py
    boilerplate_profile): documents are given line structure with a
    sitewide nav line (shared by ALL docs), per-source header/footer
    lines (shared by every doc of that source), and the unique body —
    lines in >= 3 distinct docs flag as boilerplate, giving each doc
    its strip fraction."""
    from news_crawler_spark.operators.quality import boilerplate_profile

    docs = _t(spark, sf_dir, "documents")
    lined = docs.select(
        "doc_id",
        F.concat(
            F.lit("head "), F.col("source"), F.lit("\nnav menu home\n"),
            F.col("text"),
            F.lit("\ncopyright "), F.col("source"),
        ).alias("text"))
    return boilerplate_profile(lined, min_docs=3)


def q_doc_chunking(spark, sf_dir):
    """Training-window chunking: each document's tokens split into
    overlapping windows (size 64, stride 48 — the 16-token overlap
    keeps context across window boundaries), emitting one row per
    chunk with its token count and content sha256. The token array is
    staged behind a Generate barrier so the split runs once per doc,
    not once per chunk (CollapseProject re-inlines staged
    projections)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    staged = docs.select("doc_id", F.explode(F.array(toks)).alias("_toks"))
    n = F.size("_toks")
    n_chunks = F.ceil(n / F.lit(48.0)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: F.array_join(F.slice(F.col("_toks"), j * 48 + 1, 64), " "))
    return (
        staged.select("doc_id", n.alias("_n"),
                      F.posexplode(chunks).alias("chunk_idx", "_chunk"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.least(F.lit(64), F.col("_n") - F.col("chunk_idx") * 48)
            .cast("long").alias("n_tokens"),
            F.sha2(F.col("_chunk"), 256).alias("chunk_sha"),
        )
    )


def q_decontamination(spark, sf_dir):
    """Eval-benchmark decontamination (operators/quality.py
    contamination_overlap): the benchmark set is a 15-token excerpt of
    every 50th corpus doc, so those docs MUST flag contaminated while
    the rest stay clean — per-doc 5-gram overlap counts + fraction."""
    from news_crawler_spark.operators.quality import contamination_overlap

    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    bench = (docs.filter(F.pmod(F.col("doc_id"), F.lit(50)) == 0)
             .select((F.col("doc_id") + 100000).alias("doc_id"),
                     F.array_join(F.slice(toks, 6, 15), " ").alias("text")))
    return contamination_overlap(docs, bench, gram_n=5)


def q_bloom_decontamination(spark, sf_dir):
    """Bloom-filter decontamination (operators/quality.py
    bloom_contamination) — contamination_overlap's scale path: the
    SAME benchmark fixture (15-token excerpts of every 50th doc) folds
    into a 2^16-bit Bloom mask that enters the corpus scan as one
    1024-long literal array; the corpus pass is Project/Generate + one
    per-doc groupBy, zero joins, and the sha256 double-hashed bit
    positions replay in SQL so the oracle rebuilds the identical mask
    and per-gram verdicts. No false negatives (flagged ⊇ the exact
    check's hits — property-tested), FPs at the standard Bloom rate."""
    from news_crawler_spark.operators.quality import bloom_contamination

    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    bench = (docs.filter(F.pmod(F.col("doc_id"), F.lit(50)) == 0)
             .select((F.col("doc_id") + 100000).alias("doc_id"),
                     F.array_join(F.slice(toks, 6, 15), " ").alias("text")))
    return bloom_contamination(docs, bench, gram_n=5,
                               m_bits=1 << 16, k_hashes=2)


def q_pii_redact(spark, sf_dir):
    """PII scrubbing (functions/pii.py): corpus text with planted
    email / card / IP / phone identifiers is redacted to typed
    placeholders in precedence order (cards before phones — a 16-digit
    run must not be half-eaten), and per-kind counts are taken at each
    rule's point in the chain. Output is the redacted-text sha256 +
    counts, all scalars, every regex replayed by the oracle."""
    from news_crawler_spark.functions.pii import pii_counts, pii_redact

    docs = _t(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact u"), F.col("doc_id").cast("string"),
        F.lit("@ex"), F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
        F.lit(".org card 4111 1111 1111 "),
        (F.lit(1000) + F.pmod(F.col("doc_id"), F.lit(9000))).cast("string"),
        F.lit(" ip 10."), F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
        F.lit(".0."), F.pmod(F.col("doc_id"), F.lit(200)).cast("string"),
        F.lit(" tel +82 010-"),
        (F.lit(1000) + F.pmod(F.col("doc_id"), F.lit(9000))).cast("string"),
        F.lit("-"),
        (F.lit(1000) + F.pmod(F.col("doc_id") * 7, F.lit(9000))).cast("string"),
        F.lit(" end"),
    )
    d = docs.select("doc_id", planted.alias("text"))
    counts = pii_counts("text")
    return d.select(
        "doc_id",
        F.sha2(pii_redact("text"), 256).alias("redacted_sha"),
        *[c.cast("long").alias(f"n_{k}") for k, c in counts.items()],
    )


def q_freshness_priority(spark, sf_dir):
    """Freshness-decayed frontier priority (north-star scoring:
    freshness × base priority): sitemap-shaped lastmod dates decay a
    base priority with a 30-day half-life (crawl/frontier.py
    freshness_score) — the column the selection top-k orders by."""
    from news_crawler_spark.crawl.frontier import freshness_score

    docs = _t(spark, sf_dir, "documents")
    lastmod = F.concat(
        F.lit("2025-01-"),
        F.lpad((F.pmod(F.col("doc_id"), F.lit(27)) + 1).cast("string"), 2, "0"),
    ).cast("date")
    base = F.pmod(F.col("doc_id"), F.lit(10)) / F.lit(10.0)
    out = docs.select("doc_id", lastmod.alias("lastmod"),
                      base.alias("base_priority"))
    return out.withColumn(
        "score", freshness_score("base_priority", "lastmod", "2025-02-01"))


def q_robots_parse(spark, sf_dir):
    """robots.txt render→parse round trip (sources/robots.py): one
    policy body per source host is SYNTHESIZED (a bot-specific group
    that must be ignored for '*', an inline comment, a conditional
    Crawl-delay, and a second applicable group whose rules must
    union), parsed through the native distributed parser, and the
    oracle recomputes the expected gating rows directly."""
    from news_crawler_spark.sources.robots import parse_robots

    hosts = _t(spark, sf_dir, "documents").select("source").distinct()
    body = F.concat(
        F.lit("# synthetic policy\nUser-agent: otherbot\nDisallow: /bot-"),
        F.col("source"),
        F.lit("\n\nUser-agent: *\nDisallow: /priv-"), F.col("source"),
        F.lit("  # inline\n"),
        F.when(F.length("source") % 2 == 0,
               F.concat(F.lit("Crawl-delay: "),
                        (F.length("source") % 5 + 1).cast("string"),
                        F.lit("\n"))).otherwise(F.lit("")),
        F.lit("\nUser-agent: *\nDisallow: /x\n"),
    )
    parsed = parse_robots(hosts.select("source", body.alias("body")),
                          host_col="source")
    return parsed.select(
        "host", "crawl_delay",
        F.array_join("disallow", ",").alias("disallow"))


def q_incremental_dedup(spark, sf_dir):
    """Incremental corpus ingestion (the production dedup flow): a new
    batch of documents (odd doc_ids) lands against an existing corpus
    (even doc_ids); each batch doc gets a verdict — ``exact_dup``
    (normalized-text fingerprint already in the corpus), ``near_dup``
    (shares a MinHash LSH band with a corpus doc), or ``new`` — plus
    the smallest witnessing corpus doc id. At scale the corpus side is
    the persisted fingerprint/band tables maintained across ingests —
    that engine-state flow is news_crawler_spark/ingest.py DedupState
    (SnapshotTable-backed, resumable, idempotent per batch; e2e-pinned
    to a serial recompute in tests/test_ingest_state.py); this query is
    its stateless one-shot twin so the verdict join shape stays under
    the DuckDB oracle. Both joins are equi-joins on derived keys
    (fingerprint, band hash) — nothing rescans corpus text."""
    from news_crawler_spark.operators.dedup import (
        minhash_band_table, minhash_signatures)

    docs = _t(spark, sf_dir, "documents")
    # plant exact duplicates so all three verdict classes exercise:
    # batch docs with doc_id % 14 == 1 copy their corpus neighbor's
    # text verbatim (doc_id - 1 is always even = corpus side)
    donor = docs.select((F.col("doc_id") + 1).alias("doc_id"),
                        F.col("text").alias("_dtext"))
    # the synthesized table feeds FOUR subtrees (corpus/batch
    # fingerprints + corpus/batch signatures) — pin it once so the
    # donor self-join and its two scans don't re-execute per consumer
    docs = (
        docs.join(donor, "doc_id", "left")
        .select(
            "doc_id",
            F.when((F.pmod(F.col("doc_id"), F.lit(14)) == 1)
                   & F.col("_dtext").isNotNull(), F.col("_dtext"))
            .otherwise(F.col("text")).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)

    cfp = (corpus.select(fingerprint("text").alias("fp"), "doc_id")
           .groupBy("fp").agg(F.min("doc_id").alias("_efid")))
    exact = (batch.select("doc_id", fingerprint("text").alias("fp"))
             .join(cfp, "fp", "left").select("doc_id", "_efid"))

    cb = minhash_band_table(minhash_signatures(corpus)).select(
        F.col("doc_id").alias("_cid"), "band_id", "band_hash")
    bb = minhash_band_table(minhash_signatures(batch)).select(
        "doc_id", "band_id", "band_hash")
    near = (bb.join(cb, ["band_id", "band_hash"])
            .groupBy("doc_id").agg(F.min("_cid").alias("_nfid")))

    return (
        exact.join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_efid").isNotNull(), "exact_dup")
            .when(F.col("_nfid").isNotNull(), "near_dup")
            .otherwise("new").alias("verdict"),
            F.coalesce("_efid", "_nfid").alias("matched_id"),
        )
    )


def q_sitemap_parse(spark, sf_dir):
    """Sitemap XML render→parse round trip (sources/sitemap.py): one
    urlset document per source host is SYNTHESIZED from the documents
    table (loc/lastmod/changefreq/priority derived from doc_id),
    parsed back through the native from_xml pipeline, and the oracle
    recomputes the expected rows from documents directly — the
    crawl-side companion to the s2_rss_parse check."""
    from news_crawler_spark.sources.sitemap import parse_sitemap

    docs = _t(spark, sf_dir, "documents")
    item = F.concat(
        F.lit("<url><loc>http://"), F.col("source"), F.lit(".test/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("</loc><lastmod>2025-01-"),
        F.lpad((F.pmod(F.col("doc_id"), F.lit(27)) + 1).cast("string"), 2, "0"),
        F.lit("</lastmod><changefreq>"),
        F.element_at(F.array(F.lit("daily"), F.lit("weekly"), F.lit("monthly")),
                     (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int")),
        F.lit("</changefreq><priority>0."),
        F.pmod(F.col("doc_id"), F.lit(10)).cast("string"),
        F.lit("</priority></url>"),
    )
    feeds = docs.groupBy("source").agg(
        F.concat(
            F.lit("<urlset>"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("doc_id"), item.alias("x")))),
                    lambda s: s.getField("x")),
                ""),
            F.lit("</urlset>"),
        ).alias("xml"))
    return parse_sitemap(feeds, keep_cols=["source"])


def q_sequence_packing(spark, sf_dir):
    """Sequence packing (LLM training-data op): assign documents to
    fixed token-budget bins (4096) by contiguous greedy packing in
    deterministic (lang, doc_id) order — a doc starting at cumulative
    offset c lands in bin floor(c / B), straddling allowed (the
    pack-then-split convention). The cumulative sum window is
    PARTITIONED per language shard, so it parallelizes across shards —
    a global orderBy window would funnel every row through one task
    (the same scale trap operators/topk.global_row_number exists to
    avoid); real pipelines pack within shards for exactly this reason."""
    docs = _t(spark, sf_dir, "documents")
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    n_tok = token_count("text")
    return (
        docs.select("lang", "doc_id", n_tok.cast("long").alias("n_tokens"))
        .withColumn("offset",
                    F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"))
        .withColumn("bin_id", F.floor(F.col("offset") / F.lit(4096)))
    )


def q_sequence_packing_sharded(spark, sf_dir):
    """Engine-level sequence packing (operators/packing.pack_sequences):
    same greedy pack-then-split binning as q_sequence_packing, but the
    cumsum window partitions on (lang, hash-shard) instead of lang
    alone — parallelism is |langs| × n_shards regardless of language
    skew (a monolingual corpus would otherwise pack in ONE task). The
    shard is sha2-derived (topk.row_salt) so the oracle replays the
    exact binning."""
    from news_crawler_spark.operators import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    sized = docs.select(
        "lang", "doc_id",
        token_count("text").cast("long").alias("n_tokens"))
    return pack_sequences(sized, "n_tokens", 4096,
                          shard_cols=["lang"], n_shards=8)


def q_lang_id(spark, sf_dir):
    """Language-ID heuristic (script detection + EN-stopword density)
    bucketed against the table's labeled lang column."""
    from news_crawler_spark.functions import lang_guess

    docs = _t(spark, sf_dir, "documents")
    return (docs.select("lang", lang_guess("text").alias("lang_guess"))
            .groupBy("lang", "lang_guess").agg(F.count("*").alias("n")))


def q_script_mix(spark, sf_dir):
    """Script-composition profiling (functions/textstats.py
    script_fracs/dominant_script): per-doc fraction of non-whitespace
    chars in Hangul/CJK/Cyrillic/Latin/digit classes + the dominant
    script under a fixed priority — the router signal a multilingual
    CC-scale pipeline shards on before language-specific stages (and
    the signal the reference's Korean-focused feeds would key on:
    src/secbot/fetchers/news.py mixes Korean headlines with Latin
    URLs/board chrome). Scripts synthesized deterministically onto the
    documents table (doc_id%4 appends a Hangul/CJK/Cyrillic tail or
    nothing); pure per-row strip-and-diff regex counting — ZERO
    shuffles before the presentation sort."""
    from news_crawler_spark.functions.textstats import (
        dominant_script,
        script_fracs,
    )

    docs = _t(spark, sf_dir, "documents")
    tail = F.element_at(
        F.array(F.lit(" 한국어 기사 본문 텍스트"),
                F.lit(" 中文新闻内容正文如下"),
                F.lit(" русский текст статьи"),
                F.lit("")),
        (F.pmod(F.col("doc_id"), F.lit(4)) + 1).cast("int"))
    aug = docs.select(
        "doc_id", F.concat(F.col("text"), tail).alias("text"))
    fr = script_fracs(F.col("text"))
    staged = aug.select(
        "doc_id", *[v.alias(k) for k, v in fr.items()])
    return (staged
            .select("*", dominant_script().alias("dominant_script"))
            .orderBy("doc_id"))


def q_stratified_budget_sample(spark, sf_dir):
    """Budgeted stratified sampling (operators/wsample.py
    stratified_budget_sample) — the training-mixture draw: a global
    200-row budget apportions across sources by largest remainder over
    each source's weight mass (floor 2 — no stratum vanishes), then
    every source draws EXACTLY its allocation by A-ES weighted
    sampling. Weights = (n_chars % 97) + 1 (integral, quantize=1, so
    the mass sum is plainly exact in both engines). Allocation AND
    per-row membership replay value-exactly in SQL."""
    from news_crawler_spark.operators.wsample import (
        stratified_budget_sample,
    )

    d = (_t(spark, sf_dir, "documents")
         .select("doc_id", "source",
                 (F.pmod(F.col("n_chars"), F.lit(97)) + 1).alias("weight")))
    return stratified_budget_sample(
        d, group_col="source", weight_col="weight", total_k=200,
        id_col="doc_id", floor=2, quantize=1)


def q_redirect_resolution(spark, sf_dir):
    """Redirect-chain resolution (operators/redirects.py
    resolve_redirects): pointer doubling maps every redirecting URL to
    its terminal target in log₂(chain) self-joins — 3 rounds cover
    8-hop chains here (fixture chains are ≤ 4). Edges synthesized from
    documents (doc_id%5≠0 redirects to doc_id-1, so ids chain down to
    their %5==0 terminal) plus a planted 2-cycle that must report
    resolved=false with NULL hops. The oracle unrolls the doubling
    rounds in SQL; integer hops + min-dst functionalization make the
    whole resolution value-exact."""
    from news_crawler_spark.operators.redirects import resolve_redirects

    d = _t(spark, sf_dir, "documents")

    def _u(idc):
        return F.concat(F.lit("https://h"),
                        F.pmod(idc, F.lit(50)).cast("string"),
                        F.lit(".test/r/"), idc.cast("string"))

    edges = (
        d.where(F.pmod(F.col("doc_id"), F.lit(5)) != 0)
        .select(_u(F.col("doc_id")).alias("src"),
                _u(F.col("doc_id") - 1).alias("dst"))
        .unionByName(spark.createDataFrame(
            [("https://loop.test/a", "https://loop.test/b"),
             ("https://loop.test/b", "https://loop.test/a")],
            "src string, dst string"))
    )
    return resolve_redirects(edges, max_rounds=3)


def q_binary_meta(spark, sf_dir):
    """Multimodal plumbing: an opaque binary payload column
    (synthesized deterministically from text, standing in for
    image/audio bytes) with typed-metadata extraction — byte length,
    magic-bytes hex, kind bucketing — all native binary expressions
    (operators/multimodal.py holds the decode UDF surface)."""
    docs = _t(spark, sf_dir, "documents")
    payload = F.unhex(F.expr("substring(sha2(text, 256), 1, (doc_id % 29 + 4) * 2)"))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"))
    return docs.select(
        "doc_id",
        kind.alias("kind"),
        F.length(payload).alias("n_bytes"),
        F.lower(F.hex(F.substring(payload, 1, 4))).alias("magic"),
    )


def q_training_pipeline(spark, sf_dir):
    """End-to-end training-data pipeline, composed from the engine's
    own operators: near-dup clustering → keep canonical docs only →
    quality gate → deterministic stratified sample. One query, one
    oracle — the composition a 100 TB corpus-prep job actually runs.
    Scale shape: the only heavy stages are the LSH band join and the
    O(log n) CC rounds; everything downstream is narrow filters."""
    from news_crawler_spark.operators.components import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    keep = (dedup_clusters(docs, minhash_lsh_candidates(docs))
            .filter("is_canonical").select("doc_id"))
    bucket = (
        F.conv(F.substring(
            F.sha2(F.concat(F.lit("smp|"), F.col("doc_id").cast("string")), 256),
            1, 8), 16, 10).cast("long") % 1000)
    return (
        docs.join(keep, "doc_id")
        .select("doc_id", "lang",
                token_count("text").alias("n_tokens"),
                quality_score("text").alias("quality"),
                bucket.alias("_b"))
        .filter((F.col("quality") >= 0.4) & (F.col("_b") < 800))
        .drop("_b")
    )


def q_salted_agg(spark, sf_dir):
    """Two-phase salted aggregation (operators/topk.py salted_agg):
    the hot-key-skew defense — phase 1 fans each group over 16 salts,
    phase 2 merges tiny partials. Integer value column so the result
    is bitwise order-independent (float sums would reorder between the
    one-phase oracle and the two-phase engine)."""
    from news_crawler_spark.operators.topk import salted_agg

    docs = _t(spark, sf_dir, "documents")
    return salted_agg(docs, ["lang"], "n_chars", salt_src="doc_id",
                      n_salts=16)


def q_table_digest(spark, sf_dir):
    """Order-insensitive table content digest (anti-entropy check):
    bit_xor of a sha256-derived 60-bit row hash + row count — how two
    replicas of a 100 TB snapshot are compared without moving data.
    bit_xor, not sum: ANSI mode overflows summed longs."""
    docs = _t(spark, sf_dir, "documents")
    row_h = F.conv(F.substring(
        F.sha2(F.concat_ws("|", "doc_id", "lang"), 256), 1, 15), 16, 10
    ).cast("long")
    return docs.agg(F.bit_xor(row_h).alias("digest"),
                    F.count("*").alias("n"))


def q_hll_ndv(spark, sf_dir):
    """HyperLogLog distinct-count sketch (operators/sketches.py) at
    two precisions vs the exact NDV, per language. p=12 lands in the
    linear-counting regime at this scale and p=6 in the raw-estimator
    regime, so the oracle exercises both branches. Every register is
    sha256-substring-derived and the harmonic sum is exact BIGINT
    arithmetic, so DuckDB replays the sketch bit-for-bit — the driver
    hash-checks a cardinality *sketch*, not just its plumbing."""
    from news_crawler_spark.operators.sketches import hll_count_distinct

    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    exact = docs.groupBy("lang").agg(
        F.countDistinct("text").alias("ndv_exact"))
    p12 = hll_count_distinct(docs, "text", ["lang"], p=12,
                             out_col="ndv_p12")
    p6 = hll_count_distinct(docs, "text", ["lang"], p=6, out_col="ndv_p6")
    return (
        exact.join(p12, "lang").join(p6, "lang")
        .select(
            "lang", "ndv_exact", "ndv_p12", "ndv_p6",
            F.round(F.lit(100.0)
                    * F.abs(F.col("ndv_p12") - F.col("ndv_exact"))
                    / F.col("ndv_exact"), 2).alias("err_pct_p12"))
    )


def q_cms_heavy_hitters(spark, sf_dir):
    """Count-min sketch (operators/sketches.py): estimate the
    frequencies of the exact top-20 tokens from the d×w counter table
    and report the overcount (always ≥ 0 — CMS never underestimates).
    The sketch is ≤ d·w rows however large the corpus; deterministic
    sha2 hashing lets DuckDB rebuild the identical counters, so the
    driver hash-checks the sketch's cell values, not just row counts.
    Top-20 selection is orderBy+limit (TakeOrderedAndProject), not a
    global window — no single-partition exchange. The corpus is
    scanned ONCE: the demo needs exact counts anyway, so the sketch
    is built by weighted insert from the aggregated vocab table
    (identical cells to raw insertion — CMS is a sum)."""
    from news_crawler_spark.operators.sketches import (
        cms_counters, cms_lookup)

    docs = _t(spark, sf_dir, "documents")
    tok = (docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .alias("token"))
        .filter(F.length("token") >= 2))
    vocab = tok.groupBy("token").agg(F.count("*").alias("n_exact"))
    counters = cms_counters(vocab, "token", d=4, w=2048,
                            weight_col="n_exact")
    top = vocab.orderBy(F.col("n_exact").desc(), "token").limit(20)
    est = cms_lookup(counters, top, "token", d=4, w=2048)
    return est.select(
        "token", "n_exact", "cms_est",
        (F.col("cms_est") - F.col("n_exact")).alias("overcount"))


def q_salted_join_revenue(spark, sf_dir):
    """Skew-safe salted equi-join (operators/topk.py salted_join):
    the small side replicates once per salt, the big side salts on a
    row-level column, so a hot join key spreads over n_salts tasks;
    the result multiset is exactly the plain join's, which is what
    the oracle runs. Revenue summed in integer cents (floor×100) so
    the aggregate is shuffle-order-exact."""
    from news_crawler_spark.operators.topk import salted_join

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").withColumnRenamed(
        "p_partkey", "l_partkey")
    j = salted_join(li, part, "l_partkey", salt_src="l_orderkey",
                    n_salts=8)
    return j.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
        .alias("cents"))


def q_event_correlation(spark, sf_dir):
    """Funnel correlation (streaming/events.py correlate_events):
    view → purchase by the same user within 60 min, the batch twin of
    the watermarked stream-stream interval join (the time band is
    what bounds join state on an unbounded stream). gap is an exact
    microsecond integer, so the interval join is value-hash-checkable."""
    from news_crawler_spark.streaming import correlate_events

    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    buys = ev.filter(F.col("event_type") == "purchase")
    return correlate_events(views, buys, gap_minutes=60)


def q_bigram_collocations(spark, sf_dir):
    """Collocation (phrase) mining: top-30 bigrams by association
    lift — the phrase-vocabulary pass of a tokenizer pipeline. The
    score is scaled-integer lift ``(n_xy·n_total·1000) div (n_x·n_y)``
    — ln-free but order-equivalent to PMI (log is monotone), so the
    ranking is exact integer arithmetic both engines replay
    bit-for-bit (magnitudes bounded: needs n_total² · 10³ < 2⁶³,
    i.e. corpora under ~3e9 tokens; shard the count tables past
    that). Bigrams come from a row-local zip_with over the pinned
    token array (one Generate, no HOF re-evaluation, no per-token
    window shuffle — the dedup-shingle lesson); counts are
    map-side-combinable groupBys; the final top-30 is
    orderBy+limit."""
    docs = _t(spark, sf_dir, "documents")
    # r6: the corpus was tokenized FOUR times (n_total, the two uni
    # join sides, and the bigram window) and the bigram pass shuffled
    # + sorted every token row for a lead() window. Now the filtered
    # token array is pinned ONCE behind a Generate barrier
    # (localCheckpoint — blocks release with the df), bigrams are a
    # row-local zip_with of the array with its own tail (identical
    # multiset: lead over pos == adjacent-in-filtered-array), uni is
    # pinned (vocab-sized) for its two join sides, and n_total is the
    # exact integer sum of uni counts.
    toks = F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                    lambda x: F.length(x) >= 2)
    staged = (docs.select(
        F.col("doc_id"),
        F.explode(F.array(F.struct(toks.alias("t")))).alias("_tk"))
        .filter(F.col("_tk").getField("t").isNotNull())
        .localCheckpoint(eager=True))
    tok = staged.select(
        "doc_id", F.explode(F.col("_tk").getField("t")).alias("w"))
    big = (staged.select(
        F.expr("explode(zip_with("
               "slice(_tk.t, 1, greatest(size(_tk.t) - 1, 0)), "
               "slice(_tk.t, 2, greatest(size(_tk.t) - 1, 0)), "
               "(a, b) -> named_struct('w', a, 'w2', b)))").alias("_bg"))
        # coalesce is a schema-only fix: zip_with struct fields are
        # nullable while the old posexplode tokens were not; no w is
        # ever NULL (split elements are non-null), so values are
        # untouched and the output schema keeps w non-nullable
        .select(F.coalesce(F.col("_bg.w"), F.lit("")).alias("w"),
                F.col("_bg.w2").alias("w2")))
    uni = (tok.groupBy("w").agg(F.count("*").alias("n_w"))
           .localCheckpoint(eager=True))
    n_total = uni.agg(
        F.coalesce(F.sum("n_w"), F.lit(0).cast("long")).alias("n_total"))
    pair = (big.groupBy("w", "w2").agg(F.count("*").alias("n_xy"))
            .where(F.col("n_xy") >= 5))
    scored = (
        pair.join(uni.select(F.col("w"), F.col("n_w").alias("n_x")), "w")
        .join(uni.select(F.col("w").alias("w2"),
                         F.col("n_w").alias("n_y")), "w2")
        .crossJoin(F.broadcast(n_total))
        .select("w", "w2", "n_xy", "n_x", "n_y",
                F.expr("(n_xy * n_total * 1000) div (n_x * n_y)")
                .alias("lift_milli"))
    )
    return scored.orderBy(F.col("lift_milli").desc(), "w", "w2").limit(30)


def q_histogram_quantiles(spark, sf_dir):
    """Mergeable fixed-bin histogram → quantile estimates (p50/p90/
    p99 of event value per type), the third sketch family: quantile
    state that merges by summing bins, vs the exact-percentile query
    (`percentiles`) that must see all data. Integer cumulative
    thresholds make the chosen bin engine-exact; the estimate is the
    bin's left edge (error ≤ one width)."""
    from news_crawler_spark.operators.sketches import (
        histogram_counts, histogram_quantiles)

    ev = _t(spark, sf_dir, "events")
    hist = histogram_counts(ev, "value", ["event_type"],
                            lo=0.0, hi=600.0, n_bins=120)
    return histogram_quantiles(hist, [50, 90, 99], ["event_type"],
                               lo=0.0, hi=600.0, n_bins=120)


def q_pagerank_authority(spark, sf_dir):
    """Link-graph authority (operators/linkrank.py): 3 PageRank power
    iterations in exact scaled-integer arithmetic over a
    deterministically hash-synthesized 400-node edge list, top-30 by
    rank. Integer contributions commute under shuffle order, so the
    unrolled-CTE oracle reproduces every rank bit-for-bit — an
    ITERATIVE distributed algorithm under the value-hash gate."""
    from news_crawler_spark.operators.linkrank import pagerank

    ev = _t(spark, sf_dir, "events")
    edges = (
        ev.select(
            F.pmod(F.col("user_id"), F.lit(400)).alias("src"),
            F.pmod(F.col("user_id") * F.lit(2654435761) + F.col("event_id"),
                   F.lit(400)).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    ranks = pagerank(edges, iterations=3)
    return (ranks.orderBy(F.col("rank_micro").desc(), "node")
            .limit(30))


def _pagerank_oracle(iterations: int = 3, damping_pct: int = 85,
                     scale: int = 10**12) -> str:
    """Unrolled-CTE replay of operators/linkrank.py pagerank: same
    integer base/teleport, same per-edge `(r*d) div (100*outdeg)`
    floor division (all operands positive, so DuckDB `//` == Spark
    `div`), same left-join keep of dangling nodes."""
    n_sq = "(SELECT count(*) FROM nodes)"
    base = f"(({100 - damping_pct} * {scale}) // (100 * {n_sq}))"
    ctes = [f"""
            e AS (
              SELECT DISTINCT user_id % 400 AS src,
                     (user_id * 2654435761 + event_id) % 400 AS dst
              FROM events
              WHERE user_id % 400
                    <> (user_id * 2654435761 + event_id) % 400),
            nodes AS (SELECT src AS node FROM e
                      UNION SELECT dst FROM e),
            od AS (SELECT src, count(*) AS n_out FROM e GROUP BY src),
            it0 AS (SELECT node,
                           CAST({scale} // {n_sq} AS BIGINT) AS r
                    FROM nodes)"""]
    for k in range(1, iterations + 1):
        ctes.append(f"""
            it{k} AS (
              SELECT n.node,
                     CAST({base} + coalesce(m.mass, 0) AS BIGINT) AS r
              FROM nodes n LEFT JOIN (
                SELECT e.dst AS node,
                       CAST(sum((r.r * {damping_pct})
                                // (100 * od.n_out)) AS BIGINT) AS mass
                FROM e JOIN it{k - 1} r ON e.src = r.node
                       JOIN od ON e.src = od.src
                GROUP BY e.dst) m ON n.node = m.node)""")
    return (f"WITH {','.join(ctes)}\n"
            f"            SELECT node, r AS rank_micro FROM it{iterations}\n"
            f"            ORDER BY rank_micro DESC, node LIMIT 30")


def q_unpivot_metrics(spark, sf_dir):
    """Relational UNPIVOT (wide metrics → long rows) — native
    DataFrame.unpivot, the melt step feature pipelines run before
    per-metric aggregation."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return (
        li.select("l_orderkey", "l_linenumber",
                  "l_quantity", "l_extendedprice", "l_discount")
        .unpivot(["l_orderkey", "l_linenumber"],
                 ["l_quantity", "l_extendedprice", "l_discount"],
                 "metric", "val")
    )


def q_map_ops(spark, sf_dir):
    """Map-typed column family: create_map / map_keys / map_values /
    element_at / size — all native. Keys/values are projected through
    array_join so every result column is a sortable SCALAR: the
    driver's pandas canonicalizer cannot sort/hash list-typed cells
    (r02 red row — TypeError: unhashable type 'list')."""
    p = _t(spark, sf_dir, "part")
    m = F.create_map(F.lit("brand"), F.col("p_brand"),
                     F.lit("type"), F.col("p_type"))
    return p.select(
        "p_partkey",
        F.array_join(F.map_keys(m), ",").alias("ks"),
        F.array_join(F.map_values(m), ",").alias("vs"),
        F.element_at(m, F.lit("brand")).alias("brand"),
        F.size(m).alias("n"),
    )


def q_token_modes(spark, sf_dir):
    """Token counting both ways (training-data op): whitespace tokens
    vs BPE-ish regex tokens (letter runs / digit runs / single
    symbols) — the cheap pre-tokenizer length estimate used for
    sequence-length budgeting. Native regexp_extract_all, codegen."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("ws_tokens"),
        token_count("text", mode="bpe").alias("bpe_tokens"),
    )


def q_sample_stratified(spark, sf_dir):
    """Deterministic hash-stratified sampling (training-data op):
    per-language rates via a sha256-derived uniform bucket — no RNG
    state, no shuffle, and the SAME sample on any engine or cluster
    size (the property that matters when a 100 TB job re-runs; Spark's
    rand()-based sample() is partition-layout-dependent)."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(
            F.sha2(F.concat(F.lit("smp|"), F.col("doc_id").cast("string")), 256),
            1, 8), 16, 10).cast("long") % 1000)
    rate = (F.when(F.col("lang") == "en", F.lit(300))
            .when(F.col("lang") == "ko", F.lit(700))
            .otherwise(F.lit(1000)))
    return docs.filter(bucket < rate).select("doc_id", "lang")


def q_sample_k_per_group(spark, sf_dir):
    """Exact-k-per-group deterministic sampling (eval-set carving:
    'take 25 docs per language'): rank by a sha256-derived shuffle key
    inside each group — reproducible on any engine/cluster size, no
    RNG, one shuffle (the same groupBy-shaped exchange the downstream
    per-group work needs anyway)."""
    docs = _t(spark, sf_dir, "documents")
    key = F.sha2(F.concat(F.lit("smpk|"), F.col("doc_id").cast("string")), 256)
    w = Window.partitionBy("lang").orderBy(key.asc(), F.col("doc_id").asc())
    return (docs.select("doc_id", "lang")
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 25))


def q_vocab_topk(spark, sf_dir):
    """Vocabulary building: token frequencies per language, top-20 —
    the tokenizer-prep pass of a training pipeline. Shuffle is one
    groupBy on (lang, token) with map-side partial counts; the rank
    window runs over the already-aggregated vocab table."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"))
    counts = (tok.filter(F.length("token") >= 2)
              .groupBy("lang", "token").agg(F.count("*").alias("n")))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token"))
    return (counts.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 20))


def q_fingerprint(spark, sf_dir):
    """Document fingerprint (rolling-hash analog, exact-dedup key)."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id", fingerprint("text").alias("fp"))


def q_jaccard_token_pairs(spark, sf_dir):
    """n-gram Jaccard near-dup pairs (token grain, bounded subset)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return ngram_jaccard_pairs(docs, shingle_n=1, threshold=0.5)


def q_minhash_jaccard_est(spark, sf_dir):
    """Jaccard ESTIMATION from MinHash signature agreement: for every
    LSH candidate pair, the fraction of agreeing signature components
    (an unbiased Jaccard estimator, Broder 1997) — the cheap O(pairs ×
    num_hashes) verifier that replaces the quadratic exact-shingle
    join at corpus scale. Signatures compute ONCE (localCheckpoint)
    and feed both the band-bucket candidate join and the agreement
    count; agreement is a native zip_with/filter/size over the two
    sig arrays. sha2-derived hashes → the DuckDB oracle replays every
    signature component value-exactly."""
    from news_crawler_spark.operators.dedup import (
        band_pairs, minhash_band_table, minhash_signatures)

    docs = _t(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs).localCheckpoint(eager=True)
    cand = band_pairs(minhash_band_table(sigs))
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("_sa"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("_sb"))
    matches = F.size(F.filter(
        F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda m: m))
    return (
        cand.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b",
                F.round(matches / F.lit(32.0), 6).alias("jaccard_est"))
    )


def q_sim_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k ANN baseline over embeddings."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk_bruteforce(queries, emb, k=5).select(
        "query_id", "neighbor_id", "sim", "rnk")


def q_ivf_ann(spark, sf_dir):
    """IVF (inverted-file) ANN top-k: corpus partitioned into centroid
    cells (deterministic seed centroids = first 16 vectors, so the
    oracle replays the exact cells), queries probe their 2 nearest
    cells — the k-means-flavored counterpart to sign-LSH with the same
    bucket-equi-join scale shape (operators/similarity.py ivf_topk)."""
    from news_crawler_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return ivf_topk(queries, emb, k=5, n_centroids=16, nprobe=2)


def q_p2_advisory_parse(spark, sf_dir):
    """P2: RSS-entry normalization (reference advisory.py:50-107) —
    UTC→Asia/Seoul date, regex date fallback, trim/coalesce defaults."""
    ev = _t(spark, sf_dir, "events")
    raw = F.concat(F.lit("  note "), F.col("event_type"),
                   F.lit(" 2025-03-0"), (F.pmod(F.col("event_id"), F.lit(9)) + 1).cast("string"),
                   F.lit("  "))
    return ev.select(
        "event_id",
        F.to_date(F.from_utc_timestamp(F.col("ts"), "Asia/Seoul")).alias("seoul_date"),
        F.trim(raw).alias("summary"),
        F.coalesce(
            F.nullif(F.regexp_extract(raw, r"(\d{4}-\d{2}-\d{2})", 1), F.lit("")),
            F.lit("1970-01-01"),
        ).cast("date").alias("fallback_date"),
    )


def q_s2_rss_parse(spark, sf_dir):
    """S2 real-XML path (reference advisory.py:61-109): RSS 2.0
    documents are SYNTHESIZED from the events table (one multi-item
    feed per user, RFC-822 pubDates, whitespace-padded titles), parsed
    back through the native from_xml pipeline (sources/rss.py), and
    normalized. The oracle recomputes the expected rows from events
    directly — a full XML render→parse round-trip check."""
    from news_crawler_spark.sources.rss import parse_rss

    ev = _t(spark, sf_dir, "events")
    item_xml = F.concat(
        F.lit("<item><title> "), F.col("event_type"), F.lit(" #"),
        F.col("event_id").cast("string"),
        F.lit(" </title><link>http://feed.test/"),
        F.col("event_id").cast("string"),
        F.lit("</link><pubDate>"),
        F.date_format("ts", "EEE, dd MMM yyyy HH:mm:ss 'GMT'"),
        F.lit("</pubDate><description>note "), F.col("event_type"),
        F.lit(" 2025-03-0"),
        (F.pmod(F.col("event_id"), F.lit(9)) + 1).cast("string"),
        F.lit("</description></item>"),
    )
    feeds = ev.groupBy("user_id").agg(
        F.concat(
            F.lit('<rss version="2.0"><channel><title>feed</title>'),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("event_id"), item_xml.alias("x")))),
                    lambda s: s.getField("x")),
                ""),
            F.lit("</channel></rss>"),
        ).alias("xml")
    )
    items = parse_rss(feeds, "xml")
    return items.select(
        F.regexp_extract("link", r"feed\.test/(\d+)", 1).cast("long")
        .alias("event_id"),
        F.trim("title").alias("summary"),
        "pub_ts",
        F.to_date(F.from_utc_timestamp("pub_ts", "Asia/Seoul")).alias("seoul_date"),
        F.coalesce(
            F.nullif(F.regexp_extract("description", r"(\d{4}-\d{2}-\d{2})", 1),
                     F.lit("")),
            F.lit("1970-01-01"),
        ).cast("date").alias("fallback_date"),
    )


def q_join3_revenue(spark, sf_dir):
    """Multiway equi-join + agg (the join family SURVEY §2.9 notes the
    reference lacks): revenue per nation."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


def q_sessionize(spark, sf_dir):
    """Sessionization (gap > 30 min), batch window form (streaming twin:
    session_window in streaming/events.py)."""
    from news_crawler_spark.streaming import sessionize_batch

    ev = _t(spark, sf_dir, "events")
    return sessionize_batch(ev, gap_minutes=30).select(
        "user_id", "event_id", "session_no")


def q_sliding_window_agg(spark, sf_dir):
    """Native sliding-window aggregation (F.window, 1 h window /
    30 min slide — each event lands in exactly 2 windows). The value
    sum goes through floor(value*1000)→BIGINT so the aggregate is
    order-insensitive exact integer arithmetic (a raw double sum
    reorders between engines); min/max are order-insensitive already.
    Scale shape: one Expand (×2 rows) + one hash agg — no self-join,
    no window function over a global sort."""
    ev = _t(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.floor(F.col("value") * 1000).cast("long"))
             .alias("val_milli"),
             F.min("value").alias("vmin"),
             F.max("value").alias("vmax"))
        .select(F.col("w.start").alias("win_start"),
                F.col("w.end").alias("win_end"),
                "event_type", "n", "val_milli", "vmin", "vmax")
    )


def q_session_window_agg(spark, sf_dir):
    """Native session windows (F.session_window, 10 min gap) per user:
    the event-time analog of the reference's per-source batching,
    and the batch twin of streaming session state. Session end =
    last event + gap (Spark semantics), replayed in the oracle as
    gaps-and-islands (lag/cumsum). Boundary is INCLUSIVE: an event at
    exactly prev_ts + gap merges into the session (probed on 4.1.2),
    so the oracle breaks only on a STRICTLY greater gap."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("sw"),
                   "user_id")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.floor(F.col("value") * 1000).cast("long"))
             .alias("val_milli"))
        .select("user_id",
                F.col("sw.start").alias("sess_start"),
                F.col("sw.end").alias("sess_end"),
                "n_events", "val_milli")
    )


def q_asof_join(spark, sf_dir):
    """As-of join (union-window algorithm): each event matched to the
    user's most recent order at-or-before the event time."""
    from news_crawler_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"),
                 F.col("o_orderdate").alias("odate"))
        .agg(F.max("o_orderkey").alias("o_orderkey"))  # unique per (key,time)
    )
    out = asof_join(ev, orders, key="user_id", probe_time="ts",
                    ref_time="odate", value_cols=["o_orderkey"])
    return out.select("event_id", "user_id", "asof_o_orderkey")


def q_pivot(spark, sf_dir):
    """Pivot: per-user event-type count matrix."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


def q_cube(spark, sf_dir):
    """Cube aggregate over returnflag x linestatus."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.count("*").alias("n"))
    )


def q_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per event type."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.75)"), 4).alias("p75"),
    )


def q_korean_date_parse(spark, sf_dir):
    """P1: Korean-format datetime round-trip (reference news.py:116-121
    parses '%Y년 %m월 %d일 %H:%M')."""
    o = _t(spark, sf_dir, "orders")
    kstr = F.date_format("o_orderdate", "yyyy'년' MM'월' dd'일' HH:mm")
    parsed = F.to_timestamp(kstr, "yyyy'년' MM'월' dd'일' HH:mm")
    return o.select("o_orderkey", kstr.alias("kdate"), parsed.alias("parsed"))


def q_sid_assignment(spark, sf_dir):
    """K3: deterministic SID numbering for novel rule keys
    (BASE_SID + rank in key order, suricata.py:184-186) — two-phase
    global_row_number, so no single-partition window even when the
    rules batch is huge."""
    from news_crawler_spark.operators.topk import global_row_number

    ev = _t(spark, sf_dir, "events")
    ip = F.concat_ws(
        ".",
        F.pmod(F.col("event_id"), F.lit(250)).cast("string"),
        F.pmod(F.col("user_id"), F.lit(250)).cast("string"),
        F.lit("0"), F.lit("1"),
    )
    keys = ev.select(ip.alias("key")).dropDuplicates(["key"])
    return (global_row_number(keys, "key", out_col="_rn")
            .select("key", (F.lit(7000000) + F.col("_rn")).alias("sid")))


def q_digest_plan(spark, sf_dir):
    """The reference's whole job as one plan: F1→F3→L1→D1→L2
    (plans/digest.py) over synthesized items."""
    from news_crawler_spark.plans import news_digest

    docs = _t(spark, sf_dir, "documents")
    items = docs.select(
        F.concat(F.lit("doc "), F.col("doc_id").cast("string"), F.lit(" "),
                 F.substring("text", 1, 40)).alias("title"),
        F.concat(F.lit("http://n.test/"), (F.col("doc_id") % 50).cast("string"))
        .alias("link"),
        F.make_timestamp(
            F.lit(2025), F.lit(6), (F.lit(1) + F.pmod(F.col("doc_id"), F.lit(3))),
            F.pmod(F.col("doc_id"), F.lit(24)), F.lit(0), F.lit(0),
        ).alias("published"),
    )
    return news_digest(items, ["query", "join", "window"],
                       "2025-06-02", limit=10)


def q_window_funcs(spark, sf_dir):
    """Window-function family: rank/dense_rank/lag/lead/ntile."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "user_id", "event_id",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.lag("value", 1).over(w), 2).alias("prev_value"),
        F.round(F.lead("value", 1).over(w), 2).alias("next_value"),
        F.ntile(4).over(w).alias("quartile"),
    )


def q_array_ops(spark, sf_dir):
    """Array functions over tokenized text: distinct/sort/slice/contains."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    uniq_sorted = F.array_sort(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(uniq_sorted).alias("n_unique"),
        F.concat_ws("|", F.slice(uniq_sorted, 1, 3)).alias("first3"),
        F.array_contains(toks, "the").alias("has_the"),
    )


def q_string_funcs(spark, sf_dir):
    """Scalar string family: upper/lpad/reverse/substr/replace/strpos."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_pad"),
        F.reverse("c_name").alias("name_rev"),
        F.substring("c_name", 1, 8).alias("name_pfx"),
        F.regexp_replace("c_name", "0", "#").alias("name_masked"),
        F.instr("c_name", "1").alias("pos_one"),
    )


def q_grouping_sets(spark, sf_dir):
    """GROUPING SETS (the remaining multi-group aggregate form)."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("gs_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice), 2) AS total, count(*) AS n
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


def q_doc_pipeline(spark, sf_dir):
    """Composed training-data pipeline: quality filter → fingerprint →
    first-wins dedup → per-language counts, in one declarative plan."""
    docs = _t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", "lang",
        token_count("text").alias("n_tokens"),
        fingerprint("text").alias("fp"),
    ).filter(F.col("n_tokens") >= 20)
    keep = first_wins_dedup(staged, ["fp"], [F.col("doc_id").asc()])
    return keep.groupBy("lang").agg(
        F.count("*").alias("kept_docs"),
        F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
    )


# -- near-dup family: sha2-derived hashes so the DuckDB oracle can
#    replay every stage (signatures, banding, bucketing) value-exactly

def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup candidate pairs. Signature hashes are
    sha256-substring-derived (operators/dedup.py), so the oracle
    replays the full shingle→minhash→band→bucket-join pipeline."""
    return minhash_lsh_candidates(_t(spark, sf_dir, "documents"))


def q_range_join(spark, sf_dir):
    """Range (interval-containment) join via bucket decomposition
    (operators/rangejoin.py): points = every event, intervals = 10-90
    minute windows opened by every 53rd event. The bucket equi-join
    replaces the BroadcastNestedLoopJoin a bare range predicate plans
    to; the oracle is the plain theta join (exact same semantics)."""
    from news_crawler_spark.operators.rangejoin import interval_join_bucketed

    ev = _t(spark, sf_dir, "events")
    sec = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    points = ev.select(F.col("event_id").alias("point_id"), sec.alias("p_sec"))
    intervals = (
        ev.filter(F.pmod(F.col("event_id"), F.lit(53)) == 0)
        .select(F.col("event_id").alias("interval_id"), sec.alias("s_sec"),
                (sec + (F.pmod(F.col("event_id"), F.lit(9)) + 1) * 600)
                .alias("e_sec"))
    )
    return (
        interval_join_bucketed(points, intervals)
        .select("point_id", "interval_id",
                (F.col("p_sec") - F.col("s_sec")).alias("offset_sec"))
    )


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing document sketches (rolling-window min-hash of
    positional k-grams, operators/dedup.py) — containment/partial-copy
    detection, the signal whole-document MinHash misses."""
    from news_crawler_spark.operators.dedup import winnowing_fingerprints

    return winnowing_fingerprints(_t(spark, sf_dir, "documents"))


def q_dup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS: MinHash-LSH pairs closed under transitivity
    (alternating large-star/small-star connected components,
    operators/components.py) → per-doc keep/drop verdict. The oracle
    replays the closure with a recursive CTE over the same pair SQL."""
    from news_crawler_spark.operators.components import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    return dedup_clusters(docs, minhash_lsh_candidates(docs))


def q_dedup_simhash(spark, sf_dir):
    """SimHash banding candidates — fully native (sha2 token hashes,
    SUM bit-votes, band self-join), oracle-replayable."""
    return simhash_buckets(_t(spark, sf_dir, "documents"))


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs via sign-LSH blocking
    (sha2-derived ±1 Rademacher planes — bucketing and cosine both
    oracle-replayable)."""
    from news_crawler_spark.operators.similarity import embedding_near_dup_pairs

    # testdata embeddings are unclustered gaussians (max pairwise cosine
    # ~0.5), so the "near-dup" band for this fixture is >=0.3; real
    # corpora use ~0.95 (recall verified with planted pairs in tests)
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    return embedding_near_dup_pairs(emb, threshold=0.3, dim=64, n_planes=6)


# -- oracle-SQL generators for the near-dup family (the SQL mirrors the
#    Spark pipeline hash-for-hash; loops keep the 32/64-column
#    aggregations readable)

def _hll_ndv_oracle(p: int, alias: str) -> str:
    """DuckDB replay of operators/sketches.py hll_count_distinct over
    documents.text grouped by lang: same 60-bit sha256-substring hash,
    same exact-integer register sum (sum() is HUGEINT in DuckDB —
    cast back, the round-1 lesson), same float-constant estimate (the
    α·m²·2^s constant is embedded via repr() so both engines parse
    the identical double)."""
    from news_crawler_spark.operators.sketches import _alpha

    m = 1 << p
    sb = 60 - p              # suffix bits
    sexp = sb + 1            # scale exponent: term = 2^(sexp - rho)
    c = _alpha(m) * m * m * float(1 << sexp)
    mask = (1 << sb) - 1
    return f"""
            SELECT lang,
                   CAST(round(CASE WHEN e_raw <= {2.5 * m} AND zeros > 0
                        THEN {float(m)!r} * ln({float(m)!r} / zeros)
                        ELSE e_raw END, 0) AS BIGINT) AS {alias}
            FROM (
              SELECT lang, {c!r} / s_total AS e_raw, zeros
              FROM (
                SELECT lang,
                       CAST({m} - count(*) AS DOUBLE) AS zeros,
                       CAST(CAST(sum(1::BIGINT << ({sexp} - r)) AS BIGINT)
                            + ({m} - count(*)) * (1::BIGINT << {sexp})
                            AS DOUBLE) AS s_total
                FROM (
                  SELECT lang, h >> {sb} AS bucket,
                         max(CASE WHEN (h & {mask}) = 0 THEN {sb + 1}
                             ELSE {sb} - length(bin(h & {mask})) + 1
                             END) AS r
                  FROM (
                    SELECT lang,
                           ('0x' || substr(sha256(CAST(text AS VARCHAR)),
                                           1, 15))::BIGINT AS h
                    FROM documents WHERE text IS NOT NULL)
                  GROUP BY lang, bucket)
                GROUP BY lang))
        """


# The CCNet bigram cross-entropy oracle, shared by lm_perplexity and
# perplexity_buckets (which nests it as its scoring CTE).
_LM_CE_SQL = """
            WITH tok AS (
              SELECT doc_id, w1, row_number() OVER
                       (PARTITION BY doc_id ORDER BY pos) AS pos
              FROM (
                SELECT doc_id,
                       unnest(string_split_regex(lower(trim(text)), '\\s+'))
                         AS w1,
                       generate_subscripts(
                         string_split_regex(lower(trim(text)), '\\s+'), 1)
                         AS pos
                FROM documents)),
            bg AS (
              SELECT doc_id, w1,
                     lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
              FROM tok QUALIFY w2 IS NOT NULL),
            uni AS (SELECT w1, count(*) AS cu FROM tok GROUP BY 1),
            big AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
            v AS (SELECT count(DISTINCT w1) AS vs FROM tok)
            SELECT bg.doc_id,
                   count(*) AS n_bigrams,
                   round(-avg(ln((big.cb + 1) / (uni.cu + v.vs))), 6)
                     AS cross_entropy
            FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
            GROUP BY bg.doc_id
        """


def _minhash_lsh_oracle(num_hashes: int = 32, bands: int = 8,
                        shingle_n: int = 3) -> str:
    rows = num_hashes // bands
    mins = ",\n                   ".join(
        f"min(_h1 + {j}*_h2) AS m{j}" for j in range(num_hashes))
    band_selects = "\n              UNION ALL\n              ".join(
        f"SELECT doc_id, {b} AS band_id, "
        + " || ',' || ".join(f"CAST(m{b * rows + j} AS VARCHAR)"
                             for j in range(rows))
        + " AS band_hash FROM sigs"
        for b in range(bands))
    return f"""
            WITH toks AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(CASE WHEN len(t) >= {shingle_n}
                              THEN list_transform(
                                     range(1, len(t) - {shingle_n - 2}),
                                     i -> array_to_string(t[i:i+{shingle_n - 1}], ' '))
                              ELSE [array_to_string(t, ' ')] END) AS shingle
                FROM toks)),
            hashed AS (
              SELECT doc_id,
                     ('0x' || substr(sha256(shingle), 1, 15))::BIGINT
                        % 2147483648 AS _h1,
                     ('0x' || substr(sha256(shingle), 16, 15))::BIGINT
                        % 2147483648 + 1 AS _h2
              FROM sh),
            sigs AS (
              SELECT doc_id,
                   {mins}
              FROM hashed GROUP BY doc_id),
            bands AS (
              {band_selects})
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bands a JOIN bands b USING (band_id, band_hash)
            WHERE a.doc_id < b.doc_id
        """


def _simhash_oracle(band_bits: int = 16) -> str:
    votes = ",\n                     ".join(
        f"sum(CASE WHEN (_h{'l' if b < 32 else 'h'} >> {b % 32}) & 1 = 1"
        f" THEN 1 ELSE -1 END) AS v{b}"
        for b in range(64))
    band_selects = "\n              UNION ALL\n              ".join(
        f"SELECT doc_id, {k} AS band_id, "
        + " + ".join(f"(CASE WHEN v{k * band_bits + j} > 0 THEN {1 << j}"
                     " ELSE 0 END)" for j in range(band_bits))
        + " AS band_val FROM votes"
        for k in range(64 // band_bits))
    return f"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
              FROM documents),
            hashed AS (
              SELECT doc_id,
                     ('0x' || substr(sha256(t), 1, 8))::BIGINT AS _hl,
                     ('0x' || substr(sha256(t), 9, 8))::BIGINT AS _hh
              FROM tok),
            votes AS (
              SELECT doc_id,
                     {votes}
              FROM hashed GROUP BY doc_id),
            bands AS (
              {band_selects})
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bands a JOIN bands b USING (band_id, band_val)
            WHERE a.doc_id < b.doc_id
        """


def _minhash_cte_sql(num_hashes: int = 32, bands: int = 8,
                     from_sql: str = "documents") -> str:
    """Shared WITH-body replaying minhash signatures (sha2 double
    hashing) and the LSH band table for every document — the common
    prefix of the generated near-dup oracles. ``from_sql`` names the
    (doc_id, text) relation to read."""
    rpb = num_hashes // bands
    mins = ",\n                   ".join(
        f"min(_h1 + {j}*_h2) AS m{j}" for j in range(num_hashes))
    band_rows = "\n              UNION ALL\n".join(
        f"              SELECT doc_id, {b} AS band_id, "
        + " || ',' || ".join(
            f"CAST(m{b * rpb + i} AS VARCHAR)" for i in range(rpb))
        + " AS band_hash FROM sigs"
        for b in range(bands))
    return f"""toks AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
              FROM {from_sql}),
            sh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(CASE WHEN len(t) >= 3
                              THEN list_transform(
                                     range(1, len(t) - 1),
                                     i -> array_to_string(t[i:i+2], ' '))
                              ELSE [array_to_string(t, ' ')] END) AS shingle
                FROM toks)),
            hashed AS (
              SELECT doc_id,
                     ('0x' || substr(sha256(shingle), 1, 15))::BIGINT
                        % 2147483648 AS _h1,
                     ('0x' || substr(sha256(shingle), 16, 15))::BIGINT
                        % 2147483648 + 1 AS _h2
              FROM sh),
            sigs AS (
              SELECT doc_id,
                   {mins}
              FROM hashed GROUP BY doc_id),
            bands AS (
{band_rows})"""


def _minhash_jaccard_est_oracle(num_hashes: int = 32, bands: int = 8) -> str:
    """Replays minhash signatures, LSH band candidates, and the
    per-pair signature-agreement fraction — the exact pipeline of
    q_minhash_jaccard_est."""
    sig_list = ", ".join(f"m{j}" for j in range(num_hashes))
    return f"""
            WITH {_minhash_cte_sql(num_hashes, bands)},
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b USING (band_id, band_hash)
              WHERE a.doc_id < b.doc_id),
            ml AS (
              SELECT doc_id, unnest([{sig_list}]) AS v,
                     unnest(range(0, {num_hashes})) AS j
              FROM sigs)
            SELECT c.id_a, c.id_b,
                   round(avg(CASE WHEN ma.v = mb.v THEN 1.0 ELSE 0.0 END), 6)
                     AS jaccard_est
            FROM cand c
            JOIN ml ma ON ma.doc_id = c.id_a
            JOIN ml mb ON mb.doc_id = c.id_b AND mb.j = ma.j
            GROUP BY c.id_a, c.id_b
        """


def _incremental_dedup_oracle(num_hashes: int = 32, bands: int = 8) -> str:
    """Replays the incremental-ingest verdicts: odd doc_ids are the
    new batch, even doc_ids the existing corpus; exact via fingerprint
    equality, near via shared LSH band; exact-dup rows planted by
    copying the corpus neighbor's text for doc_id % 14 == 1."""
    return f"""
            WITH d2 AS (
              SELECT d.doc_id,
                     CASE WHEN d.doc_id % 14 = 1 AND dn.text IS NOT NULL
                          THEN dn.text ELSE d.text END AS text
              FROM documents d
              LEFT JOIN documents dn ON dn.doc_id = d.doc_id - 1),
            {_minhash_cte_sql(num_hashes, bands, from_sql="d2")},
            fp AS (
              SELECT doc_id,
                     sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                       AS fp
              FROM d2),
            exact AS (
              SELECT b.doc_id, min(c.doc_id) AS efid
              FROM fp b LEFT JOIN fp c
                ON c.fp = b.fp AND c.doc_id % 2 = 0
              WHERE b.doc_id % 2 = 1 GROUP BY b.doc_id),
            near AS (
              SELECT b.doc_id, min(c.doc_id) AS nfid
              FROM bands b JOIN bands c USING (band_id, band_hash)
              WHERE b.doc_id % 2 = 1 AND c.doc_id % 2 = 0
              GROUP BY b.doc_id)
            SELECT e.doc_id,
                   CASE WHEN e.efid IS NOT NULL THEN 'exact_dup'
                        WHEN n.nfid IS NOT NULL THEN 'near_dup'
                        ELSE 'new' END AS verdict,
                   coalesce(e.efid, n.nfid) AS matched_id
            FROM exact e LEFT JOIN near n USING (doc_id)
        """


def _embedding_near_dup_oracle(dim: int = 64, n_planes: int = 6,
                               seed: int = 42, threshold: float = 0.3) -> str:
    # shared bucket builder (also lsh_ann's) — ONE copy of the
    # fold-order-sensitive sign-test SQL to keep bit-exact
    bucket = _rademacher_bucket_sql(dim, n_planes, seed)
    return f"""
            WITH base AS (
              SELECT vec_id, embedding::DOUBLE[] AS e
              FROM embeddings WHERE vec_id < 500),
            bk AS (
              SELECT vec_id, e,
                     {bucket} AS bucket
              FROM base)
            SELECT id_a, id_b, sim FROM (
              SELECT t1.vec_id AS id_a, t2.vec_id AS id_b,
                     round(list_dot_product(t1.e, t2.e)
                           / (sqrt(list_dot_product(t1.e, t1.e))
                              * sqrt(list_dot_product(t2.e, t2.e))), 6) AS sim
              FROM bk t1 JOIN bk t2
                ON t1.bucket = t2.bucket AND t1.vec_id < t2.vec_id)
            WHERE sim >= {threshold}
        """


def _rademacher_bucket_sql(dim: int, n_planes: int, seed: int,
                           vec: str = "e") -> str:
    """SQL bucket expression replaying rademacher_bucket_col exactly:
    per plane an explicit left-assoc ±e[d] chain (same fold order as
    Spark's zip_with/aggregate), sign test, bit-weighted sum."""
    from news_crawler_spark.operators.similarity import rademacher_signs

    planes = rademacher_signs(dim, n_planes, seed)
    return " + ".join(
        "(CASE WHEN (0.0 "
        + " ".join(f"{'+' if s > 0 else '-'} {vec}[{d + 1}]"
                   for d, s in enumerate(row))
        + f") > 0 THEN {1 << p} ELSE 0 END)"
        for p, row in enumerate(planes))


def _lsh_ann_oracle(dim: int = 64, n_planes: int = 6, n_tables: int = 3,
                    seed: int = 42, k: int = 5) -> str:
    buckets = ", ".join(
        f"{_rademacher_bucket_sql(dim, n_planes, seed + 1000 * t)} AS b{t}"
        for t in range(n_tables))
    collide = " OR ".join(f"q.b{t} = c.b{t}" for t in range(n_tables))
    return f"""
            WITH base AS (
              SELECT vec_id, embedding::DOUBLE[] AS e
              FROM embeddings WHERE vec_id < 500),
            bk AS (SELECT vec_id, e, {buckets} FROM base),
            q AS (SELECT * FROM bk WHERE vec_id < 6),
            cand AS (
              SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     q.e AS qe, c.e AS ce
              FROM q JOIN bk c ON ({collide})
              WHERE q.vec_id <> c.vec_id),
            scored AS (
              SELECT query_id, neighbor_id,
                     round(list_dot_product(qe, ce)
                           / (sqrt(list_dot_product(qe, qe))
                              * sqrt(list_dot_product(ce, ce))), 6) AS sim
              FROM cand)
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rnk
            FROM scored QUALIFY rnk <= {k} ORDER BY query_id, rnk
        """


def q_lsh_ann(spark, sf_dir):
    """Multi-table sign-LSH ANN (operators/similarity.py lsh_ann_topk):
    3 Rademacher-plane tables (sha256-derived ±1 planes, per-table
    seeds — replayable by any engine, unlike the seeded-Gaussian numpy
    signer this operator used before), bucket equi-join per table with
    the query side broadcast, union, exact cosine rerank, per-query
    top-5. Queries = first 6 vectors, corpus = first 500."""
    from news_crawler_spark.operators.similarity import lsh_ann_topk

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 500)
    return (lsh_ann_topk(emb.where(F.col("vec_id") < 6), emb, k=5, dim=64,
                         n_planes=6, n_tables=3)
            .orderBy("query_id", "rnk"))


def q_exact_substr_spans(spark, sf_dir):
    """ExactSubstr-style duplicated-span detection
    (operators/substr.py duplicate_ngram_spans): maximal token spans
    covered by an 8-gram occurring >= 2 times corpus-wide (Lee et al.
    2022), k-grams built row-locally, one exchange on the gram hash,
    one on doc_id. Lifts the reference's whole-article D-family dedup
    (src/secbot/asec.py) to sub-document granularity."""
    from news_crawler_spark.operators import duplicate_ngram_spans

    return duplicate_ngram_spans(_t(spark, sf_dir, "documents"), k=8)


def q_hashed_quality_classifier(spark, sf_dir):
    """fastText-style hashed linear quality gate
    (operators/classifier.py): sha256-bucketed token weights folded
    row-locally (zero exchanges), sigmoid score rounded before the
    keep threshold so the oracle replays the decision."""
    from news_crawler_spark.operators import hashed_classifier_scores

    return hashed_classifier_scores(_t(spark, sf_dir, "documents"))


def q_domain_mixture(spark, sf_dir):
    """Temperature-scaled domain mixture weights
    (operators/mixture.py domain_mixture): tokens^0.3 normalized to
    sampling probabilities + expected token budget per source; one
    map-side-combinable groupBy plus a 1-row broadcast normalizer."""
    from news_crawler_spark.operators import domain_mixture

    return domain_mixture(_t(spark, sf_dir, "documents"))


def q_cluster_quality_keep(spark, sf_dir):
    """Quality-aware near-dup retention: within each MinHash-LSH dup
    cluster (operators/components.py dedup_clusters) keep the longest
    document (n_chars desc, doc_id asc tie-break) — the 'keep best
    version' policy real pipelines apply instead of first-wins. The
    per-cluster argmax is a row_number window over cluster labels
    (clusters are tiny; the window partitions by canon_id)."""
    from pyspark.sql import Window

    from news_crawler_spark.operators.components import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    clusters = dedup_clusters(docs, minhash_lsh_candidates(docs))
    ranked = clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("canon_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return ranked.select(
        "doc_id",
        "canon_id",
        "n_chars",
        (F.row_number().over(w) == 1).alias("keep"),
    )


def q_training_shuffle(spark, sf_dir):
    """Deterministic seed-keyed global shuffle assignment
    (operators/mixture.py training_shuffle): 60-bit sha256 key,
    pmod shard, rank within shard — the reproducible permutation
    materialized before writing training shards."""
    from news_crawler_spark.operators import training_shuffle

    return training_shuffle(_t(spark, sf_dir, "documents"))


def q_semdedup_prune(spark, sf_dir):
    """SemDeDup semantic deduplication (operators/similarity.py
    semantic_dedup, Abbas et al. 2023): zero-shuffle IVF cluster
    assignment (centroids = first 16 vectors, oracle-replayable),
    within-cell cosine only (one self-equi-join on cell, never
    all-pairs), drop any vector with a smaller-id same-cell neighbor
    at rounded cosine >= 0.9. Generalizes the D-family whole-article
    dedup to embedding space."""
    from news_crawler_spark.operators.similarity import semantic_dedup

    return semantic_dedup(_t(spark, sf_dir, "embeddings"), threshold=0.9)


def q_quality_weighted_sample(spark, sf_dir):
    """Score-dependent downsampling (the FineWeb/DCLM recipe): accept
    each document with probability equal to its hashed-classifier
    quality score, using a deterministic sha256 uniform draw keyed on
    doc_id — reproducible end to end, ZERO exchanges (the classifier
    folds row-locally and the draw is row-local arithmetic; the
    divisor 2^60 is a power of two, so u = k / 2^60 is exact scaling
    of an integer both engines round to double identically)."""
    from news_crawler_spark.operators import hashed_classifier_scores

    scored = hashed_classifier_scores(_t(spark, sf_dir, "documents"))
    u = (
        F.conv(
            F.substring(
                F.sha2(F.concat(F.lit("qs:"), F.col("doc_id").cast("string")), 256),
                1, 15),
            16, 10)
        .cast("long")
        .cast("double")
        / F.lit(float(2 ** 60))
    )
    return scored.select(
        "doc_id",
        "score",
        F.round(u, 9).alias("draw"),
        (F.col("score").isNotNull() & (u < F.col("score"))).alias("keep"),
    )


def q_perplexity_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity banding per language
    (operators/quality.py perplexity_buckets, Wenzek et al. 2020):
    tercile cuts from a fixed-width histogram with integer-rank
    thresholds — windows only over the <=64-row-per-lang histogram,
    never a global ntile — and band-by-bin comparison against the
    broadcast cuts, so the decision is engine-exact."""
    from news_crawler_spark.operators.quality import perplexity_buckets

    return perplexity_buckets(_t(spark, sf_dir, "documents"))


def q_c4_line_filter(spark, sf_dir):
    """C4 heuristic cleaning (operators/quality.py c4_clean, Raffel
    et al. 2020 §2.2): documents are given C4-shaped line structure —
    a nav line that fails both the terminal-punctuation and the
    "javascript" badword rule, a real sentence, the body with a
    terminal period, and (on a deterministic doc_id slice) a
    "lorem ipsum" line / a curly-brace config line that poison the
    whole document — then line-filtered and doc-gated, returning each
    doc's kept-line count, keep verdict, and cleaned-text sha."""
    from news_crawler_spark.operators.quality import c4_clean

    docs = _t(spark, sf_dir, "documents")
    lined = docs.select(
        "doc_id",
        F.concat(
            F.lit("Home | nav | javascript required\n"),
            F.lit("This document from "), F.col("source"),
            F.lit(" has a real sentence.\n"),
            F.col("text"), F.lit("."),
            F.when(F.col("doc_id") % 7 == 0,
                   F.lit("\nlorem ipsum dolor sit")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0,
                   F.lit("\nvar cfg = { a: 1 };")).otherwise(F.lit("")),
        ).alias("text"))
    return c4_clean(lined, min_words_per_line=3, min_kept_lines=2)


def q_paragraph_dedup(spark, sf_dir):
    """First-wins paragraph-level exact dedup (operators/paragraphs.py
    paragraph_dedup — RefinedWeb/Dolma-style sub-document pass):
    documents get paragraph structure with a corpus-wide subscribe
    blurb, per-source about/copyright paragraphs, and the unique body;
    the earliest (doc_id, pos) occurrence of each paragraph survives,
    later copies strip, and each doc reports its surviving-character
    ratio plus the sha of its cleaned text."""
    from news_crawler_spark.operators import paragraph_dedup

    docs = _t(spark, sf_dir, "documents")
    parad = docs.select(
        "doc_id",
        F.concat_ws(
            "\n\n",
            F.lit("Subscribe to our newsletter for updates"),
            F.concat(F.lit("About "), F.col("source"),
                     F.lit(" publication")),
            F.col("text"),
            F.concat(F.lit("Copyright 2026 "), F.col("source")),
        ).alias("text"))
    return paragraph_dedup(parad)


def q_dsir_importance(spark, sf_dir):
    """DSIR importance resampling weights (operators/classifier.py
    dsir_logratio, Xie et al. 2023): the Chinese-language slice of the
    corpus is the in-domain target; every document scores the mean
    log-ratio of its hashed unigram+bigram bag under the target vs the
    raw bucket distribution (Laplace-smoothed, 1024 buckets) — the
    weight a pipeline resamples by to tilt a web corpus toward a
    domain."""
    from news_crawler_spark.operators import dsir_logratio

    docs = _t(spark, sf_dir, "documents")
    return dsir_logratio(docs, docs.filter(F.col("lang") == "zh"))


def q_kmeans_clusters(spark, sf_dir):
    """Deterministic Lloyd k-means over the embeddings table
    (operators/kmeans.py kmeans_fit): first-8-by-id seed, 2
    refinement iterations, zero-shuffle literal-centroid assignment
    (ivf_assign) + one (cell, dim) mean groupBy per iteration, every
    ranking on ROUNDED cosine and every centroid mean rounded before
    it becomes a literal — the oracle walks the identical trajectory
    and must land on the identical 500-row final assignment."""
    from news_crawler_spark.operators import kmeans_fit

    return kmeans_fit(_t(spark, sf_dir, "embeddings"), k=8, iters=2)


def q_corpus_report(spark, sf_dir):
    """Corpus curation report: one ROLLUP over (lang, source) giving
    doc counts, token totals, average length, and distinct-text counts
    (the exact-dup-rate signal) at every granularity a curation
    dashboard reads — per (lang, source), per lang, and grand total.
    All map-side-combinable aggregates over one scan; the sha256
    fingerprint reuses the exact-dedup key (operators/dedup.py
    exact_dedup) so 'n_docs - uniq_texts' is exactly the duplicate
    count that pass would strip."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.size(F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                           lambda x: x != F.lit("")))
    base = docs.select(
        "lang", "source", toks.alias("_nt"), "n_chars",
        F.sha2(F.col("text"), 256).alias("_fp"))
    return (
        base.rollup("lang", "source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("_nt").alias("n_tokens"),
             F.round(F.avg("n_chars"), 6).alias("avg_chars"),
             F.countDistinct("_fp").alias("uniq_texts"))
    )


def q_span_dedup(spark, sf_dir):
    """First-wins dedup at span granularity over the north-rule
    interleaved table (operators/paragraphs.py span_dedup): documents
    become (doc_id, spans) via _interleaved_spans, each doc gains a
    sitewide boilerplate text span at offset 0 (shared corpus-wide, so
    only the earliest doc keeps it), and the dedup keys text/link
    spans by text and media spans by media_ref — returning each doc's
    surviving-span counts plus the span-sequence digest of its deduped
    text."""
    from news_crawler_spark.operators import span_dedup

    docs = _t(spark, sf_dir, "documents")
    spans_df = _interleaved_spans(docs)
    # prepend a corpus-wide boilerplate span and shift offsets by 1
    shifted = F.transform(
        "spans",
        lambda s: F.struct(
            s.getField("kind").alias("kind"),
            s.getField("text").alias("text"),
            s.getField("media_ref").alias("media_ref"),
            (s.getField("offset") + 1).cast("int").alias("offset")))
    nav = F.struct(
        F.lit("text").alias("kind"),
        F.lit("subscribe to our newsletter").alias("text"),
        F.lit("").alias("media_ref"),
        F.lit(0).cast("int").alias("offset"))
    with_nav = spans_df.select(
        "doc_id",
        F.concat(F.array(nav), shifted).alias("spans"))
    return span_dedup(with_nav)


def q_edit_distance_verify(spark, sf_dir):
    """Character-level verification of MinHash-LSH candidate pairs:
    the band bucket-join proposes candidates (operators/dedup.py
    minhash_lsh_candidates), then exact Levenshtein similarity
    1 - dist/max(len) — native JVM levenshtein, never Python — keeps
    pairs at >= 0.8. The expensive O(len^2) edit distance runs ONLY on
    the LSH-bounded candidate set, never all pairs — the two-tier
    cheap-filter/exact-verify shape every near-dup pipeline uses. The
    distance is staged behind a Generate barrier so it computes once
    per pair, not once per consuming expression."""
    from news_crawler_spark.operators.dedup import minhash_lsh_candidates

    docs = _t(spark, sf_dir, "documents")
    cands = minhash_lsh_candidates(docs)
    ta = docs.select(F.col("doc_id").alias("id_a"),
                     F.col("text").alias("_ta"))
    tb = docs.select(F.col("doc_id").alias("id_b"),
                     F.col("text").alias("_tb"))
    # the candidate set is SMALL (row count) but the per-row verify is
    # O(len^2): the candidate pairs arrive hash-partitioned on
    # (id_a, id_b) by band_pairs' dedup, AQE coalesces that tiny
    # planner exchange to ONE task, and the whole DP serializes
    # (measured 18.5 s at sf0.1, ~14 of them levenshtein on one
    # task). A hash repartition on the same keys gets elided as
    # already-satisfied, so force an explicit-count ROUND-ROBIN —
    # user-specified, never AQE-coalesced — right before the
    # quadratic stage; it moves only (id, id, text, text) rows.
    n_part = spark.sparkContext.defaultParallelism
    j = (cands.join(ta, "id_a").join(tb, "id_b")
         .repartition(n_part))
    staged = j.select(
        "id_a", "id_b",
        F.explode(F.array(F.struct(
            F.levenshtein("_ta", "_tb").alias("d"),
            F.greatest(F.length("_ta"), F.length("_tb")).alias("m"),
        ))).alias("_s"))
    sim = F.round(F.lit(1.0) - F.col("_s.d") / F.col("_s.m"), 6)
    return staged.select(
        "id_a", "id_b",
        F.col("_s.d").alias("edit_dist"),
        sim.alias("edit_sim"),
        (sim >= 0.8).alias("verified"),
    )


def q_recrawl_intervals(spark, sf_dir):
    """Adaptive recrawl scheduling (operators/recrawl.py
    recrawl_intervals, Cho & Garcia-Molina 2003): the events table
    plays the fetch log — each user_id is a URL, each event a fetch,
    and a non-'view' event type marks an observed change. Per URL:
    the bias-corrected Poisson change-rate estimate and the clamped
    next recrawl interval the frontier's not_before would consume."""
    from news_crawler_spark.operators import recrawl_intervals

    ev = _t(spark, sf_dir, "events")
    sec = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    hist = ev.select(
        F.col("user_id").alias("url_id"),
        sec.alias("fetch_sec"),
        (F.col("event_type") != "view").alias("changed"))
    return recrawl_intervals(hist)


def q_hits_authority(spark, sf_dir):
    """HITS hubs/authorities (operators/hits.py hits_scores,
    Kleinberg 1999) — the companion to pagerank_authority over the
    SAME deterministically hash-synthesized 400-node edge list: 2
    max-normalized, 6dp-rounded iterations (the kmeans_fit
    replayable-trajectory pattern), top-30 authorities with their hub
    scores, ordered by (auth desc, node)."""
    from news_crawler_spark.operators import hits_scores

    ev = _t(spark, sf_dir, "events")
    edges = (
        ev.select(
            F.pmod(F.col("user_id"), F.lit(400)).alias("src"),
            F.pmod(F.col("user_id") * F.lit(2654435761) + F.col("event_id"),
                   F.lit(400)).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    scores = hits_scores(edges, iterations=2)
    return scores.orderBy(F.col("auth").desc_nulls_last(), "node").limit(30)


def q_cdx_index(spark, sf_dir):
    """CDX archive-index generation (sources/warc.py cdx_records):
    each fetched document becomes the (SURT key, 14-digit timestamp,
    url, payload digest, length) row a web archive's index server
    scans — the step that makes a WARC corpus randomly accessible.
    The documents table plays the fetch log: URL synthesized from
    (source, doc_id), capture time-of-day from n_chars, digest =
    sha256(text). Pure native expressions (projection only — zero
    shuffles before the presentation sort)."""
    from news_crawler_spark.sources.warc import cdx_records

    d = _t(spark, sf_dir, "documents")
    s = F.col("n_chars") % 86400
    ts14 = F.concat(
        F.lit("20260101"),
        F.lpad(F.floor(s / 3600).cast("string"), 2, "0"),
        F.lpad((F.floor(s / 60) % 60).cast("string"), 2, "0"),
        F.lpad((s % 60).cast("string"), 2, "0"))
    recs = d.select(
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/docs/"), F.col("doc_id")).alias("url"),
        ts14.alias("ts14"),
        F.sha2(F.col("text"), 256).alias("digest"),
        F.col("n_chars").alias("length"))
    return cdx_records(recs).orderBy("surt", "url")


def q_host_budget_allocation(spark, sf_dir):
    """Per-host fetch-budget apportionment (crawl/budget.py
    allocate_host_budget): a round's 10,000 fetch slots split across
    hosts by largest-remainder (Hamilton) apportionment over priority
    mass — sums to the budget EXACTLY, every host keeps a floor slot,
    ties break on host name so resumed rounds recompute the identical
    plan. The documents table plays the frontier aggregate: host from
    source, mass = total pending chars. The remainder rank uses the
    two-phase range-partition pattern, never a one-task window."""
    from news_crawler_spark.crawl.budget import allocate_host_budget

    d = _t(spark, sf_dir, "documents")
    hosts = d.groupBy(
        F.concat(F.col("source"), F.lit(".example.com")).alias("host")
    ).agg(F.sum("n_chars").alias("mass"))
    return allocate_host_budget(hosts, 10000).orderBy("host")


def q_crawl_trap_hosts(spark, sf_dir):
    """Crawl-trap detection (crawl/traps.py trap_signals): hosts whose
    URL space explodes without new templates — the guard a
    link-following frontier needs against calendar/session-id traps.
    The events table plays the seen-URL log: five synthetic hosts mint
    paths from per-event counters (one template, hundreds of paths —
    traps), the rest serve a fixed letter-keyed page set (template ==
    path — organic). One map-side-combinable groupBy on host."""
    from news_crawler_spark.crawl.traps import trap_signals

    ev = _t(spark, sf_dir, "events")
    urls = ev.select(
        F.concat(F.lit("h"),
                 (F.col("user_id") % 37).cast("string")).alias("host"),
        F.when(
            F.col("user_id") % 37 < 5,
            F.concat(F.lit("/cal/"), (F.col("event_id") % 500).cast("string"),
                     F.lit("/d/"), (F.col("event_id") % 31).cast("string")))
        .otherwise(F.concat(
            F.lit("/sec/"),
            F.expr("substr('abcdefg', cast(user_id % 7 as int) + 1, 1)"),
            F.lit("/page/"),
            F.expr("substr('vwxyz', cast(event_id % 5 as int) + 1, 1)")))
        .alias("path"))
    return trap_signals(urls).orderBy("host")


def q_anchor_text_topk(spark, sf_dir):
    """Per-target anchor-text profile (operators/anchors.py
    anchor_text_profile): the terms the web uses to describe each
    link target — the ranking/pretraining signal the reference drops
    when it keeps only (title, href). Documents play the edge list:
    each doc links to a hash-assigned host, anchor = its first 48
    chars. One Generate + one map-side-combinable groupBy + a
    per-target (never global) top-k window."""
    from news_crawler_spark.operators.anchors import anchor_text_profile

    d = _t(spark, sf_dir, "documents")
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.concat(F.lit("h"), (F.col("n_chars") % 40).cast("string"))
         .alias("dst"),
        F.substring(F.col("text"), 1, 48).alias("anchor"))
    prof = anchor_text_profile(edges, top_terms=5)
    return prof.orderBy("dst", "rank")


def q_pq_ann(spark, sf_dir):
    """Product-quantization ANN (operators/pq.py, Jégou et al. 2011)
    — the compression half of IVF-PQ: vectors become m=4 codebook
    codes (zero-shuffle encode, literal codebooks — the ivf_assign
    contract) and queries rank the corpus by asymmetric distance over
    CODES, so the corpus side of the search moves 4 ints per vector
    instead of 64 floats. Per-subspace distances and the final sum
    are 6dp-rounded with id tiebreaks, so the ranking replays
    value-exactly in SQL. Queries = first 4 vectors, k=5."""
    from news_crawler_spark.operators.pq import pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return (pq_topk(emb.where(F.col("vec_id") < 4), emb, k=5, m=4, ks=8)
            .orderBy("query_id", "rnk"))


def q_ivf_pq_ann(spark, sf_dir):
    """Composed IVF-PQ (operators/pq.py ivf_pq_topk) — the full index
    a 10^9-vector deployment runs: coarse cell filter first
    (ivf_assign, seed centroids = first 16 vectors), ADC over codes
    only inside each query's 4 probed cells. The corpus ships exactly
    (id, cell, codes) into the probe join — one Project/Generate pass,
    zero corpus exchanges (plan-asserted tests/test_pq.py). Cells,
    codes, and ranking all replay value-exactly in SQL (6dp rounding +
    id ties at every ordering). Queries = first 8 vectors, k=5.

    Bench-scale note: at sandbox sf the wall time is dominated by the
    per-execution compile of the literal centroid+codebook expression
    trees (~2k corpus rows do negligible data work; profiled: the
    assignment/encode projections cost seconds EMPTY). That constant
    amortizes to zero at real corpus sizes, where the win is the
    point: the ADC stage touches nprobe/n_centroids of the corpus and
    the corpus pass stays Project-only."""
    from news_crawler_spark.operators.pq import ivf_pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return (ivf_pq_topk(emb.where(F.col("vec_id") < 8), emb, k=5,
                        n_centroids=16, nprobe=4, m=4, ks=8)
            .orderBy("query_id", "rnk"))


def q_bpe_merges(spark, sf_dir):
    """Distributed BPE tokenizer training (operators/bpe.py bpe_train,
    Sennrich et al. 2016): 3 merge steps over the corpus word table —
    pair counts are one partial-agg groupBy per step, the argmax merge
    is a 1-row driver literal (the kmeans/hits replayable-trajectory
    contract), and the paren-wrapped symbol encoding makes literal
    replacement exactly a greedy merge pass in any engine. Integer
    counts + lexicographic ties: no floating point anywhere."""
    from news_crawler_spark.operators.bpe import bpe_train

    d = _t(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.lower(F.col("text")),
                                   "[^a-z0-9]+")).alias("word"))
        .where((F.length("word") >= 2) & (F.length("word") <= 12))
        .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))
    return bpe_train(words, n_merges=3).orderBy("step")


def q_trustrank_scores(spark, sf_dir):
    """TrustRank spam demotion (operators/trustrank.py, Gyöngyi et
    al. 2004): biased PageRank whose teleport flows only to a trusted
    seed set, over the SAME hash-synthesized 400-node edge list as
    pagerank_authority/hits_authority — seeds = every 50th node, 2
    iterations, top-30 by trust. Integer micro-trust arithmetic (the
    linkrank contract): bit-exact at any partitioning, SQL-replayable."""
    from news_crawler_spark.operators.trustrank import trustrank

    ev = _t(spark, sf_dir, "events")
    edges = (
        ev.select(
            F.pmod(F.col("user_id"), F.lit(400)).alias("src"),
            F.pmod(F.col("user_id") * F.lit(2654435761) + F.col("event_id"),
                   F.lit(400)).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct())
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node"))).distinct())
    seeds = nodes.where(F.col("node") % 50 == 0)
    t = trustrank(edges, seeds, iterations=2)
    return t.orderBy(F.col("trust_micro").desc(), "node").limit(30)


def q_corpus_snapshot_diff(spark, sf_dir):
    """Between-snapshots corpus delta (tables/diff.py snapshot_diff):
    one full-outer equi-join on doc_id comparing content digests —
    the added/removed/changed/unchanged stream an incremental export
    ships and the recrawl estimator consumes. Two synthetic versions
    of the documents table: v1 drops n_chars%11 docs, v2 drops
    n_chars%13 docs and rewrites n_chars%7 texts."""
    from news_crawler_spark.tables.diff import snapshot_diff

    d = _t(spark, sf_dir, "documents")
    dig = F.sha2(F.col("text"), 256)
    old = (d.where(F.col("n_chars") % 11 != 0)
           .select("doc_id", dig.alias("digest")))
    new = (d.where(F.col("n_chars") % 13 != 0)
           .select("doc_id",
                   F.when(F.col("n_chars") % 7 == 0,
                          F.sha2(F.concat(F.col("text"), F.lit("v2")), 256))
                   .otherwise(dig).alias("digest")))
    return snapshot_diff(old, new, "doc_id").orderBy("doc_id")


def q_bpe_fertility(spark, sf_dir):
    """Tokenizer fertility evaluation: learn 3 BPE merges
    (operators/bpe.py bpe_train), segment the word table with them
    (bpe_segment — the zero-shuffle inference half), and report the
    corpus compression the tokenizer buys — chars/token and
    tokens/word over occurrence-weighted words. The metric every
    tokenizer ablation tracks; the oracle replays the full
    train+segment chain from the shared unrolled-merge SQL."""
    from news_crawler_spark.operators.bpe import bpe_segment, bpe_train

    d = _t(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.lower(F.col("text")),
                                   "[^a-z0-9]+")).alias("word"))
        .where((F.length("word") >= 2) & (F.length("word") <= 12))
        .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))
    traj = bpe_train(words, n_merges=3).orderBy("step").collect()
    merges = [tuple(r.pair.split(" ")) for r in traj]
    seg = bpe_segment(words, merges)
    agg = seg.agg(
        F.sum("cnt").alias("n_words"),
        F.sum(F.size("pieces") * F.col("cnt")).alias("n_tokens"),
        F.sum(F.length("word") * F.col("cnt")).alias("n_chars"))
    return agg.select(
        "n_words", "n_tokens", "n_chars",
        F.round(F.col("n_chars") / F.col("n_tokens"), 6)
         .alias("chars_per_token"),
        F.round(F.col("n_tokens") / F.col("n_words"), 6)
         .alias("tokens_per_word"))


def q_label_propagation(spark, sf_dir):
    """Label-propagation communities (operators/lpa.py, Raghavan et
    al. 2007) over the same hash-synthesized 400-node edge list as
    pagerank/hits/trustrank: 2 synchronous rounds (deterministic ties
    to the smallest label — replayable-trajectory contract), then the
    top-20 community sizes, the report a mirror-farm detection pass
    reads. One join + one partial-agg groupBy + a per-node (never
    global) window per round."""
    from news_crawler_spark.operators.lpa import (
        community_sizes,
        label_propagation,
    )

    ev = _t(spark, sf_dir, "events")
    edges = (
        ev.select(
            F.pmod(F.col("user_id"), F.lit(400)).alias("src"),
            F.pmod(F.col("user_id") * F.lit(2654435761) + F.col("event_id"),
                   F.lit(400)).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct())
    return community_sizes(label_propagation(edges, iterations=2), top=20)


def q_sitemap_index_expand(spark, sf_dir):
    """Two-level sitemap expansion (sources/sitemapindex.py): per
    source, THREE child urlsets are synthesized from the documents
    table and listed in a synthesized <sitemapindex>; the index parses
    natively (from_xml), the child bodies join back on sitemap_loc,
    and every urlset parses in one distributed Generate pass — the
    index's lastmod rides along as the scheduler's freshness hint.
    The oracle recomputes every expanded row from documents directly."""
    from news_crawler_spark.sources.sitemapindex import (
        expand_index,
        parse_sitemap_index,
    )

    docs = _t(spark, sf_dir, "documents")
    shard = F.pmod(F.col("doc_id"), F.lit(3))
    item = F.concat(
        F.lit("<url><loc>http://"), F.col("source"), F.lit(".test/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("</loc><lastmod>2025-02-"),
        F.lpad((F.pmod(F.col("doc_id"), F.lit(27)) + 1).cast("string"),
               2, "0"),
        F.lit("</lastmod></url>"))
    children = (
        docs.groupBy(F.col("source").alias("src"), shard.alias("shard"))
        .agg(F.concat(
            F.lit("<urlset>"),
            F.array_join(F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col("doc_id"), item.alias("x")))),
                lambda s: s.getField("x")), ""),
            F.lit("</urlset>")).alias("xml"))
        .withColumn("sitemap_loc", F.concat(
            F.lit("http://"), F.col("src"), F.lit(".test/sitemap-"),
            F.col("shard").cast("string"), F.lit(".xml"))))
    entry = F.concat(
        F.lit("<sitemap><loc>"), F.col("sitemap_loc"),
        F.lit("</loc><lastmod>2025-03-0"),
        (F.col("shard") + 1).cast("string"),
        F.lit("</lastmod></sitemap>"))
    index = children.groupBy("src").agg(F.concat(
        F.lit("<sitemapindex>"),
        F.array_join(F.transform(
            F.array_sort(F.collect_list(
                F.struct(F.col("shard"), entry.alias("x")))),
            lambda s: s.getField("x")), ""),
        F.lit("</sitemapindex>")).alias("xml"))
    idx = parse_sitemap_index(index.select("xml"))
    out = expand_index(idx, children.select("sitemap_loc", "xml"))
    return out.orderBy("loc")


def q_effective_crawl_rate(spark, sf_dir):
    """Politeness × budget composition: the slots a host can actually
    consume in a 300 s round = min(its Hamilton budget share,
    round_seconds / its robots Crawl-delay) — sources/robots.py and
    crawl/budget.py composed into the single number selection
    enforces. delay_limited marks hosts whose robots policy, not the
    budget, binds (the hosts where buying more budget does nothing).
    Robots bodies are the q_robots_parse synthetic fixture; mass =
    pending chars per host."""
    from news_crawler_spark.crawl.budget import allocate_host_budget
    from news_crawler_spark.sources.robots import parse_robots

    d = _t(spark, sf_dir, "documents")
    hosts = d.select("source").distinct()
    body = F.concat(
        F.lit("# synthetic policy\nUser-agent: otherbot\nDisallow: /bot-"),
        F.col("source"),
        F.lit("\n\nUser-agent: *\nDisallow: /priv-"), F.col("source"),
        F.lit("  # inline\n"),
        F.when(F.length("source") % 2 == 0,
               F.concat(F.lit("Crawl-delay: "),
                        (F.length("source") % 5 + 1).cast("string"),
                        F.lit("\n"))).otherwise(F.lit("")),
        F.lit("\nUser-agent: *\nDisallow: /x\n"),
    )
    robots = parse_robots(hosts.select("source", body.alias("body")),
                          host_col="source").select("host", "crawl_delay")
    mass = d.groupBy(F.col("source").alias("host")).agg(
        F.sum("n_chars").alias("mass"))
    alloc = allocate_host_budget(mass, 10000)
    j = alloc.join(robots, "host", "left")
    cap = F.floor(F.lit(300.0) / F.col("crawl_delay")).cast("long")
    eff = (F.when(F.col("crawl_delay").isNull(), F.col("alloc"))
           .otherwise(F.least(F.col("alloc"), cap)))
    return j.select(
        "host", "crawl_delay", "alloc", eff.alias("effective"),
        (eff < F.col("alloc")).alias("delay_limited")).orderBy("host")


def q_robots_sitemap_discovery(spark, sf_dir):
    """Sitemap discovery from robots.txt (sources/sitemapindex.py
    robots_sitemaps, RFC 9309 §2.3): the Sitemap: directives live
    host-wide outside user-agent groups, and extracting them is how a
    crawl finds a host's self-declared frontier with zero page
    fetches — the first link of the robots → sitemap index → urlset
    chain. Bodies synthesized per source with a lowercase directive
    and a commented decoy; one explode + one anchored extract."""
    from news_crawler_spark.sources.sitemapindex import robots_sitemaps

    hosts = _t(spark, sf_dir, "documents").select("source").distinct()
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /x\nSitemap: http://"),
        F.col("source"),
        F.lit(".test/sitemap-index.xml\nsitemap: http://"),
        F.col("source"),
        F.lit(".test/news.xml\n# Sitemap: http://ignored.test/x.xml\n"))
    return robots_sitemaps(
        hosts.select(F.col("source").alias("host"), body.alias("body"))
    ).orderBy("host", "sitemap_url")


def q_inverted_index(spark, sf_dir):
    """Positional inverted-index construction (operators/postings.py
    build_postings): term → 'doc:pos,pos;doc:pos' posting lists with
    document frequency — what a search tier builds so the reference's
    grep-at-query-time keyword filters become index lookups at 10^10
    pages. One posexplode (positions free from the ordinal, no
    window) + two partial-combinable groupBys whose shuffle keys ARE
    the index layout. min_df=5 prunes the hapax tail."""
    from news_crawler_spark.operators.postings import build_postings

    d = _t(spark, sf_dir, "documents")
    return build_postings(d, min_df=5).orderBy("term")


def q_mirror_content(spark, sf_dir):
    """Mirrored-content detection: the same content class served from
    more than one host — the dedup signal crawls use to collapse
    mirror farms into one canonical host before spending budget.
    Hosts and content classes are synthesized fixtures (host from
    doc_id, class digest from a length bucket) so the grouping has
    real multi-host classes to find; ONE map-side-combinable groupBy
    on the digest."""
    d = _t(spark, sf_dir, "documents")
    rows = d.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 29).cast("string"))
         .alias("host"),
        F.sha2((F.col("n_chars") % 97).cast("string"), 256).alias("digest"))
    g = rows.groupBy("digest").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
        F.array_join(F.array_sort(F.collect_set("host")), ",")
         .alias("hosts"))
    return g.where(F.col("n_hosts") > 1).orderBy("digest")


def q_weighted_sample_topk(spark, sf_dir):
    """Exact-k weighted sampling without replacement (operators/
    wsample.py, Efraimidis & Spirakis 2006): key = u^(1/w), top-k
    keys = the sample — the mixture-with-a-row-budget companion to
    quality_weighted_sample's accept/reject. u is the repo-standard
    sha 60-bit/2^60 engine-exact draw; the pow rounds to 12 dp with
    id tiebreaks so libm last-ulp divergence can't flip membership.
    Documents weighted by n_chars, k=50; plans as
    TakeOrderedAndProject, never a global sort."""
    from news_crawler_spark.operators.wsample import weighted_sample_k

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample_k(d, "n_chars", 50, "doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order IS the driver's evidence window: the CORRECTNESS
    gate evaluates the first 50 entries. Round-6 rotation (minimal —
    this is the optimization round, every change is
    result-preserving): the r5 window is kept except that
    ``quality_repetition`` and ``pagerank_authority`` rotate IN
    (their operator internals changed this round — the row-local
    repetition rewrite and the loop-invariant checkpoint pins — so
    per the window policy they re-attest), displacing
    ``domain_mixture`` and ``training_shuffle`` (r05-attested, code
    untouched since) to just past the marker. Round-5 rotation
    rationale for the rest: (1) the 33 round-4 post-freeze additions;
    (2) r5's new queries; (3) r5 operator-code changes; (4) oldest
    r03 attestations as padding. Every entry past 50 carries a green
    CORRECTNESS_r03/r04/r05 row on code untouched since (except the
    four post-r5-freeze tail entries, which remain pytest-attested)."""
    return {
        # -- (1) round-4 post-freeze additions: first driver rows --
        "exact_substr_spans": q_exact_substr_spans,
        "hashed_quality_classifier": q_hashed_quality_classifier,
        # -- (r6) operator code changed this round: re-attest --
        "quality_repetition": q_quality_repetition,
        "pagerank_authority": q_pagerank_authority,
        "cluster_quality_keep": q_cluster_quality_keep,
        "semdedup_prune": q_semdedup_prune,
        "quality_weighted_sample": q_quality_weighted_sample,
        "perplexity_buckets": q_perplexity_buckets,
        "c4_line_filter": q_c4_line_filter,
        "paragraph_dedup": q_paragraph_dedup,
        "dsir_importance": q_dsir_importance,
        "kmeans_clusters": q_kmeans_clusters,
        "corpus_report": q_corpus_report,
        "span_dedup": q_span_dedup,
        "edit_distance_verify": q_edit_distance_verify,
        "recrawl_intervals": q_recrawl_intervals,
        "hits_authority": q_hits_authority,
        "cdx_index": q_cdx_index,
        "host_budget_allocation": q_host_budget_allocation,
        "crawl_trap_hosts": q_crawl_trap_hosts,
        "anchor_text_topk": q_anchor_text_topk,
        "pq_ann": q_pq_ann,
        "bpe_merges": q_bpe_merges,
        "trustrank_scores": q_trustrank_scores,
        "corpus_snapshot_diff": q_corpus_snapshot_diff,
        "bpe_fertility": q_bpe_fertility,
        "label_propagation": q_label_propagation,
        "sitemap_index_expand": q_sitemap_index_expand,
        "effective_crawl_rate": q_effective_crawl_rate,
        "robots_sitemap_discovery": q_robots_sitemap_discovery,
        "inverted_index": q_inverted_index,
        "mirror_content": q_mirror_content,
        "weighted_sample_topk": q_weighted_sample_topk,
        # -- (2) new this round --
        "ivf_pq_ann": q_ivf_pq_ann,
        "lsh_ann": q_lsh_ann,
        # -- (3) operator code changed this round after attestation --
        "gopher_gate": q_gopher_gate,
        "lm_perplexity": q_lm_perplexity,
        "boilerplate_lines": q_boilerplate_lines,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "minhash_jaccard_est": q_minhash_jaccard_est,
        "training_pipeline": q_training_pipeline,
        "incremental_dedup": q_incremental_dedup,
        "jaccard_token_pairs": q_jaccard_token_pairs,
        "decontamination": q_decontamination,
        # -- (4) oldest r03 attestations, code untouched — padding --
        "sim_cosine_topk": q_sim_cosine_topk,
        "dup_clusters": q_dup_clusters,
        "ivf_ann": q_ivf_ann,
        "dedup_simhash": q_dedup_simhash,
        "embedding_near_dup": q_embedding_near_dup,
        "winnow_fingerprints": q_winnow_fingerprints,
        # ---- driver gate window ends at position 50 ----
        # -- r04-green, code untouched since --
        "bigram_collocations": q_bigram_collocations,
        "salted_agg": q_salted_agg,
        "salted_join_revenue": q_salted_join_revenue,
        "table_digest": q_table_digest,
        "dedup_exact": q_dedup_exact,
        "fingerprint": q_fingerprint,
        "sample_stratified": q_sample_stratified,
        "sample_k_per_group": q_sample_k_per_group,
        "vocab_topk": q_vocab_topk,
        "lang_id": q_lang_id,
        "binary_meta": q_binary_meta,
        "token_modes": q_token_modes,
        "text_stats": q_text_stats,
        "unpivot_metrics": q_unpivot_metrics,
        "f1_date_range_filter": q_f1_date_range_filter,
        "f3_keyword_filter": q_f3_keyword_filter,
        "f4_exclusion_filter": q_f4_exclusion_filter,
        "f6_validity_filter": q_f6_validity_filter,
        "p5_defang_normalize": q_p5_defang_normalize,
        "p6_ip_validation": q_p6_ip_validation,
        "p7_url_split": q_p7_url_split,
        "p9_sha2_key": q_p9_sha2_key,
        "x1_ioc_extract_defanged": q_x1_ioc_extract_defanged,
        "x1b_ioc_canonical": q_x1b_ioc_canonical,
        "x2_word_extract_explode": q_x2_word_extract_explode,
        "d1_first_wins_dedup": q_d1_first_wins_dedup,
        "l4_topk_per_group": q_l4_topk_per_group,
        "frontier_topk_selection": q_frontier_topk_selection,
        "j1_antijoin": q_j1_antijoin,
        "j2_semijoin": q_j2_semijoin,
        "u2_union_distinct": q_u2_union_distinct,
        "u3_except": q_u3_except,
        "u4_intersect": q_u4_intersect,
        "l1_sort_limit": q_l1_sort_limit,
        "a1_counts_per_kind": q_a1_counts_per_kind,
        "a2_group_metrics": q_a2_group_metrics,
        "agg_rollup": q_agg_rollup,
        "tpch_q1": q_tpch_q1,
        "w_running_sum": q_w_running_sum,
        "dt_trunc_month": q_dt_trunc_month,
        "json_extract": q_json_extract,
        "sequence_packing_sharded": q_sequence_packing_sharded,
        "spans_quality_pipeline": q_spans_quality_pipeline,
        "url_normalize": q_url_normalize,
        "interleaved_spans_stats": q_interleaved_spans_stats,
        # rotated out of the window this round (r05-attested, code
        # untouched; displaced by the two re-attesting r6 changes)
        "domain_mixture": q_domain_mixture,
        "training_shuffle": q_training_shuffle,
        "tfidf_bm25": q_tfidf_bm25,
        # -- r03-green, code untouched since --
        "range_join": q_range_join,
        "sessionize": q_sessionize,
        "sliding_window_agg": q_sliding_window_agg,
        "session_window_agg": q_session_window_agg,
        "s2_rss_parse": q_s2_rss_parse,
        "map_ops": q_map_ops,
        "p2_advisory_parse": q_p2_advisory_parse,
        "join3_revenue": q_join3_revenue,
        "asof_join": q_asof_join,
        "pivot": q_pivot,
        "cube": q_cube,
        "percentiles": q_percentiles,
        "korean_date_parse": q_korean_date_parse,
        "sid_assignment": q_sid_assignment,
        "digest_plan": q_digest_plan,
        "window_funcs": q_window_funcs,
        "array_ops": q_array_ops,
        "string_funcs": q_string_funcs,
        "grouping_sets": q_grouping_sets,
        "doc_pipeline": q_doc_pipeline,
        "ioc_pattern_diff": q_ioc_pattern_diff,
        "sequence_packing": q_sequence_packing,
        "sitemap_parse": q_sitemap_parse,
        "robots_parse": q_robots_parse,
        "freshness_priority": q_freshness_priority,
        "pii_redact": q_pii_redact,
        "doc_chunking": q_doc_chunking,
        "hll_ndv": q_hll_ndv,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "histogram_quantiles": q_histogram_quantiles,
        "event_correlation": q_event_correlation,
        # -- (5) new after the round-5 window froze: pytest-oracle
        #    evidence this round, rotate into the window next round --
        "script_mix": q_script_mix,
        "bloom_decontamination": q_bloom_decontamination,
        "redirect_resolution": q_redirect_resolution,
        "stratified_budget_sample": q_stratified_budget_sample,
    }


_BPE_CHAIN_SQL = """w0 AS (
              SELECT word, count(*) AS cnt FROM (
                SELECT unnest(string_split_regex(lower(text),
                                                 '[^a-z0-9]+')) AS word
                FROM documents)
              WHERE len(word) BETWEEN 2 AND 12 GROUP BY word),
            s0 AS (SELECT regexp_replace(word, '(.)', '(\\1)', 'g') AS sym,
                          cnt FROM w0),
            l0 AS (SELECT regexp_extract_all(sym, '\\(([^)]*)\\)', 1) AS l,
                          cnt FROM s0),
            pc1 AS (SELECT l[i] || ' ' || l[i+1] AS pair,
                           CAST(sum(cnt) AS BIGINT) AS c
                    FROM l0, unnest(range(1, len(l))) AS t(i) GROUP BY 1),
            m1 AS (SELECT pair, c, split_part(pair, ' ', 1) AS a,
                          split_part(pair, ' ', 2) AS b
                   FROM pc1 ORDER BY c DESC, pair LIMIT 1),
            s1 AS (SELECT replace(sym, '('||m1.a||')('||m1.b||')',
                                  '('||m1.a||m1.b||')') AS sym, cnt
                   FROM s0, m1),
            v1 AS (SELECT count(DISTINCT s) AS vs FROM (
                     SELECT unnest(regexp_extract_all(
                       sym, '\\(([^)]*)\\)', 1)) AS s FROM s1)),
            l1 AS (SELECT regexp_extract_all(sym, '\\(([^)]*)\\)', 1) AS l,
                          cnt FROM s1),
            pc2 AS (SELECT l[i] || ' ' || l[i+1] AS pair,
                           CAST(sum(cnt) AS BIGINT) AS c
                    FROM l1, unnest(range(1, len(l))) AS t(i) GROUP BY 1),
            m2 AS (SELECT pair, c, split_part(pair, ' ', 1) AS a,
                          split_part(pair, ' ', 2) AS b
                   FROM pc2 ORDER BY c DESC, pair LIMIT 1),
            s2 AS (SELECT replace(sym, '('||m2.a||')('||m2.b||')',
                                  '('||m2.a||m2.b||')') AS sym, cnt
                   FROM s1, m2),
            v2 AS (SELECT count(DISTINCT s) AS vs FROM (
                     SELECT unnest(regexp_extract_all(
                       sym, '\\(([^)]*)\\)', 1)) AS s FROM s2)),
            l2 AS (SELECT regexp_extract_all(sym, '\\(([^)]*)\\)', 1) AS l,
                          cnt FROM s2),
            pc3 AS (SELECT l[i] || ' ' || l[i+1] AS pair,
                           CAST(sum(cnt) AS BIGINT) AS c
                    FROM l2, unnest(range(1, len(l))) AS t(i) GROUP BY 1),
            m3 AS (SELECT pair, c, split_part(pair, ' ', 1) AS a,
                          split_part(pair, ' ', 2) AS b
                   FROM pc3 ORDER BY c DESC, pair LIMIT 1),
            s3 AS (SELECT replace(sym, '('||m3.a||')('||m3.b||')',
                                  '('||m3.a||m3.b||')') AS sym, cnt
                   FROM s2, m3),
            v3 AS (SELECT count(DISTINCT s) AS vs FROM (
                     SELECT unnest(regexp_extract_all(
                       sym, '\\(([^)]*)\\)', 1)) AS s FROM s3))"""


def oracle_sql() -> dict[str, str]:
    return {
        "f1_date_range_filter": """
            SELECT o_orderkey, o_custkey, o_totalprice,
                   CAST(o_orderdate AS DATE) AS o_date
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1996-01-01'
        """,
        "f3_keyword_filter": """
            SELECT doc_id, lang, source FROM documents
            WHERE regexp_matches(lower(text), '(query|join|window)')
        """,
        "f4_exclusion_filter": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE c_mktsegment NOT IN ('BUILDING','AUTOMOBILE')
              AND c_name NOT LIKE '%00%'
        """,
        "f6_validity_filter": """
            SELECT event_type, count(*) AS n FROM events
            WHERE trim(event_type) <> '' AND value IS NOT NULL AND value >= 0
            GROUP BY event_type
        """,
        "p5_defang_normalize": """
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(source || '[.]test[:]8080/' || lang,
                                    '\\[\\.\\]', '.', 'g'),
                     '\\[:\\]', ':', 'g') AS normalized
            FROM documents
        """,
        "p6_ip_validation": """
            SELECT event_id,
                   (event_id % 300) || '.' || (user_id % 300) || '.' ||
                   (CAST(floor(value) AS BIGINT) % 300) || '.7' AS ip
            FROM events
            WHERE regexp_matches(
                (event_id % 300) || '.' || (user_id % 300) || '.' ||
                (CAST(floor(value) AS BIGINT) % 300) || '.7',
                '^(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\\.(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\\.(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\\.(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])$')
        """,
        "p7_url_split": """
            WITH u AS (
              SELECT doc_id,
                     'http://' || source || '.test/docs/' || lang || '?id=' || doc_id AS url
              FROM documents)
            SELECT doc_id,
                   regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
                   coalesce(nullif(regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1), ''), '/') AS path,
                   regexp_extract(url, '\\?([^#]*)', 1) AS query
            FROM u
        """,
        "p9_sha2_key": """
            SELECT c_custkey, sha256(c_name || '|' || CAST(c_custkey AS VARCHAR)) AS key_hash
            FROM customer
        """,
        "x1_ioc_extract_defanged": """
            WITH t AS (
              SELECT CAST(event_id AS VARCHAR) AS doc_id,
                     'beacon to 10[.]0[.]' || (event_id % 256) || '[.]' || (user_id % 256) ||
                     ' via hxxps[:]//c2-' || event_type ||
                     '.example/x plus junk 999.999.999.999x' AS text
              FROM events),
            extracted AS (
              SELECT doc_id, 'ip' AS kind,
                     unnest(regexp_extract_all(text, '\\b(?:\\d{1,3}(?:\\.|\\[\\.\\])){3}\\d{1,3}\\b')) AS raw
              FROM t
              UNION ALL
              SELECT doc_id, 'hash' AS kind,
                     unnest(regexp_extract_all(text, '\\b[a-fA-F0-9]{64}\\b|\\b[a-fA-F0-9]{40}\\b|\\b[a-fA-F0-9]{32}\\b')) AS raw
              FROM t
              UNION ALL
              SELECT doc_id, 'url' AS kind,
                     unnest(regexp_extract_all(text, '\\bh(?:xx|tt)ps?(?::|\\[:\\])//[^\\s"''<>]+')) AS raw
              FROM t)
            SELECT DISTINCT doc_id, kind,
                   regexp_replace(regexp_replace(regexp_replace(raw,
                       '\\[\\.\\]', '.', 'g'), '\\[:\\]', ':', 'g'),
                       '\\bhxxp', 'http', 'g') AS value
            FROM extracted
        """,
        "x1b_ioc_canonical": """
            WITH t AS (
              SELECT CAST(event_id AS VARCHAR) AS doc_id,
                     'conn from 10.0.' || (event_id % 256) || '.' ||
                     (user_id % 256) || ':' || (1024 + event_id % 40000) ||
                     ' bad 999.1.2.3 defanged 1[.]2[.]3[.]4 via HTTP://C2-' ||
                     event_type || '.example:8443/p?x=1 drop ' ||
                     sha256(event_type) || ' md5 ' ||
                     substr(sha256('m' || event_type), 1, 32) || ' end' AS text
              FROM events),
            extracted AS (
              SELECT doc_id, 'ip' AS kind,
                     unnest(regexp_extract_all(text,
                       '\\b(?:(?:25[0-5]|2[0-4]\\d|1?\\d{1,2})\\.){3}(?:25[0-5]|2[0-4]\\d|1?\\d{1,2})\\b')) AS value
              FROM t
              UNION ALL
              SELECT doc_id, 'url' AS kind,
                     unnest(regexp_extract_all(text,
                       '(?i)https?://[A-Za-z0-9\\-_\\.]+(?::[0-9]{1,5})?(?:/[^\\s''"<>]*)?')) AS value
              FROM t
              UNION ALL
              SELECT doc_id, 'hash' AS kind,
                     unnest(regexp_extract_all(text,
                       '\\b[a-fA-F0-9]{64}\\b|\\b[a-fA-F0-9]{40}\\b|\\b[a-fA-F0-9]{32}\\b')) AS value
              FROM t)
            SELECT DISTINCT doc_id, kind, value FROM extracted
        """,
        "ioc_pattern_diff": """
            WITH t AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     text || ' ping 172[.]16[.]' || (doc_id % 256) ||
                     '[.]9 bad 999.88.' || (doc_id % 100) ||
                     '.1 up HTTPS://Cdn-' || lang ||
                     '.example:8443/a?q=2 mixed hxxps[:]//c2-' || lang ||
                     '.example/x shared 10.0.' || (doc_id % 199) || '.7 tail'
                     AS text
              FROM documents),
            loose_raw AS (
              SELECT doc_id, 'ip' AS kind,
                     unnest(regexp_extract_all(text, '\\b(?:\\d{1,3}(?:\\.|\\[\\.\\])){3}\\d{1,3}\\b')) AS raw
              FROM t
              UNION ALL
              SELECT doc_id, 'hash' AS kind,
                     unnest(regexp_extract_all(text, '\\b[a-fA-F0-9]{64}\\b|\\b[a-fA-F0-9]{40}\\b|\\b[a-fA-F0-9]{32}\\b')) AS raw
              FROM t
              UNION ALL
              SELECT doc_id, 'url' AS kind,
                     unnest(regexp_extract_all(text, '\\bh(?:xx|tt)ps?(?::|\\[:\\])//[^\\s"''<>]+')) AS raw
              FROM t),
            loose AS (
              SELECT DISTINCT doc_id, kind,
                     regexp_replace(regexp_replace(regexp_replace(raw,
                         '\\[\\.\\]', '.', 'g'), '\\[:\\]', ':', 'g'),
                         '\\bhxxp', 'http', 'g') AS value
              FROM loose_raw),
            canon AS (
              SELECT DISTINCT doc_id, kind, value FROM (
                SELECT doc_id, 'ip' AS kind,
                       unnest(regexp_extract_all(text,
                         '\\b(?:(?:25[0-5]|2[0-4]\\d|1?\\d{1,2})\\.){3}(?:25[0-5]|2[0-4]\\d|1?\\d{1,2})\\b')) AS value
                FROM t
                UNION ALL
                SELECT doc_id, 'url' AS kind,
                       unnest(regexp_extract_all(text,
                         '(?i)https?://[A-Za-z0-9\\-_\\.]+(?::[0-9]{1,5})?(?:/[^\\s''"<>]*)?')) AS value
                FROM t
                UNION ALL
                SELECT doc_id, 'hash' AS kind,
                       unnest(regexp_extract_all(text,
                         '\\b[a-fA-F0-9]{64}\\b|\\b[a-fA-F0-9]{40}\\b|\\b[a-fA-F0-9]{32}\\b')) AS value
                FROM t))
            SELECT doc_id, kind, value, 'loose' AS only_in FROM
              (SELECT doc_id, kind, value FROM loose
               EXCEPT SELECT doc_id, kind, value FROM canon)
            UNION ALL
            SELECT doc_id, kind, value, 'canonical' AS only_in FROM
              (SELECT doc_id, kind, value FROM canon
               EXCEPT SELECT doc_id, kind, value FROM loose)
        """,
        "x2_word_extract_explode": """
            SELECT DISTINCT doc_id,
                   unnest(regexp_extract_all(text, '[a-z]{8,}')) AS word
            FROM documents
        """,
        "d1_first_wins_dedup": """
            SELECT user_id, event_type, event_id, round(value, 2) AS value
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id) = 1
        """,
        "l4_topk_per_group": """
            SELECT user_id, event_id, round(value, 2) AS value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id) AS rnk
            FROM events
            QUALIFY rnk <= 3
        """,
        "frontier_topk_selection": """
            WITH frontier AS (
              SELECT 'http://' || source || '.test/d' || doc_id AS url,
                     source AS host,
                     CAST((doc_id * 2654435761) % 100000 AS DOUBLE) / 100000.0 AS priority,
                     doc_id
              FROM documents),
            pending AS (
              SELECT * FROM frontier
              WHERE url NOT IN (SELECT url FROM frontier WHERE doc_id % 7 = 0))
            SELECT host,
                   row_number() OVER (PARTITION BY host
                                      ORDER BY priority DESC, url) AS seq,
                   url, round(priority, 5) AS priority
            FROM pending
            QUALIFY seq <= 5
        """,
        "j1_antijoin": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "j2_semijoin": """
            SELECT c_custkey, c_acctbal FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        """,
        "u2_union_distinct": """
            SELECT user_id FROM events WHERE event_type = 'purchase'
            UNION
            SELECT user_id FROM events WHERE event_type = 'signup'
        """,
        "u3_except": """
            SELECT user_id FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT user_id FROM events WHERE event_type = 'error'
        """,
        "u4_intersect": """
            SELECT user_id FROM events WHERE event_type = 'purchase'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'error'
        """,
        "l1_sort_limit": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
        """,
        "a1_counts_per_kind": """
            SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "a2_group_metrics": """
            SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   round(avg(n_chars), 2) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "agg_rollup": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "w_running_sum": """
            SELECT user_id, event_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING), 2) AS running_value
            FROM events
        """,
        "dt_trunc_month": """
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                   count(*) AS n, round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY 1
        """,
        "json_extract": """
            SELECT json_extract_string(props, '$.k') AS k_val, count(*) AS n
            FROM events GROUP BY 1
        """,
        "dedup_exact": """
            SELECT sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
                   min(doc_id) AS keep_id, count(*) AS group_size
            FROM documents GROUP BY 1
        """,
        "text_stats": """
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
                   round(CASE WHEN length(text) > 0
                        THEN (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                             / CAST(length(text) AS DOUBLE)
                        ELSE 0.0 END, 4) AS punct_ratio,
                   round((
                     least(length(text) / 500.0, 1.0)
                     + greatest(0.0, 1.0 - 4.0 * (CASE WHEN length(text) > 0
                        THEN (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                             / CAST(length(text) AS DOUBLE) ELSE 0.0 END))
                     + least(5.0 * (len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                          x -> x IN ('the','and','of','to','a','in','is','it','for','on')))
                          / CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE)), 1.0)
                   ) / 3.0, 4) AS quality
            FROM documents
        """,
        "fingerprint": """
            SELECT doc_id,
                   sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents
        """,
        "training_pipeline": f"""
            WITH RECURSIVE pairs AS (
              SELECT id_a, id_b FROM ({_minhash_lsh_oracle()})
            ),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
            reach AS (
              SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
            comp AS (
              SELECT a AS node, least(a, min(b)) AS comp
              FROM reach GROUP BY a),
            canon AS (
              SELECT d.doc_id FROM documents d
              LEFT JOIN comp c ON d.doc_id = c.node
              WHERE coalesce(c.comp, d.doc_id) = d.doc_id),
            scored AS (
              SELECT d.doc_id, d.lang,
                     len(string_split_regex(trim(d.text), '\\s+')) AS n_tokens,
                     round((
                       least(length(d.text) / 500.0, 1.0)
                       + greatest(0.0, 1.0 - 4.0 * (CASE WHEN length(d.text) > 0
                          THEN (length(d.text) - length(regexp_replace(d.text, '[^\\w\\s]', '', 'g')))
                               / CAST(length(d.text) AS DOUBLE) ELSE 0.0 END))
                       + least(5.0 * (len(list_filter(string_split_regex(lower(trim(d.text)), '\\s+'),
                            x -> x IN ('the','and','of','to','a','in','is','it','for','on')))
                            / CAST(len(string_split_regex(lower(trim(d.text)), '\\s+')) AS DOUBLE)), 1.0)
                     ) / 3.0, 4) AS quality
              FROM documents d JOIN canon USING (doc_id))
            SELECT doc_id, lang, n_tokens, quality
            FROM scored
            WHERE quality >= 0.4
              AND ('0x' || substr(sha256('smp|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  % 1000 < 800
        """,
        "salted_agg": """
            SELECT lang,
                   CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
                   count(*) AS n
            FROM documents GROUP BY lang
        """,
        "table_digest": """
            SELECT bit_xor(('0x' || substr(sha256(
                       CAST(doc_id AS VARCHAR) || '|' || lang), 1, 15))::BIGINT)
                     AS digest,
                   count(*) AS n
            FROM documents
        """,
        "hll_ndv": f"""
            WITH exact AS (
              SELECT lang, count(DISTINCT text) AS ndv_exact
              FROM documents WHERE text IS NOT NULL GROUP BY lang),
            p12 AS ({_hll_ndv_oracle(12, "ndv_p12")}),
            p6 AS ({_hll_ndv_oracle(6, "ndv_p6")})
            SELECT e.lang, ndv_exact, ndv_p12, ndv_p6,
                   round(100.0 * abs(ndv_p12 - ndv_exact)
                         / ndv_exact, 2) AS err_pct_p12
            FROM exact e JOIN p12 USING (lang) JOIN p6 USING (lang)
        """,
        "cms_heavy_hitters": """
            WITH t AS (
              SELECT token FROM (
                SELECT unnest(string_split_regex(lower(trim(text)),
                                                 '\\s+')) AS token
                FROM documents)
              WHERE len(token) >= 2),
            exact AS (
              SELECT token, count(*) AS n_exact FROM t GROUP BY token),
            top AS (
              SELECT token, n_exact FROM exact
              ORDER BY n_exact DESC, token LIMIT 20),
            cnt AS (
              SELECT s.i,
                     ('0x' || substr(sha256(CAST(s.i AS VARCHAR) || '|'
                                            || token), 1, 15))::BIGINT
                       % 2048 AS col,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM t, (SELECT unnest([0, 1, 2, 3]) AS i) s
              GROUP BY 1, 2),
            probe AS (
              SELECT token, n_exact, s.i,
                     ('0x' || substr(sha256(CAST(s.i AS VARCHAR) || '|'
                                            || token), 1, 15))::BIGINT
                       % 2048 AS col
              FROM top, (SELECT unnest([0, 1, 2, 3]) AS i) s)
            SELECT p.token, p.n_exact,
                   CAST(min(c.cnt) AS BIGINT) AS cms_est,
                   CAST(min(c.cnt) AS BIGINT) - p.n_exact AS overcount
            FROM probe p JOIN cnt c USING (i, col)
            GROUP BY p.token, p.n_exact
        """,
        "pagerank_authority": _pagerank_oracle(),
        "salted_join_revenue": """
            SELECT p_brand, count(*) AS n,
                   CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "event_correlation": """
            SELECT v.user_id,
                   v.event_id AS v_id,
                   a.event_id AS a_id,
                   epoch_us(a.ts) - epoch_us(v.ts) AS gap_us
            FROM (SELECT * FROM events WHERE event_type = 'view') v
            JOIN (SELECT * FROM events WHERE event_type = 'purchase') a
              ON v.user_id = a.user_id
             AND a.ts > v.ts
             AND a.ts <= v.ts + INTERVAL 60 MINUTE
        """,
        "bigram_collocations": """
            WITH tok AS (
              SELECT doc_id, pos, w FROM (
                SELECT doc_id,
                       generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
                FROM (SELECT doc_id,
                             string_split_regex(lower(trim(text)), '\\s+')
                               AS ws
                      FROM documents))
              WHERE len(w) >= 2),
            big AS (
              SELECT w, lead(w) OVER (PARTITION BY doc_id
                                      ORDER BY pos) AS w2
              FROM tok),
            tot AS (SELECT count(*) AS n_total FROM tok),
            uni AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w
                    FROM tok GROUP BY w),
            pair AS (
              SELECT w, w2, CAST(count(*) AS BIGINT) AS n_xy
              FROM big WHERE w2 IS NOT NULL
              GROUP BY w, w2 HAVING count(*) >= 5)
            SELECT p.w, p.w2, p.n_xy,
                   ux.n_w AS n_x, uy.n_w AS n_y,
                   (p.n_xy * (SELECT n_total FROM tot) * 1000)
                     // (ux.n_w * uy.n_w) AS lift_milli
            FROM pair p
            JOIN uni ux ON p.w = ux.w
            JOIN uni uy ON p.w2 = uy.w
            ORDER BY lift_milli DESC, p.w, p.w2 LIMIT 30
        """,
        "histogram_quantiles": """
            WITH h AS (
              SELECT event_type,
                     CAST(least(greatest(floor((value - 0.0) / 5.0), 0),
                                119) AS INTEGER) AS bin,
                     count(*) AS cnt
              FROM events WHERE value IS NOT NULL
              GROUP BY 1, 2),
            c AS (
              SELECT event_type, bin,
                     CAST(sum(cnt) OVER (PARTITION BY event_type
                                         ORDER BY bin
                                         ROWS UNBOUNDED PRECEDING)
                          AS BIGINT) AS cum,
                     CAST(sum(cnt) OVER (PARTITION BY event_type)
                          AS BIGINT) AS n
              FROM h),
            x AS (
              SELECT * FROM c, (SELECT unnest([50, 90, 99]) AS pct) p
              WHERE cum >= (pct * n + 99) // 100)
            SELECT event_type, pct, CAST(max(n) AS BIGINT) AS n,
                   CAST(min(bin) * 5.0 AS DOUBLE) AS est
            FROM x GROUP BY 1, 2
        """,
        "unpivot_metrics": """
            SELECT l_orderkey, l_linenumber, metric, val FROM (
              SELECT l_orderkey, l_linenumber,
                     l_quantity, l_extendedprice, l_discount
              FROM lineitem WHERE l_orderkey < 100)
            UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount))
        """,
        "map_ops": """
            SELECT p_partkey,
                   array_to_string(map_keys(MAP {'brand': p_brand, 'type': p_type}), ',') AS ks,
                   array_to_string(map_values(MAP {'brand': p_brand, 'type': p_type}), ',') AS vs,
                   map_extract(MAP {'brand': p_brand, 'type': p_type},
                               'brand')[1] AS brand,
                   cardinality(MAP {'brand': p_brand, 'type': p_type}) AS n
            FROM part
        """,
        "lm_perplexity": _LM_CE_SQL,
        "boilerplate_lines": """
            WITH t AS (
              SELECT doc_id,
                     'head ' || source || chr(10) || 'nav menu home' ||
                     chr(10) || text || chr(10) || 'copyright ' || source
                       AS text
              FROM documents),
            l AS (
              SELECT DISTINCT doc_id, trim(line) AS line FROM (
                SELECT doc_id, unnest(string_split(text, chr(10))) AS line
                FROM t)
              WHERE trim(line) <> ''),
            dc AS (SELECT line, count(*) AS n_docs FROM l GROUP BY 1)
            SELECT doc_id,
                   count(*) AS n_lines,
                   CAST(sum(CASE WHEN n_docs >= 3 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_boiler,
                   round(CAST(sum(CASE WHEN n_docs >= 3 THEN 1 ELSE 0 END)
                              AS BIGINT) / count(*), 6) AS boiler_frac
            FROM l JOIN dc USING (line) GROUP BY doc_id
        """,
        "doc_chunking": """
            WITH t AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\\s+') AS toks
              FROM documents),
            c AS (
              SELECT doc_id, toks, len(toks) AS n,
                     unnest(range(0, CAST(ceil(len(toks) / 48.0) AS BIGINT)))
                       AS chunk_idx
              FROM t)
            SELECT doc_id, chunk_idx,
                   least(64, n - chunk_idx * 48) AS n_tokens,
                   sha256(array_to_string(
                     toks[48*chunk_idx+1 : 48*chunk_idx+64], ' ')) AS chunk_sha
            FROM c
        """,
        "decontamination": """
            WITH toks AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\\s+') AS t
              FROM documents),
            cg AS (
              SELECT DISTINCT doc_id, gram FROM (
                SELECT doc_id,
                       unnest(CASE WHEN t IS NULL THEN []::VARCHAR[]
                              WHEN len(t) >= 5
                              THEN list_transform(range(1, len(t) - 3),
                                     i -> array_to_string(t[i:i+4], ' '))
                              ELSE [coalesce(array_to_string(t, ' '), '')] END) AS gram
                FROM toks)),
            btoks AS (
              SELECT t[6:20] AS t FROM toks WHERE doc_id % 50 = 0),
            bg AS (
              SELECT DISTINCT gram FROM (
                SELECT unnest(CASE WHEN t IS NULL THEN []::VARCHAR[]
                              WHEN len(t) >= 5
                              THEN list_transform(range(1, len(t) - 3),
                                     i -> array_to_string(t[i:i+4], ' '))
                              ELSE [coalesce(array_to_string(t, ' '), '')] END) AS gram
                FROM btoks)),
            sizes AS (SELECT doc_id, count(*) AS n_grams FROM cg GROUP BY 1),
            hits AS (SELECT doc_id, count(*) AS n_hits
                     FROM cg JOIN bg USING (gram) GROUP BY 1)
            SELECT s.doc_id, s.n_grams,
                   coalesce(h.n_hits, 0) AS n_hits,
                   round(coalesce(h.n_hits, 0) / s.n_grams, 6) AS hit_frac,
                   coalesce(h.n_hits, 0) > 0 AS contaminated
            FROM sizes s LEFT JOIN hits h USING (doc_id)
        """,
        "bloom_decontamination": """
            WITH toks AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\\s+') AS t
              FROM documents),
            cg AS (
              SELECT DISTINCT doc_id, gram FROM (
                SELECT doc_id,
                       unnest(CASE WHEN t IS NULL THEN []::VARCHAR[]
                              WHEN len(t) >= 5
                              THEN list_transform(range(1, len(t) - 3),
                                     i -> array_to_string(t[i:i+4], ' '))
                              ELSE [coalesce(array_to_string(t, ' '), '')] END) AS gram
                FROM toks)),
            btoks AS (
              SELECT t[6:20] AS t FROM toks WHERE doc_id % 50 = 0),
            bg AS (
              SELECT DISTINCT gram FROM (
                SELECT unnest(CASE WHEN t IS NULL THEN []::VARCHAR[]
                              WHEN len(t) >= 5
                              THEN list_transform(range(1, len(t) - 3),
                                     i -> array_to_string(t[i:i+4], ' '))
                              ELSE [coalesce(array_to_string(t, ' '), '')] END) AS gram
                FROM btoks)),
            bh AS (
              SELECT ('0x'||substr(sha256(gram),1,15))::BIGINT % 65536 AS h1,
                     (('0x'||substr(sha256(gram),16,15))::BIGINT % 65536) + 1
                       AS h2
              FROM bg),
            pos AS (
              SELECT unnest([h1 % 65536, (h1 + h2) % 65536]) AS p FROM bh),
            mask AS (
              SELECT CAST(p // 63 AS INT) AS w,
                     bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
              FROM pos GROUP BY 1),
            dense AS (
              SELECT w, coalesce(m.bits, 0::BIGINT) AS bits
              FROM (SELECT unnest(range(1041)) AS w)
              LEFT JOIN mask m USING (w)),
            arr AS (SELECT list(bits ORDER BY w) AS a FROM dense),
            ph AS (
              SELECT doc_id,
                     ('0x'||substr(sha256(gram),1,15))::BIGINT % 65536 AS h1,
                     (('0x'||substr(sha256(gram),16,15))::BIGINT % 65536) + 1
                       AS h2
              FROM cg),
            pp AS (SELECT doc_id, h1 % 65536 AS p0,
                          (h1 + h2) % 65536 AS p1 FROM ph),
            probe AS (
              SELECT doc_id,
                CASE WHEN (a[CAST(p0 // 63 AS INT) + 1]
                           & (1::BIGINT << CAST(p0 % 63 AS INT))) <> 0
                      AND (a[CAST(p1 // 63 AS INT) + 1]
                           & (1::BIGINT << CAST(p1 % 63 AS INT))) <> 0
                     THEN 1 ELSE 0 END AS hit
              FROM pp, arr)
            SELECT doc_id, count(*) AS n_grams,
                   CAST(sum(hit) AS BIGINT) AS n_flagged,
                   round(sum(hit) / count(*), 6) AS flagged_frac,
                   sum(hit) > 0 AS maybe_contaminated
            FROM probe GROUP BY doc_id
        """,
        "pii_redact": """
            WITH t AS (
              SELECT doc_id,
                     text || ' contact u' || doc_id || '@ex' || (doc_id % 7) ||
                     '.org card 4111 1111 1111 ' || (1000 + doc_id % 9000) ||
                     ' ip 10.' || (doc_id % 256) || '.0.' || (doc_id % 200) ||
                     ' tel +82 010-' || (1000 + doc_id % 9000) || '-' ||
                     (1000 + (doc_id * 7) % 9000) || ' end' AS s0
              FROM documents),
            c AS (
              SELECT doc_id, s0,
                     regexp_replace(s0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS s1
              FROM t),
            c2 AS (
              SELECT *, regexp_replace(s1, '\\b\\d{4}[ -]?\\d{4}[ -]?\\d{4}[ -]?\\d{4}\\b', '<CARD>', 'g') AS s2
              FROM c),
            c3 AS (
              SELECT *, regexp_replace(s2, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g') AS s3
              FROM c2),
            c4 AS (
              SELECT *, regexp_replace(s3, '\\+?\\d{1,3}[ -]\\d{3,4}[ -]\\d{3,4}(?:[ -]\\d{3,4})?', '<PHONE>', 'g') AS s4
              FROM c3)
            SELECT doc_id,
                   sha256(s4) AS redacted_sha,
                   CAST(len(regexp_extract_all(s0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
                   CAST(len(regexp_extract_all(s1, '\\b\\d{4}[ -]?\\d{4}[ -]?\\d{4}[ -]?\\d{4}\\b')) AS BIGINT) AS n_card,
                   CAST(len(regexp_extract_all(s2, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS BIGINT) AS n_ip,
                   CAST(len(regexp_extract_all(s3, '\\+?\\d{1,3}[ -]\\d{3,4}[ -]\\d{3,4}(?:[ -]\\d{3,4})?')) AS BIGINT) AS n_phone
            FROM c4
        """,
        "freshness_priority": """
            WITH t AS (
              SELECT doc_id,
                     CAST('2025-01-' ||
                          lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0')
                          AS DATE) AS lastmod,
                     (doc_id % 10) / 10.0 AS base_priority
              FROM documents)
            SELECT doc_id, lastmod, base_priority,
                   round(base_priority * pow(2.0,
                     -greatest(date_diff('day', lastmod, DATE '2025-02-01'), 0)
                      / 30.0), 6) AS score
            FROM t
        """,
        "robots_parse": """
            SELECT DISTINCT source AS host,
                   CASE WHEN length(source) % 2 = 0
                        THEN CAST(length(source) % 5 + 1 AS DOUBLE)
                        ELSE NULL END AS crawl_delay,
                   '/priv-' || source || ',/x' AS disallow
            FROM documents
        """,
        "sitemap_parse": """
            SELECT source,
                   'http://' || source || '.test/doc/' || doc_id AS loc,
                   CAST('2025-01-' ||
                        lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0')
                        AS DATE) AS lastmod,
                   (['daily','weekly','monthly'])[(doc_id % 3) + 1]
                     AS changefreq,
                   CAST('0.' || (doc_id % 10) AS DOUBLE) AS priority
            FROM documents
        """,
        "sequence_packing": """
            WITH t AS (
              SELECT lang, doc_id,
                     CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                       AS n_tokens
              FROM documents)
            SELECT lang, doc_id, n_tokens,
                   CAST(coalesce(sum(n_tokens) OVER (
                     PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT) AS "offset",
                   CAST(floor(coalesce(sum(n_tokens) OVER (
                     PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     / 4096.0) AS BIGINT) AS bin_id
            FROM t
        """,
        "sequence_packing_sharded": """
            WITH t AS (
              SELECT lang, doc_id,
                     CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                       AS n_tokens
              FROM documents),
            sh AS (
              SELECT lang, doc_id, n_tokens,
                     ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 8 AS shard
              FROM t),
            o AS (
              SELECT lang, doc_id, n_tokens, shard,
                     CAST(coalesce(sum(n_tokens) OVER (
                       PARTITION BY lang, shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS "offset"
              FROM sh)
            SELECT lang, doc_id, n_tokens, shard, "offset",
                   CAST(floor("offset" / 4096.0) AS BIGINT) AS bin_id
            FROM o
        """,
        "quality_repetition": """
            WITH t AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\\s+') AS toks
              FROM documents),
            g AS (
              SELECT doc_id, toks,
                     CASE WHEN len(toks) >= 3 THEN
                       list_transform(range(1, len(toks) - 1),
                         i -> array_to_string(toks[i:i+2], ' '))
                     ELSE [] END AS grams
              FROM t)
            SELECT doc_id,
                   len(toks) AS n_words,
                   len(list_distinct(toks)) AS uniq_words,
                   round(1 - len(list_distinct(toks)) / len(toks), 6)
                     AS rep_word_frac,
                   len(grams) AS n_grams,
                   CASE WHEN len(grams) > 0
                     THEN round(1 - len(list_distinct(grams)) / len(grams), 6)
                     ELSE 0.0 END AS rep_gram_frac
            FROM g
        """,
        "tfidf_bm25": """
            WITH tok AS (
              SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
              FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
            dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
            dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
            scored AS (
              SELECT tf.doc_id, tf.term, tf.tf, dft.df,
                     round(ln((g.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1)
                           * (tf.tf * (1.2 + 1)
                              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / g.avgdl))),
                           6) AS score
              FROM tf JOIN dl USING (doc_id) JOIN dft USING (term) CROSS JOIN g)
            SELECT doc_id, term, tf, df, score,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, term) AS rnk
            FROM scored QUALIFY rnk <= 5
        """,
        "url_normalize": """
            WITH u AS (
              SELECT doc_id,
                     'HTTP://WWW.' || source ||
                     CASE WHEN doc_id % 3 = 0 THEN '.Example.COM:80'
                          ELSE '.example.com:8080' END ||
                     '/Docs/' || lang ||
                     '?utm_source=feed&z=' || (doc_id % 7) ||
                     '&a=1&gclid=xyz&m=' || (doc_id % 5) || '#frag' AS url
              FROM documents),
            parts AS (
              SELECT doc_id, url,
                     lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                     lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host0,
                     regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path,
                     regexp_extract(url, '\\?([^#]*)', 1) AS query
              FROM u)
            SELECT doc_id, url,
                   CASE WHEN scheme = '' THEN trim(url) ELSE
                     scheme || '://' ||
                     CASE WHEN scheme = 'http' THEN regexp_replace(host0, ':80$', '')
                          WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
                          ELSE host0 END ||
                     path ||
                     CASE WHEN qn <> '' THEN '?' || qn ELSE '' END
                   END AS norm
            FROM (
              SELECT *,
                     array_to_string(list_sort(list_filter(
                       string_split(query, '&'),
                       p -> p <> '' AND NOT regexp_matches(p,
                         '^(utm_[^=]*|fbclid|gclid|msclkid|ref_src)(=|$)'))),
                       '&') AS qn
              FROM parts)
        """,
        "interleaved_spans_stats": """
            WITH t AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\\s+') AS toks
              FROM documents),
            c AS (
              SELECT doc_id, toks,
                     CAST(ceil(len(toks) / 10.0) AS BIGINT) AS n_chunks
              FROM t),
            ch AS (
              SELECT doc_id, unnest(range(0, n_chunks)) AS j, toks
              FROM c),
            sp AS (
              SELECT doc_id, j,
                     CASE WHEN j % 3 = 2 THEN 'media'
                          WHEN j % 7 = 3 THEN 'link'
                          ELSE 'text' END AS kind,
                     CASE WHEN j % 3 = 2 THEN ''
                          ELSE array_to_string(toks[10*j+1 : 10*j+10], ' ')
                     END AS sptext
              FROM ch)
            SELECT doc_id,
                   count(*) AS n_spans,
                   count(*) FILTER (kind = 'text') AS n_text,
                   count(*) FILTER (kind = 'link') AS n_link,
                   count(*) FILTER (kind = 'media') AS n_media,
                   CAST(sum(length(sptext)) AS BIGINT) AS text_chars,
                   sha256(string_agg(CASE WHEN sptext <> '' THEN sptext END,
                                     ' ' ORDER BY j)) AS flat_sha
            FROM sp GROUP BY doc_id
        """,
        "gopher_gate": """
            WITH t AS (
              SELECT doc_id, lower(trim(text)) AS c,
                     string_split_regex(lower(trim(text)), '\\s+') AS toks
              FROM documents),
            s AS (
              SELECT doc_id,
                     len(toks) AS n_words,
                     round(length(regexp_replace(c, '\\s+', '', 'g'))
                           / len(toks), 6) AS mean_word_len,
                     round(len(list_filter(toks,
                           x -> regexp_matches(x, '[a-z]')))
                           / len(toks), 6) AS alpha_word_frac,
                     round(len(regexp_extract_all(c, '#|\\.\\.\\.'))
                           / len(toks), 6) AS symbol_word_ratio,
                     len(list_intersect(list_distinct(toks),
                         ['the','be','to','of','and','that','have','with']))
                       AS n_stop_hits
              FROM t)
            SELECT doc_id, n_words, mean_word_len, alpha_word_frac,
                   symbol_word_ratio, n_stop_hits,
                   COALESCE(n_words BETWEEN 20 AND 100000
                            AND mean_word_len BETWEEN 3.0 AND 10.0
                            AND symbol_word_ratio <= 0.1
                            AND alpha_word_frac >= 0.8
                            AND n_stop_hits >= 2, FALSE) AS keep
            FROM s
        """,
        "spans_quality_pipeline": """
            WITH t AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\\s+') AS toks
              FROM documents),
            c AS (
              SELECT doc_id, toks,
                     CAST(ceil(len(toks) / 10.0) AS BIGINT) AS n_chunks
              FROM t),
            ch AS (
              SELECT doc_id, unnest(range(0, n_chunks)) AS j, toks
              FROM c),
            sp AS (
              SELECT doc_id, j,
                     CASE WHEN j % 3 = 2 THEN ''
                          ELSE array_to_string(toks[10*j+1 : 10*j+10], ' ')
                     END AS sptext
              FROM ch),
            fl AS (
              SELECT doc_id,
                     string_agg(CASE WHEN sptext <> '' THEN sptext END,
                                ' ' ORDER BY j) AS flat,
                     count(*) FILTER (j % 3 = 2) AS n_media
              FROM sp GROUP BY doc_id),
            tk AS (
              SELECT doc_id, n_media,
                     string_split_regex(lower(trim(flat)), '\\s+') AS toks2
              FROM fl WHERE flat IS NOT NULL),
            g AS (
              SELECT doc_id, n_media, toks2,
                     CASE WHEN len(toks2) >= 3 THEN
                       list_transform(range(1, len(toks2) - 1),
                         i -> array_to_string(toks2[i:i+2], ' '))
                     ELSE [] END AS grams
              FROM tk)
            SELECT doc_id,
                   len(toks2) AS n_words,
                   len(list_distinct(toks2)) AS uniq_words,
                   round(1 - len(list_distinct(toks2)) / len(toks2), 6)
                     AS rep_word_frac,
                   len(grams) AS n_grams,
                   CASE WHEN len(grams) > 0
                     THEN round(1 - len(list_distinct(grams)) / len(grams), 6)
                     ELSE 0.0 END AS rep_gram_frac,
                   n_media
            FROM g
        """,
        "token_modes": """
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS bpe_tokens
            FROM documents
        """,
        "sample_stratified": """
            SELECT doc_id, lang FROM documents
            WHERE ('0x' || substr(sha256('smp|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  % 1000
                  < CASE WHEN lang = 'en' THEN 300
                         WHEN lang = 'ko' THEN 700 ELSE 1000 END
        """,
        "sample_k_per_group": """
            SELECT doc_id, lang,
                   row_number() OVER (
                     PARTITION BY lang
                     ORDER BY sha256('smpk|' || CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rnk
            FROM documents QUALIFY rnk <= 25
        """,
        "vocab_topk": """
            WITH tok AS (
              SELECT lang,
                     unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
              FROM documents),
            c AS (SELECT lang, token, count(*) AS n FROM tok
                  WHERE len(token) >= 2 GROUP BY 1, 2)
            SELECT lang, token, n,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY n DESC, token) AS rnk
            FROM c QUALIFY rnk <= 20
        """,
        "lang_id": """
            WITH g AS (
              SELECT lang,
                     CASE WHEN regexp_matches(text, '[가-힯]') THEN 'ko'
                          WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                          WHEN regexp_matches(text, '[Ѐ-ӿ]') THEN 'ru'
                          WHEN len(list_filter(
                                 string_split_regex(lower(trim(text)), '\\s+'),
                                 x -> x IN ('the','and','of','to','a','in','is','it','for','on')))
                               / CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE)
                               > 0.05 THEN 'en'
                          ELSE 'other' END AS lang_guess
              FROM documents)
            SELECT lang, lang_guess, count(*) AS n FROM g GROUP BY 1, 2
        """,
        "stratified_budget_sample": """
            WITH d AS (
              SELECT doc_id, source, (n_chars % 97) + 1 AS weight
              FROM documents),
            grp AS (SELECT source, CAST(sum(weight) AS BIGINT) AS mass
                    FROM d WHERE weight > 0 GROUP BY source),
            t AS (SELECT sum(mass) AS tot, count(*) AS n FROM grp),
            s AS (
              SELECT source, mass, (200 - 2 * t.n) AS rem,
                     CAST((200 - 2 * t.n)
                          * (CASE WHEN t.tot > 0 THEN mass ELSE 1 END)
                          AS DOUBLE)
                       / CAST(CASE WHEN t.tot > 0 THEN t.tot ELSE t.n END
                              AS DOUBLE) AS ideal
              FROM grp, t),
            f AS (SELECT source, rem, floor(ideal) AS whole,
                         ideal - floor(ideal) AS frac
                  FROM s),
            gv AS (SELECT sum(whole) AS given FROM f),
            r AS (SELECT f.*, row_number()
                            OVER (ORDER BY frac DESC, source) AS rk
                  FROM f),
            alloc AS (
              SELECT source,
                     CAST(2 + whole
                          + CASE WHEN rk <= (rem - (SELECT given FROM gv))
                                 THEN 1 ELSE 0 END AS BIGINT) AS alloc
              FROM r),
            k AS (
              SELECT doc_id, source, weight,
                     round(pow(
                       ('0x' || substr(sha256('es|' || doc_id), 1, 15))
                         ::BIGINT::DOUBLE / 1152921504606846976.0,
                       1.0 / weight), 12) AS es_key
              FROM d WHERE weight > 0),
            rk2 AS (
              SELECT *, row_number() OVER (PARTITION BY source
                          ORDER BY es_key DESC, doc_id) AS rnk
              FROM k)
            SELECT source, doc_id, weight, es_key, rnk, alloc
            FROM rk2 JOIN alloc USING (source) WHERE rnk <= alloc
        """,
        "redirect_resolution": """
            WITH e0 AS (
              SELECT 'https://h' || (doc_id % 50) || '.test/r/' || doc_id
                       AS src,
                     'https://h' || ((doc_id - 1) % 50) || '.test/r/'
                       || (doc_id - 1) AS dst
              FROM documents WHERE doc_id % 5 <> 0
              UNION ALL
              SELECT * FROM (VALUES
                ('https://loop.test/a', 'https://loop.test/b'),
                ('https://loop.test/b', 'https://loop.test/a'))),
            e AS (SELECT src AS url, min(dst) AS ptr FROM e0 GROUP BY src),
            s0 AS (SELECT url, ptr, 1::BIGINT AS hops FROM e),
            s1 AS (SELECT a.url, coalesce(b.ptr, a.ptr) AS ptr,
                          a.hops + coalesce(b.hops, 0) AS hops
                   FROM s0 a LEFT JOIN s0 b ON a.ptr = b.url),
            s2 AS (SELECT a.url, coalesce(b.ptr, a.ptr) AS ptr,
                          a.hops + coalesce(b.hops, 0) AS hops
                   FROM s1 a LEFT JOIN s1 b ON a.ptr = b.url),
            s3 AS (SELECT a.url, coalesce(b.ptr, a.ptr) AS ptr,
                          a.hops + coalesce(b.hops, 0) AS hops
                   FROM s2 a LEFT JOIN s2 b ON a.ptr = b.url)
            SELECT s3.url, s3.ptr AS final_url,
                   CASE WHEN t.url IS NULL THEN s3.hops END AS hops,
                   t.url IS NULL AS resolved
            FROM s3 LEFT JOIN e t ON s3.ptr = t.url
        """,
        "script_mix": """
            WITH t AS (
              SELECT doc_id,
                     text || [' 한국어 기사 본문 텍스트',
                              ' 中文新闻内容正文如下',
                              ' русский текст статьи',
                              ''][(doc_id % 4) + 1] AS text
              FROM documents),
            s AS (SELECT doc_id,
                         regexp_replace(text, '\\s+', '', 'g') AS b
                  FROM t),
            f AS (
              SELECT doc_id, CAST(length(b) AS BIGINT) AS n_chars,
                round(CASE WHEN length(b) > 0 THEN
                  (length(b) - length(regexp_replace(b, '[가-힯]', '', 'g')))
                  / CAST(length(b) AS DOUBLE) ELSE 0.0 END, 6) AS hangul_frac,
                round(CASE WHEN length(b) > 0 THEN
                  (length(b) - length(regexp_replace(b, '[一-鿿]', '', 'g')))
                  / CAST(length(b) AS DOUBLE) ELSE 0.0 END, 6) AS cjk_frac,
                round(CASE WHEN length(b) > 0 THEN
                  (length(b) - length(regexp_replace(b, '[Ѐ-ӿ]', '', 'g')))
                  / CAST(length(b) AS DOUBLE) ELSE 0.0 END, 6) AS cyrillic_frac,
                round(CASE WHEN length(b) > 0 THEN
                  (length(b) - length(regexp_replace(b, '[A-Za-z]', '', 'g')))
                  / CAST(length(b) AS DOUBLE) ELSE 0.0 END, 6) AS latin_frac,
                round(CASE WHEN length(b) > 0 THEN
                  (length(b) - length(regexp_replace(b, '[0-9]', '', 'g')))
                  / CAST(length(b) AS DOUBLE) ELSE 0.0 END, 6) AS digit_frac
              FROM s)
            SELECT *,
              CASE WHEN greatest(hangul_frac, cjk_frac, cyrillic_frac,
                                 latin_frac, digit_frac) = 0 THEN 'other'
                   WHEN hangul_frac = greatest(hangul_frac, cjk_frac,
                        cyrillic_frac, latin_frac, digit_frac) THEN 'hangul'
                   WHEN cjk_frac = greatest(hangul_frac, cjk_frac,
                        cyrillic_frac, latin_frac, digit_frac) THEN 'cjk'
                   WHEN cyrillic_frac = greatest(hangul_frac, cjk_frac,
                        cyrillic_frac, latin_frac, digit_frac) THEN 'cyrillic'
                   WHEN latin_frac = greatest(hangul_frac, cjk_frac,
                        cyrillic_frac, latin_frac, digit_frac) THEN 'latin'
                   WHEN digit_frac = greatest(hangul_frac, cjk_frac,
                        cyrillic_frac, latin_frac, digit_frac) THEN 'digit'
                   ELSE 'other' END AS dominant_script
            FROM f ORDER BY doc_id
        """,
        "binary_meta": """
            SELECT doc_id,
                   ['image','audio','video'][(doc_id % 3) + 1] AS kind,
                   octet_length(unhex(substr(sha256(text), 1,
                       ((doc_id % 29) + 4) * 2))) AS n_bytes,
                   substr(sha256(text), 1, 8) AS magic
            FROM documents
        """,
        "jaccard_token_pairs": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS t
              FROM documents WHERE doc_id < 300),
            sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
              FROM tok a JOIN tok b USING (t)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
            SELECT id_a, id_b,
                   round(n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.5
        """,
        "sim_cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 10),
            c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
            scored AS (
              SELECT query_id, neighbor_id,
                     round(list_dot_product(qv, cv)
                           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
                           6) AS sim
              FROM q CROSS JOIN c WHERE query_id <> neighbor_id)
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rnk
            FROM scored QUALIFY rnk <= 5
        """,
        "ivf_ann": """
            WITH cent AS (
              SELECT vec_id::INT AS cell, embedding::DOUBLE[] AS cvec
              FROM embeddings ORDER BY vec_id LIMIT 16),
            c AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
                  FROM embeddings WHERE vec_id < 20),
            cass AS (
              SELECT id AS neighbor_id, v AS cv, cell FROM (
                SELECT c.id, c.v, ct.cell,
                       row_number() OVER (PARTITION BY c.id ORDER BY
                         round(list_dot_product(c.v, ct.cvec)
                               / (sqrt(list_dot_product(c.v, c.v))
                                  * sqrt(list_dot_product(ct.cvec, ct.cvec))), 6) DESC,
                         ct.cell) AS rn
                FROM c CROSS JOIN cent ct) WHERE rn = 1),
            qass AS (
              SELECT id AS query_id, v AS qv, cell FROM (
                SELECT q.id, q.v, ct.cell,
                       row_number() OVER (PARTITION BY q.id ORDER BY
                         round(list_dot_product(q.v, ct.cvec)
                               / (sqrt(list_dot_product(q.v, q.v))
                                  * sqrt(list_dot_product(ct.cvec, ct.cvec))), 6) DESC,
                         ct.cell) AS rn
                FROM q CROSS JOIN cent ct) WHERE rn <= 2),
            scored AS (
              SELECT DISTINCT qa.query_id, ca.neighbor_id,
                     round(list_dot_product(qa.qv, ca.cv)
                           / (sqrt(list_dot_product(qa.qv, qa.qv))
                              * sqrt(list_dot_product(ca.cv, ca.cv))), 6) AS sim
              FROM qass qa JOIN cass ca USING (cell)
              WHERE qa.query_id <> ca.neighbor_id)
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rnk
            FROM scored QUALIFY rnk <= 5
        """,
        "p2_advisory_parse": """
            WITH t AS (
              SELECT event_id, ts,
                     '  note ' || event_type || ' 2025-03-0' ||
                     ((event_id % 9) + 1) || '  ' AS raw
              FROM events)
            SELECT event_id,
                   CAST(ts + INTERVAL 9 HOUR AS DATE) AS seoul_date,
                   trim(raw) AS summary,
                   CAST(coalesce(nullif(regexp_extract(raw, '(\\d{4}-\\d{2}-\\d{2})', 1), ''),
                                 '1970-01-01') AS DATE) AS fallback_date
            FROM t
        """,
        "s2_rss_parse": """
            SELECT event_id,
                   event_type || ' #' || event_id AS summary,
                   date_trunc('second', ts) AS pub_ts,
                   CAST(date_trunc('second', ts) + INTERVAL 9 HOUR AS DATE)
                     AS seoul_date,
                   CAST('2025-03-0' || ((event_id % 9) + 1) AS DATE)
                     AS fallback_date
            FROM events
        """,
        "join3_revenue": """
            SELECT n_name, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "sessionize": """
            WITH g AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT user_id, event_id,
                   CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
            FROM g
        """,
        "sliding_window_agg": """
            SELECT make_timestamp((epoch_us(ts) // 1800000000 - s.i)
                                  * 1800000000) AS win_start,
                   make_timestamp((epoch_us(ts) // 1800000000 - s.i + 2)
                                  * 1800000000) AS win_end,
                   event_type,
                   count(*) AS n,
                   CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
                     AS val_milli,
                   min(value) AS vmin,
                   max(value) AS vmax
            FROM events, (SELECT unnest([0, 1]) AS i) s
            GROUP BY win_start, win_end, event_type
        """,
        "session_window_agg": """
            WITH g AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                               > 600000000
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s AS (
              SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM g)
            SELECT user_id,
                   min(ts) AS sess_start,
                   max(ts) + INTERVAL 10 MINUTE AS sess_end,
                   count(*) AS n_events,
                   CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
                     AS val_milli
            FROM s
            GROUP BY user_id, sid
        """,
        "asof_join": """
            WITH o AS (
              SELECT o_custkey AS user_id, o_orderdate AS odate,
                     max(o_orderkey) AS o_orderkey
              FROM orders GROUP BY 1, 2)
            SELECT e.event_id, e.user_id, o.o_orderkey AS asof_o_orderkey
            FROM events e
            ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.ts >= o.odate
        """,
        "pivot": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click')    AS click,
                   count(*) FILTER (event_type = 'error')    AS error,
                   count(*) FILTER (event_type = 'purchase') AS purchase,
                   count(*) FILTER (event_type = 'signup')   AS signup,
                   count(*) FILTER (event_type = 'view')     AS view
            FROM events GROUP BY user_id
        """,
        "cube": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "percentiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.25), 4) AS p25,
                   round(quantile_cont(value, 0.5), 4)  AS p50,
                   round(quantile_cont(value, 0.75), 4) AS p75
            FROM events GROUP BY event_type
        """,
        "korean_date_parse": """
            SELECT o_orderkey,
                   strftime(o_orderdate, '%Y년 %m월 %d일 %H:%M') AS kdate,
                   strptime(strftime(o_orderdate, '%Y년 %m월 %d일 %H:%M'),
                            '%Y년 %m월 %d일 %H:%M') AS parsed
            FROM orders
        """,
        "sid_assignment": """
            WITH keys AS (
              SELECT DISTINCT (event_id % 250) || '.' || (user_id % 250) || '.0.1' AS key
              FROM events)
            SELECT key, 7000000 + row_number() OVER (ORDER BY key) AS sid
            FROM keys
        """,
        "digest_plan": """
            WITH items AS (
              SELECT 'doc ' || doc_id || ' ' || substr(text, 1, 40) AS title,
                     'http://n.test/' || (doc_id % 50) AS link,
                     make_timestamp(2025, 6, 1 + (doc_id % 3),
                                    doc_id % 24, 0, 0) AS published
              FROM documents),
            filtered AS (
              SELECT * FROM items
              WHERE CAST(published AS DATE) = DATE '2025-06-02'
                AND regexp_matches(title, '(?i)(query|join|window)')),
            deduped AS (
              SELECT * FROM filtered
              QUALIFY row_number() OVER (PARTITION BY link
                        ORDER BY published DESC, title, link) = 1)
            SELECT title, link, published FROM deduped
            ORDER BY published DESC, title, link LIMIT 10
        """,
        "window_funcs": """
            SELECT user_id, event_id,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS drnk,
                   round(lag(value, 1) OVER w, 2) AS prev_value,
                   round(lead(value, 1) OVER w, 2) AS next_value,
                   ntile(4) OVER w AS quartile
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "array_ops": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   len(list_distinct(toks)) AS n_unique,
                   array_to_string(list_sort(list_distinct(toks))[1:3], '|') AS first3,
                   list_contains(toks, 'the') AS has_the
            FROM t
        """,
        "string_funcs": """
            SELECT c_custkey,
                   upper(c_mktsegment) AS seg_upper,
                   lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_pad,
                   reverse(c_name) AS name_rev,
                   substring(c_name, 1, 8) AS name_pfx,
                   regexp_replace(c_name, '0', '#', 'g') AS name_masked,
                   strpos(c_name, '1') AS pos_one
            FROM customer
        """,
        "grouping_sets": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_extendedprice), 2) AS total, count(*) AS n
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """,
        "doc_pipeline": """
            WITH staged AS (
              SELECT doc_id, lang,
                     len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
                     sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
              FROM documents),
            filtered AS (SELECT * FROM staged WHERE n_tokens >= 20),
            keep AS (
              SELECT * FROM filtered
              QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1)
            SELECT lang, count(*) AS kept_docs,
                   round(avg(n_tokens), 2) AS avg_tokens
            FROM keep GROUP BY lang
        """,
        # near-dup family: hash derivations are sha256 substrings in
        # BOTH engines, so these replay the full pipelines value-exactly
        "dedup_minhash_lsh": _minhash_lsh_oracle(),
        "range_join": """
            WITH pts AS (
              SELECT event_id AS point_id,
                     epoch_us(ts) // 1000000 AS p_sec
              FROM events),
            iv AS (
              SELECT event_id AS interval_id,
                     epoch_us(ts) // 1000000 AS s_sec,
                     epoch_us(ts) // 1000000 + ((event_id % 9) + 1) * 600 AS e_sec
              FROM events WHERE event_id % 53 = 0)
            SELECT p.point_id, i.interval_id,
                   p.p_sec - i.s_sec AS offset_sec
            FROM pts p JOIN iv i
              ON p.p_sec >= i.s_sec AND p.p_sec < i.e_sec
        """,
        "winnow_fingerprints": """
            WITH toks AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\\s+') AS t
              FROM documents),
            g AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(t) - 1),
                            i -> {'i': i,
                                  'h': ('0x' || substr(sha256(
                                           array_to_string(t[i:i+2], ' ')),
                                        1, 8))::BIGINT % 2147483648})) AS s
              FROM toks),
            win AS (
              SELECT doc_id,
                     row_number() OVER (PARTITION BY doc_id ORDER BY s.i) AS rn,
                     min(s.h) OVER (PARTITION BY doc_id ORDER BY s.i
                                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS fp
              FROM g)
            SELECT DISTINCT doc_id, fp FROM win WHERE rn >= 5
        """,
        # transitive closure of the minhash pair SQL via recursive CTE;
        # component label = min doc_id, exactly the engine's convention
        "dup_clusters": f"""
            WITH RECURSIVE pairs AS (
              SELECT id_a, id_b FROM ({_minhash_lsh_oracle()})
            ),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
            reach AS (
              SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
            comp AS (
              SELECT a AS node, least(a, min(b)) AS comp
              FROM reach GROUP BY a),
            lab AS (
              SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS canon_id
              FROM documents d LEFT JOIN comp c ON d.doc_id = c.node)
            SELECT doc_id, canon_id,
                   count(*) OVER (PARTITION BY canon_id) AS cluster_size,
                   (doc_id = canon_id) AS is_canonical
            FROM lab
        """,
        "dedup_simhash": _simhash_oracle(),
        "embedding_near_dup": _embedding_near_dup_oracle(),
        "lsh_ann": _lsh_ann_oracle(),
        "minhash_jaccard_est": _minhash_jaccard_est_oracle(),
        "incremental_dedup": _incremental_dedup_oracle(),
        "exact_substr_spans": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)),
                                                    '\\s+'),
                                 x -> x <> '') AS t
              FROM documents),
            grams AS (
              SELECT doc_id, unnest(generate_series(0, len(t) - 8)) AS pos, t
              FROM toks WHERE len(t) >= 8),
            occ AS (
              SELECT doc_id, pos,
                     ('0x' || substr(sha256(array_to_string(
                          t[pos+1:pos+8], ' ')), 1, 15))::BIGINT AS gh
              FROM grams),
            dup AS (
              SELECT doc_id, pos,
                     count(*) OVER (PARTITION BY gh) AS c
              FROM occ),
            d AS (SELECT doc_id, pos FROM dup WHERE c >= 2),
            isl AS (
              SELECT doc_id, pos,
                     CASE WHEN lag(pos) OVER w IS NULL
                            OR pos - lag(pos) OVER w > 8
                          THEN 1 ELSE 0 END AS brk
              FROM d
              WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
            isl2 AS (
              SELECT doc_id, pos,
                     sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS UNBOUNDED PRECEDING) AS island
              FROM isl)
            SELECT doc_id,
                   min(pos) AS span_start,
                   max(pos) + 7 AS span_end,
                   max(pos) + 8 - min(pos) AS span_tokens
            FROM isl2 GROUP BY doc_id, island
        """,
        "hashed_quality_classifier": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)),
                                                    '\\s+'),
                                 x -> x <> '') AS t
              FROM documents),
            scored AS (
              SELECT doc_id,
                     len(t) AS n_tokens,
                     CASE WHEN len(t) > 0 THEN round(
                       1.0 / (1.0 + exp(-(
                         list_sum(list_transform(t, x ->
                           ((('0x' || substr(sha256(x), 1, 8))::BIGINT
                             % 4096) / 4095.0 - 0.5) * 2.0))
                         / len(t)))), 6)
                     END AS score
              FROM toks)
            SELECT doc_id, n_tokens, score,
                   coalesce(score >= 0.5, false) AS keep
            FROM scored
        """,
        "domain_mixture": """
            WITH per_doc AS (
              SELECT source,
                     coalesce(len(list_filter(
                         string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '')), 0) AS n
              FROM documents),
            per_domain AS (
              SELECT source, count(*) AS n_docs,
                     CAST(sum(n) AS BIGINT) AS n_tokens,
                     pow(sum(n)::DOUBLE, 0.3) AS w
              FROM per_doc GROUP BY source),
            tot AS (SELECT sum(w) AS tw FROM per_domain)
            SELECT source, n_docs, n_tokens,
                   round(w / tw, 6) AS mixture_weight,
                   CAST(round(round(w / tw, 6) * 1000000.0, 0) AS BIGINT)
                     AS expected_tokens
            FROM per_domain, tot
        """,
        # same recursive closure as dup_clusters, then the retention
        # window: longest doc (n_chars desc, doc_id asc) per cluster
        "cluster_quality_keep": f"""
            WITH RECURSIVE pairs AS (
              SELECT id_a, id_b FROM ({_minhash_lsh_oracle()})
            ),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
            reach AS (
              SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
            comp AS (
              SELECT a AS node, least(a, min(b)) AS comp
              FROM reach GROUP BY a),
            lab AS (
              SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS canon_id,
                     d.n_chars
              FROM documents d LEFT JOIN comp c ON d.doc_id = c.node)
            SELECT doc_id, canon_id, n_chars,
                   row_number() OVER (PARTITION BY canon_id
                                      ORDER BY n_chars DESC, doc_id) = 1
                     AS keep
            FROM lab
        """,
        "perplexity_buckets": f"""
            WITH ce AS ({_LM_CE_SQL}),
            lab AS (
              SELECT ce.doc_id, d.lang, ce.cross_entropy,
                     CAST(least(greatest(
                         floor(ce.cross_entropy / 0.25), 0), 63) AS INT)
                       AS bin
              FROM ce JOIN documents d USING (doc_id)),
            hist AS (
              SELECT lang, bin, count(*) AS cnt FROM lab GROUP BY 1, 2),
            cum AS (
              SELECT lang, bin,
                     sum(cnt) OVER (PARTITION BY lang ORDER BY bin
                                    ROWS UNBOUNDED PRECEDING) AS cum,
                     sum(cnt) OVER (PARTITION BY lang) AS n
              FROM hist),
            cuts AS (
              SELECT lang,
                     min(CASE WHEN pct = 33 THEN cutbin END) AS c33,
                     min(CASE WHEN pct = 67 THEN cutbin END) AS c67
              FROM (
                SELECT lang, pct, min(bin) AS cutbin
                FROM cum CROSS JOIN (SELECT unnest([33, 67]) AS pct) p
                WHERE cum >= (pct * n + 99) // 100
                GROUP BY 1, 2)
              GROUP BY lang)
            SELECT lab.doc_id, lab.lang, lab.cross_entropy,
                   CASE WHEN bin <= c33 THEN 'head'
                        WHEN bin <= c67 THEN 'middle'
                        ELSE 'tail' END AS ppl_bucket
            FROM lab JOIN cuts USING (lang)
        """,
        "semdedup_prune": """
            WITH cent AS (
              SELECT vec_id::INT AS cell, embedding::DOUBLE[] AS cvec
              FROM embeddings ORDER BY vec_id LIMIT 16),
            c AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
                  FROM embeddings),
            ass AS (
              SELECT id, v, cell FROM (
                SELECT c.id, c.v, ct.cell,
                       row_number() OVER (PARTITION BY c.id ORDER BY
                         round(list_dot_product(c.v, ct.cvec)
                               / (sqrt(list_dot_product(c.v, c.v))
                                  * sqrt(list_dot_product(ct.cvec,
                                                          ct.cvec))), 6)
                           DESC,
                         ct.cell) AS rn
                FROM c CROSS JOIN cent ct) WHERE rn = 1),
            dropped AS (
              SELECT DISTINCT a.id
              FROM ass a JOIN ass b USING (cell)
              WHERE b.id < a.id
                AND round(list_dot_product(a.v, b.v)
                          / (sqrt(list_dot_product(a.v, a.v))
                             * sqrt(list_dot_product(b.v, b.v))), 6)
                    >= 0.9)
            SELECT a.id AS vec_id, a.cell, d.id IS NULL AS keep
            FROM ass a LEFT JOIN dropped d ON a.id = d.id
        """,
        "quality_weighted_sample": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)),
                                                    '\\s+'),
                                 x -> x <> '') AS t
              FROM documents),
            scored AS (
              SELECT doc_id,
                     CASE WHEN len(t) > 0 THEN round(
                       1.0 / (1.0 + exp(-(
                         list_sum(list_transform(t, x ->
                           ((('0x' || substr(sha256(x), 1, 8))::BIGINT
                             % 4096) / 4095.0 - 0.5) * 2.0))
                         / len(t)))), 6)
                     END AS score,
                     ('0x' || substr(sha256('qs:' || doc_id),
                                     1, 15))::BIGINT::DOUBLE
                       / 1152921504606846976.0 AS u
              FROM toks)
            SELECT doc_id, score, round(u, 9) AS draw,
                   coalesce(u < score, false) AS keep
            FROM scored
        """,
        "training_shuffle": """
            WITH keyed AS (
              SELECT doc_id,
                     ('0x' || substr(sha256(concat_ws(':', 'r4', doc_id)),
                                     1, 15))::BIGINT AS k
              FROM documents)
            SELECT doc_id,
                   k % 16 AS shard,
                   row_number() OVER (PARTITION BY k % 16
                                      ORDER BY k, doc_id) AS shard_pos
            FROM keyed
        """,
        "c4_line_filter": """
            WITH t AS (
              SELECT doc_id,
                     'Home | nav | javascript required' || chr(10) ||
                     'This document from ' || source ||
                     ' has a real sentence.' || chr(10) ||
                     text || '.' ||
                     CASE WHEN doc_id % 7 = 0
                          THEN chr(10) || 'lorem ipsum dolor sit'
                          ELSE '' END ||
                     CASE WHEN doc_id % 5 = 0
                          THEN chr(10) || 'var cfg = { a: 1 };'
                          ELSE '' END AS text
              FROM documents),
            s AS (
              SELECT doc_id, lower(text) AS lt,
                     list_filter(list_transform(string_split(text, chr(10)),
                                                x -> trim(x)),
                                 x -> x <> '') AS ls
              FROM t),
            k AS (
              SELECT doc_id, lt, len(ls) AS n_lines,
                     list_filter(ls, l ->
                       l[-1] IN ('.', '!', '?', '"')
                       AND len(list_filter(
                             string_split_regex(l, '\\s+'),
                             w -> w <> '')) >= 3
                       AND NOT contains(lower(l), 'javascript')) AS kept
              FROM s)
            SELECT doc_id, n_lines,
                   CAST(len(kept) AS INT) AS n_kept,
                   COALESCE(len(kept) >= 2
                            AND NOT contains(lt, 'lorem ipsum')
                            AND NOT contains(lt, '{'), FALSE) AS keep,
                   CASE WHEN len(kept) > 0
                        THEN sha256(array_to_string(kept, chr(10)))
                   END AS clean_sha
            FROM k
        """,
        "paragraph_dedup": """
            WITH t AS (
              SELECT doc_id,
                     'Subscribe to our newsletter for updates' ||
                     chr(10) || chr(10) ||
                     'About ' || source || ' publication' ||
                     chr(10) || chr(10) || text || chr(10) || chr(10) ||
                     'Copyright 2026 ' || source AS text
              FROM documents),
            s AS (
              SELECT doc_id,
                     list_filter(list_transform(
                       string_split(text, chr(10) || chr(10)),
                       x -> trim(x)), x -> x <> '') AS ls
              FROM t),
            p AS (
              SELECT doc_id, u.pos AS pos, u.para AS para,
                     sha256(u.para) AS fp,
                     doc_id * 1000000 + u.pos AS okey
              FROM (SELECT doc_id,
                           unnest(list_transform(range(1, len(ls) + 1),
                             i -> {'pos': i - 1, 'para': ls[i]})) AS u
                    FROM s)),
            w AS (SELECT fp, min(okey) AS wkey FROM p GROUP BY 1),
            f AS (
              SELECT doc_id, pos, para, okey = wkey AS kept
              FROM p JOIN w USING (fp))
            SELECT doc_id,
                   count(*) AS n_paras,
                   CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_kept,
                   round(CAST(sum(CASE WHEN kept THEN length(para)
                                       ELSE 0 END) AS DOUBLE)
                         / sum(length(para)), 6) AS kept_ratio,
                   CASE WHEN sum(CASE WHEN kept THEN 1 ELSE 0 END) > 0
                        THEN sha256(string_agg(para, chr(10) || chr(10)
                                               ORDER BY pos)
                                    FILTER (WHERE kept))
                   END AS kept_sha
            FROM f GROUP BY doc_id
        """,
        "dsir_importance": """
            WITH tok AS (
              SELECT doc_id, lang,
                     list_filter(string_split_regex(lower(trim(text)),
                                                    '\\s+'),
                                 x -> x <> '') AS t
              FROM documents),
            g AS (
              SELECT doc_id, lang,
                     unnest(list_concat(
                       t,
                       list_transform(range(1, len(t)),
                                      i -> t[i] || ' ' || t[i+1]))) AS g
              FROM tok),
            b AS (
              SELECT doc_id, lang,
                     ('0x' || substr(sha256(g), 1, 8))::BIGINT % 1024
                       AS bucket
              FROM g),
            rawc AS (SELECT bucket, count(*) AS cr FROM b GROUP BY 1),
            tgtc AS (SELECT bucket, count(*) AS ct FROM b
                     WHERE lang = 'zh' GROUP BY 1),
            tot AS (SELECT
                      (SELECT CAST(sum(cr) AS DOUBLE) FROM rawc) AS n_raw,
                      (SELECT CAST(coalesce(sum(ct), 0) AS DOUBLE)
                       FROM tgtc) AS n_tgt),
            r AS (
              SELECT rawc.bucket,
                     ln((coalesce(ct, 0) + 1) / (n_tgt + 1024))
                     - ln((cr + 1) / (n_raw + 1024)) AS lr
              FROM rawc LEFT JOIN tgtc USING (bucket), tot)
            SELECT doc_id, count(*) AS n_feats,
                   round(avg(lr), 6) AS dsir_logw
            FROM b JOIN r USING (bucket) GROUP BY doc_id
        """,
        "kmeans_clusters": """
            WITH emb AS (
              SELECT vec_id,
                     list_transform(embedding, x -> x::DOUBLE) AS ed
              FROM embeddings),
            c0 AS (
              SELECT CAST(vec_id AS INT) AS cell,
                     list_transform(ed, x -> round(x, 6)) AS cvec
              FROM emb QUALIFY row_number() OVER (ORDER BY vec_id) <= 8),
            a1 AS (
              SELECT e.vec_id, c.cell,
                     round(list_dot_product(e.ed, c.cvec)
                           / (sqrt(list_dot_product(e.ed, e.ed))
                              * sqrt(list_dot_product(c.cvec, c.cvec))),
                           6) AS sim
              FROM emb e CROSS JOIN c0 c),
            b1 AS (
              SELECT vec_id, cell FROM a1
              QUALIFY row_number() OVER (PARTITION BY vec_id
                                         ORDER BY sim DESC, cell) = 1),
            m1 AS (
              SELECT b1.cell, d.i AS dim, round(avg(e.ed[d.i]), 6) AS m
              FROM b1 JOIN emb e USING (vec_id), range(1, 65) d(i)
              GROUP BY b1.cell, d.i),
            c1 AS (
              SELECT cell, list(m ORDER BY dim) AS cvec
              FROM m1 GROUP BY cell),
            a2 AS (
              SELECT e.vec_id, c.cell,
                     round(list_dot_product(e.ed, c.cvec)
                           / (sqrt(list_dot_product(e.ed, e.ed))
                              * sqrt(list_dot_product(c.cvec, c.cvec))),
                           6) AS sim
              FROM emb e CROSS JOIN c1 c),
            b2 AS (
              SELECT vec_id, cell FROM a2
              QUALIFY row_number() OVER (PARTITION BY vec_id
                                         ORDER BY sim DESC, cell) = 1),
            m2 AS (
              SELECT b2.cell, d.i AS dim, round(avg(e.ed[d.i]), 6) AS m
              FROM b2 JOIN emb e USING (vec_id), range(1, 65) d(i)
              GROUP BY b2.cell, d.i),
            c2 AS (
              SELECT cell, list(m ORDER BY dim) AS cvec
              FROM m2 GROUP BY cell),
            a3 AS (
              SELECT e.vec_id, c.cell,
                     round(list_dot_product(e.ed, c.cvec)
                           / (sqrt(list_dot_product(e.ed, e.ed))
                              * sqrt(list_dot_product(c.cvec, c.cvec))),
                           6) AS sim
              FROM emb e CROSS JOIN c2 c)
            SELECT vec_id, cell FROM a3
            QUALIFY row_number() OVER (PARTITION BY vec_id
                                       ORDER BY sim DESC, cell) = 1
        """,
        "corpus_report": """
            WITH base AS (
              SELECT lang, source,
                     len(list_filter(string_split_regex(lower(trim(text)),
                                                        '\\s+'),
                                     x -> x <> '')) AS nt,
                     n_chars,
                     sha256(text) AS fp
              FROM documents)
            SELECT lang, source,
                   count(*) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS n_tokens,
                   round(avg(n_chars), 6) AS avg_chars,
                   count(DISTINCT fp) AS uniq_texts
            FROM base GROUP BY ROLLUP(lang, source)
        """,
        "span_dedup": """
            WITH t AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\\s+') AS toks
              FROM documents),
            c AS (
              SELECT doc_id, toks,
                     CAST(ceil(len(toks) / 10.0) AS BIGINT) AS n_chunks
              FROM t),
            ch AS (
              SELECT doc_id, unnest(range(0, n_chunks)) AS j, toks
              FROM c),
            sp0 AS (
              SELECT doc_id, j + 1 AS off,
                     CASE WHEN j % 3 = 2 THEN 'media'
                          WHEN j % 7 = 3 THEN 'link'
                          ELSE 'text' END AS kind,
                     CASE WHEN j % 3 = 2 THEN ''
                          ELSE array_to_string(toks[10*j+1 : 10*j+10], ' ')
                     END AS sptext,
                     CASE WHEN j % 3 = 2
                          THEN 'ref/' || doc_id || '/' || j
                          ELSE '' END AS media_ref
              FROM ch
              UNION ALL
              SELECT doc_id, 0 AS off, 'text' AS kind,
                     'subscribe to our newsletter' AS sptext,
                     '' AS media_ref
              FROM documents),
            f AS (
              SELECT doc_id, kind, sptext, off,
                     sha256(CASE WHEN kind = 'media'
                                 THEN 'm:' || media_ref
                                 ELSE 't:' || sptext END) AS fp,
                     doc_id * 1000000 + off AS okey
              FROM sp0),
            w AS (SELECT fp, min(okey) AS wkey FROM f GROUP BY 1),
            g AS (
              SELECT doc_id, kind, sptext, off, okey = wkey AS kept
              FROM f JOIN w USING (fp))
            SELECT doc_id,
                   count(*) AS n_spans,
                   CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_kept,
                   CAST(sum(CASE WHEN kept AND kind = 'media'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_media_kept,
                   CASE WHEN sum(CASE WHEN kept AND sptext <> ''
                                      THEN 1 ELSE 0 END) > 0
                        THEN sha256(string_agg(sptext, ' ' ORDER BY off)
                                    FILTER (WHERE kept AND sptext <> ''))
                   END AS kept_text_sha
            FROM g GROUP BY doc_id
        """,
        "edit_distance_verify": f"""
            WITH cand AS (
              SELECT id_a, id_b FROM ({_minhash_lsh_oracle()})
            ),
            j AS (
              SELECT c.id_a, c.id_b, a.text AS ta, b.text AS tb
              FROM cand c
              JOIN documents a ON a.doc_id = c.id_a
              JOIN documents b ON b.doc_id = c.id_b)
            SELECT id_a, id_b,
                   levenshtein(ta, tb) AS edit_dist,
                   round(1.0 - levenshtein(ta, tb)
                         / greatest(length(ta), length(tb)), 6)
                     AS edit_sim,
                   round(1.0 - levenshtein(ta, tb)
                         / greatest(length(ta), length(tb)), 6) >= 0.8
                     AS verified
            FROM j
        """,
        "recrawl_intervals": """
            WITH h AS (
              SELECT user_id AS url_id,
                     epoch_us(ts) // 1000000 AS fetch_sec,
                     event_type <> 'view' AS changed
              FROM events),
            a AS (
              SELECT url_id,
                     count(*) AS n,
                     CAST(sum(CASE WHEN changed THEN 1 ELSE 0 END)
                          AS BIGINT) AS x,
                     CAST(max(fetch_sec) - min(fetch_sec) AS DOUBLE)
                       AS span
              FROM h GROUP BY 1)
            SELECT url_id,
                   n AS n_fetches,
                   x AS n_changes,
                   CASE WHEN n > 1 AND span > 0 AND x > 0
                        THEN round((-ln((n - x + 0.5) / (n + 0.5)))
                                   / (span / CAST(n - 1 AS DOUBLE)), 9)
                   END AS change_rate,
                   round(CASE WHEN n > 1 AND span > 0 AND x > 0
                              THEN least(greatest(
                                1.0 / ((-ln((n - x + 0.5) / (n + 0.5)))
                                       / (span / CAST(n - 1 AS DOUBLE))),
                                3600.0), 604800.0)
                              ELSE 604800.0 END, 6) AS next_interval_sec
            FROM a
        """,
        "hits_authority": """
            WITH e AS (
              SELECT DISTINCT user_id % 400 AS src,
                     (user_id * 2654435761 + event_id) % 400 AS dst
              FROM events
              WHERE user_id % 400
                    <> (user_id * 2654435761 + event_id) % 400),
            h0 AS (
              SELECT node, 1.0 AS h FROM (
                SELECT src AS node FROM e UNION SELECT dst FROM e)),
            a1r AS (SELECT dst, sum(h) AS ar
                    FROM e JOIN h0 ON e.src = h0.node GROUP BY dst),
            a1 AS (SELECT dst AS node,
                          round(ar / (SELECT max(ar) FROM a1r), 6) AS a
                   FROM a1r),
            h1r AS (SELECT src, sum(a) AS hr
                    FROM e JOIN a1 ON e.dst = a1.node GROUP BY src),
            h1 AS (SELECT src AS node,
                          round(hr / (SELECT max(hr) FROM h1r), 6) AS h
                   FROM h1r),
            a2r AS (SELECT dst, sum(h) AS ar
                    FROM e JOIN h1 ON e.src = h1.node GROUP BY dst),
            a2 AS (SELECT dst AS node,
                          round(ar / (SELECT max(ar) FROM a2r), 6) AS a
                   FROM a2r),
            h2r AS (SELECT src, sum(a) AS hr
                    FROM e JOIN a2 ON e.dst = a2.node GROUP BY src),
            h2 AS (SELECT src AS node,
                          round(hr / (SELECT max(hr) FROM h2r), 6) AS h
                   FROM h2r)
            SELECT node, a2.a AS auth, h2.h AS hub
            FROM a2 FULL JOIN h2 USING (node)
            ORDER BY auth DESC NULLS LAST, node LIMIT 30
        """,
        "cdx_index": """
            WITH u AS (
              SELECT 'https://' || source || '.example.com/docs/' || doc_id
                       AS url,
                     source || '.example.com' AS host,
                     '/docs/' || doc_id AS path,
                     '20260101'
                       || lpad(CAST((n_chars % 86400) // 3600 AS VARCHAR),
                               2, '0')
                       || lpad(CAST(((n_chars % 86400) // 60) % 60 AS VARCHAR),
                               2, '0')
                       || lpad(CAST(n_chars % 60 AS VARCHAR), 2, '0') AS ts14,
                     sha256(text) AS digest,
                     CAST(n_chars AS BIGINT) AS length
              FROM documents)
            SELECT array_to_string(list_reverse(string_split(host, '.')), ',')
                     || ')' || path AS surt,
                   ts14, url, digest, length
            FROM u ORDER BY surt, url
        """,
        "host_budget_allocation": """
            WITH hosts AS (
              SELECT source || '.example.com' AS host,
                     CAST(sum(n_chars) AS BIGINT) AS mass
              FROM documents GROUP BY source),
            t AS (SELECT sum(mass) AS tot, count(*) AS n FROM hosts),
            s AS (
              SELECT host, mass, (10000 - t.n) AS rem,
                     CAST((10000 - t.n)
                          * (CASE WHEN t.tot > 0 THEN mass ELSE 1 END)
                          AS DOUBLE)
                       / CAST(CASE WHEN t.tot > 0 THEN t.tot ELSE t.n END
                              AS DOUBLE) AS ideal
              FROM hosts, t),
            f AS (
              SELECT host, mass, rem, floor(ideal) AS whole,
                     ideal - floor(ideal) AS frac
              FROM s),
            g AS (SELECT sum(whole) AS given FROM f),
            r AS (SELECT f.*, row_number()
                            OVER (ORDER BY frac DESC, host) AS rk
                  FROM f)
            SELECT host, mass,
                   CAST(1 + whole
                        + CASE WHEN rk <= (rem - (SELECT given FROM g))
                               THEN 1 ELSE 0 END AS BIGINT) AS alloc
            FROM r ORDER BY host
        """,
        "crawl_trap_hosts": """
            WITH u AS (
              SELECT 'h' || CAST(user_id % 37 AS VARCHAR) AS host,
                     CASE WHEN user_id % 37 < 5
                          THEN '/cal/' || CAST(event_id % 500 AS VARCHAR)
                               || '/d/' || CAST(event_id % 31 AS VARCHAR)
                          ELSE '/sec/'
                               || substr('abcdefg',
                                         CAST(user_id % 7 AS INT) + 1, 1)
                               || '/page/'
                               || substr('vwxyz',
                                         CAST(event_id % 5 AS INT) + 1, 1)
                     END AS path
              FROM events),
            t AS (
              SELECT host, path,
                     regexp_replace(
                       regexp_replace(path, '[0-9a-f]{8,}', 'H', 'g'),
                       '[0-9]+', 'N', 'g') AS tmpl,
                     len(string_split(path, '/')) - 1 AS depth
              FROM u)
            SELECT host,
                   count(*) AS n_urls,
                   count(DISTINCT path) AS n_paths,
                   count(DISTINCT tmpl) AS n_templates,
                   max(depth) AS max_depth,
                   round(count(DISTINCT path) / count(DISTINCT tmpl), 6)
                     AS trap_ratio,
                   (round(count(DISTINCT path) / count(DISTINCT tmpl), 6)
                      >= 8.0
                    AND count(*) >= 20) AS is_trap
            FROM t GROUP BY host ORDER BY host
        """,
        "anchor_text_topk": """
            WITH e AS (
              SELECT 'h' || CAST(n_chars % 40 AS VARCHAR) AS dst,
                     substr(text, 1, 48) AS anchor
              FROM documents),
            tok0 AS (
              SELECT dst,
                     unnest(string_split_regex(lower(anchor),
                                               '[^a-z0-9]+')) AS term
              FROM e),
            tok AS (SELECT dst, term FROM tok0 WHERE len(term) >= 2),
            c AS (SELECT dst, term, count(*) AS n_links
                  FROM tok GROUP BY dst, term),
            r AS (SELECT c.*, row_number() OVER
                    (PARTITION BY dst ORDER BY n_links DESC, term) AS rank
                  FROM c)
            SELECT dst, term, n_links, rank
            FROM r WHERE rank <= 5 ORDER BY dst, rank
        """,
        "pq_ann": """
            WITH c AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            cb0 AS (
              SELECT j, vec_id::INT AS code,
                     list_slice(embedding::DOUBLE[],
                                j*16 + 1, j*16 + 16) AS cvec
              FROM embeddings
              CROSS JOIN (SELECT unnest(range(4)) AS j)
              WHERE vec_id < 8),
            cb AS (SELECT j, code, cvec,
                          list_dot_product(cvec, cvec) AS cc
                   FROM cb0),
            enc AS (
              SELECT id, j, code FROM (
                SELECT c.id, b.j, b.code,
                       row_number() OVER (PARTITION BY c.id, b.j ORDER BY
                         round(b.cc - 2*list_dot_product(
                           list_slice(c.v, b.j*16 + 1, b.j*16 + 16),
                           b.cvec), 6) ASC,
                         b.code ASC) AS rn
                FROM c CROSS JOIN cb b) WHERE rn = 1),
            q AS (SELECT id AS query_id, v AS qv FROM c WHERE id < 4),
            terms AS (
              SELECT q.query_id, e.id AS neighbor_id, e.j,
                     round(
                       list_dot_product(
                         list_slice(q.qv, e.j*16 + 1, e.j*16 + 16),
                         list_slice(q.qv, e.j*16 + 1, e.j*16 + 16))
                       + b.cc
                       - 2*list_dot_product(
                           list_slice(q.qv, e.j*16 + 1, e.j*16 + 16),
                           b.cvec), 6) AS term
              FROM q CROSS JOIN enc e
              JOIN cb b ON b.j = e.j AND b.code = e.code
              WHERE q.query_id <> e.id),
            pairs AS (
              SELECT query_id, neighbor_id,
                     round(list_sum(list(term ORDER BY j)), 6) AS adist
              FROM terms GROUP BY query_id, neighbor_id)
            SELECT query_id, neighbor_id, adist,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adist, neighbor_id) AS rnk
            FROM pairs QUALIFY rnk <= 5 ORDER BY query_id, rnk
        """,
        "ivf_pq_ann": """
            WITH cent AS (
              SELECT vec_id::INT AS cell, embedding::DOUBLE[] AS cvec
              FROM embeddings ORDER BY vec_id LIMIT 16),
            c AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
                  FROM embeddings),
            q AS (SELECT id AS query_id, v AS qv FROM c WHERE id < 8),
            cass AS (
              SELECT id, cell FROM (
                SELECT c.id, ct.cell,
                       row_number() OVER (PARTITION BY c.id ORDER BY
                         round(list_dot_product(c.v, ct.cvec)
                               / (sqrt(list_dot_product(c.v, c.v))
                                  * sqrt(list_dot_product(ct.cvec, ct.cvec))), 6) DESC,
                         ct.cell) AS rn
                FROM c CROSS JOIN cent ct) WHERE rn = 1),
            qass AS (
              SELECT query_id, cell FROM (
                SELECT q.query_id, ct.cell,
                       row_number() OVER (PARTITION BY q.query_id ORDER BY
                         round(list_dot_product(q.qv, ct.cvec)
                               / (sqrt(list_dot_product(q.qv, q.qv))
                                  * sqrt(list_dot_product(ct.cvec, ct.cvec))), 6) DESC,
                         ct.cell) AS rn
                FROM q CROSS JOIN cent ct) WHERE rn <= 4),
            cb0 AS (
              SELECT j, vec_id::INT AS code,
                     list_slice(embedding::DOUBLE[],
                                j*16 + 1, j*16 + 16) AS cvec
              FROM embeddings
              CROSS JOIN (SELECT unnest(range(4)) AS j)
              WHERE vec_id < 8),
            cb AS (SELECT j, code, cvec,
                          list_dot_product(cvec, cvec) AS cc
                   FROM cb0),
            enc AS (
              SELECT id, j, code FROM (
                SELECT c.id, b.j, b.code,
                       row_number() OVER (PARTITION BY c.id, b.j ORDER BY
                         round(b.cc - 2*list_dot_product(
                           list_slice(c.v, b.j*16 + 1, b.j*16 + 16),
                           b.cvec), 6) ASC,
                         b.code ASC) AS rn
                FROM c CROSS JOIN cb b) WHERE rn = 1),
            terms AS (
              SELECT qa.query_id, e.id AS neighbor_id, e.j,
                     round(
                       list_dot_product(
                         list_slice(q.qv, e.j*16 + 1, e.j*16 + 16),
                         list_slice(q.qv, e.j*16 + 1, e.j*16 + 16))
                       + b.cc
                       - 2*list_dot_product(
                           list_slice(q.qv, e.j*16 + 1, e.j*16 + 16),
                           b.cvec), 6) AS term
              FROM qass qa
              JOIN cass ca USING (cell)
              JOIN enc e ON e.id = ca.id
              JOIN q ON q.query_id = qa.query_id
              JOIN cb b ON b.j = e.j AND b.code = e.code
              WHERE qa.query_id <> e.id),
            pairs AS (
              SELECT query_id, neighbor_id,
                     round(list_sum(list(term ORDER BY j)), 6) AS adist
              FROM terms GROUP BY query_id, neighbor_id)
            SELECT query_id, neighbor_id, adist,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adist, neighbor_id) AS rnk
            FROM pairs QUALIFY rnk <= 5 ORDER BY query_id, rnk
        """,
        "bpe_merges": f"""
            WITH {_BPE_CHAIN_SQL}
            SELECT 1 AS step, m1.pair, m1.a || m1.b AS merged,
                   m1.c AS pair_count, v1.vs AS vocab_size FROM m1, v1
            UNION ALL
            SELECT 2, m2.pair, m2.a || m2.b, m2.c, v2.vs FROM m2, v2
            UNION ALL
            SELECT 3, m3.pair, m3.a || m3.b, m3.c, v3.vs FROM m3, v3
            ORDER BY step
        """,
        "bpe_fertility": f"""
            WITH {_BPE_CHAIN_SQL},
            f AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_words,
                         CAST(sum(len(regexp_extract_all(
                            sym, '\\(([^)]*)\\)', 1)) * cnt) AS BIGINT)
                           AS n_tokens
                  FROM s3),
            g AS (SELECT CAST(sum(len(word) * cnt) AS BIGINT) AS n_chars
                  FROM w0)
            SELECT n_words, n_tokens, n_chars,
                   round(n_chars / n_tokens, 6) AS chars_per_token,
                   round(n_tokens / n_words, 6) AS tokens_per_word
            FROM f, g
        """,
                "trustrank_scores": """
            WITH e AS (
              SELECT DISTINCT user_id % 400 AS src,
                     (user_id * 2654435761 + event_id) % 400 AS dst
              FROM events
              WHERE user_id % 400
                    <> (user_id * 2654435761 + event_id) % 400),
            nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
            seeds AS (SELECT node FROM nodes WHERE node % 50 = 0),
            ns AS (SELECT count(*) AS k FROM seeds),
            od AS (SELECT src, count(*) AS n_out FROM e GROUP BY src),
            t0 AS (
              SELECT n.node,
                     CASE WHEN s.node IS NOT NULL
                          THEN 1000000000000 // (SELECT k FROM ns)
                          ELSE 0 END AS r,
                     s.node IS NOT NULL AS is_seed
              FROM nodes n LEFT JOIN seeds s USING (node)),
            c1 AS (
              SELECT e.dst AS node,
                     CAST(sum((t.r * 85) // (100 * od.n_out)) AS BIGINT) AS m
              FROM e JOIN t0 t ON e.src = t.node JOIN od ON od.src = e.src
              GROUP BY e.dst),
            t1 AS (
              SELECT t0.node,
                     (CASE WHEN t0.is_seed
                           THEN (15 * 1000000000000)
                                  // (100 * (SELECT k FROM ns))
                           ELSE 0 END + coalesce(c1.m, 0)) AS r,
                     t0.is_seed
              FROM t0 LEFT JOIN c1 USING (node)),
            c2 AS (
              SELECT e.dst AS node,
                     CAST(sum((t.r * 85) // (100 * od.n_out)) AS BIGINT) AS m
              FROM e JOIN t1 t ON e.src = t.node JOIN od ON od.src = e.src
              GROUP BY e.dst),
            t2 AS (
              SELECT t1.node,
                     (CASE WHEN t1.is_seed
                           THEN (15 * 1000000000000)
                                  // (100 * (SELECT k FROM ns))
                           ELSE 0 END + coalesce(c2.m, 0)) AS r,
                     t1.is_seed
              FROM t1 LEFT JOIN c2 USING (node))
            SELECT node, CAST(r AS BIGINT) AS trust_micro, is_seed
            FROM t2 ORDER BY trust_micro DESC, node LIMIT 30
        """,
        "corpus_snapshot_diff": """
            WITH o AS (
              SELECT doc_id, sha256(text) AS od
              FROM documents WHERE n_chars % 11 <> 0),
            n AS (
              SELECT doc_id,
                     CASE WHEN n_chars % 7 = 0 THEN sha256(text || 'v2')
                          ELSE sha256(text) END AS nd
              FROM documents WHERE n_chars % 13 <> 0)
            SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN od IS DISTINCT FROM nd THEN 'changed'
                        ELSE 'unchanged' END AS status,
                   od AS old_digest, nd AS new_digest
            FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
            ORDER BY doc_id
        """,
        "label_propagation": """
            WITH e AS (
              SELECT DISTINCT user_id % 400 AS src,
                     (user_id * 2654435761 + event_id) % 400 AS dst
              FROM events
              WHERE user_id % 400
                    <> (user_id * 2654435761 + event_id) % 400),
            u AS (SELECT src, dst FROM e
                  UNION ALL SELECT dst, src FROM e),
            v1 AS (SELECT src AS node, dst AS label, count(*) AS nv
                   FROM u GROUP BY 1, 2),
            l1 AS (SELECT node, label FROM (
                     SELECT node, label, row_number() OVER
                       (PARTITION BY node ORDER BY nv DESC, label) AS r
                     FROM v1) WHERE r = 1),
            v2 AS (SELECT u.src AS node, l1.label, count(*) AS nv
                   FROM u JOIN l1 ON u.dst = l1.node GROUP BY 1, 2),
            l2 AS (SELECT node, label FROM (
                     SELECT node, label, row_number() OVER
                       (PARTITION BY node ORDER BY nv DESC, label) AS r
                     FROM v2) WHERE r = 1)
            SELECT label, CAST(count(*) AS BIGINT) AS size
            FROM l2 GROUP BY label ORDER BY size DESC, label LIMIT 20
        """,
        "sitemap_index_expand": """
            SELECT 'http://' || source || '.test/sitemap-'
                     || CAST(doc_id % 3 AS VARCHAR) || '.xml'
                     AS sitemap_loc,
                   CAST('2025-03-0' || CAST(doc_id % 3 + 1 AS VARCHAR)
                        AS DATE) AS index_lastmod,
                   'http://' || source || '.test/doc/' || doc_id AS loc,
                   CAST('2025-02-' ||
                        lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0')
                        AS DATE) AS lastmod,
                   CAST(NULL AS VARCHAR) AS changefreq,
                   CAST(NULL AS DOUBLE) AS priority
            FROM documents ORDER BY loc
        """,
        "effective_crawl_rate": """
            WITH hosts AS (
              SELECT source AS host,
                     CAST(sum(n_chars) AS BIGINT) AS mass
              FROM documents GROUP BY source),
            t AS (SELECT sum(mass) AS tot, count(*) AS n FROM hosts),
            s AS (
              SELECT host, mass, (10000 - t.n) AS rem,
                     CAST((10000 - t.n)
                          * (CASE WHEN t.tot > 0 THEN mass ELSE 1 END)
                          AS DOUBLE)
                       / CAST(CASE WHEN t.tot > 0 THEN t.tot ELSE t.n END
                              AS DOUBLE) AS ideal
              FROM hosts, t),
            f AS (
              SELECT host, mass, rem, floor(ideal) AS whole,
                     ideal - floor(ideal) AS frac
              FROM s),
            g AS (SELECT sum(whole) AS given FROM f),
            r AS (SELECT f.*, row_number()
                            OVER (ORDER BY frac DESC, host) AS rk
                  FROM f),
            a AS (
              SELECT host,
                     CAST(1 + whole
                          + CASE WHEN rk <= (rem - (SELECT given FROM g))
                                 THEN 1 ELSE 0 END AS BIGINT) AS alloc
              FROM r),
            rb AS (
              SELECT DISTINCT source AS host,
                     CASE WHEN length(source) % 2 = 0
                          THEN CAST(length(source) % 5 + 1 AS DOUBLE)
                          ELSE NULL END AS crawl_delay
              FROM documents),
            x AS (
              SELECT a.host, rb.crawl_delay, a.alloc,
                     CASE WHEN rb.crawl_delay IS NULL THEN a.alloc
                          ELSE least(a.alloc,
                                     CAST(floor(300.0 / rb.crawl_delay)
                                          AS BIGINT)) END AS effective
              FROM a JOIN rb USING (host))
            SELECT host, crawl_delay, alloc, effective,
                   effective < alloc AS delay_limited
            FROM x ORDER BY host
        """,
        "robots_sitemap_discovery": """
            WITH h AS (SELECT DISTINCT source FROM documents)
            SELECT source AS host,
                   'http://' || source || '.test/sitemap-index.xml'
                     AS sitemap_url
            FROM h
            UNION ALL
            SELECT source,
                   'http://' || source || '.test/news.xml'
            FROM h
            ORDER BY host, sitemap_url
        """,
        "inverted_index": """
            WITH tok AS (
              SELECT doc, l[i] AS term, i - 1 AS pos
              FROM (SELECT doc_id AS doc,
                           string_split_regex(lower(text),
                                              '[^a-z0-9]+') AS l
                    FROM documents),
                   unnest(range(1, len(l) + 1)) AS t(i)
              WHERE len(l[i]) >= 2),
            pd AS (
              SELECT term, doc,
                     string_agg(CAST(pos AS VARCHAR), ','
                                ORDER BY pos) AS p
              FROM tok GROUP BY term, doc),
            pt AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df,
                     string_agg(doc || ':' || p, ';' ORDER BY doc)
                       AS postings
              FROM pd GROUP BY term)
            SELECT term, df, postings FROM pt
            WHERE df >= 5 ORDER BY term
        """,
        "mirror_content": """
            WITH rows0 AS (
              SELECT 'h' || CAST(doc_id % 29 AS VARCHAR) AS host,
                     sha256(CAST(n_chars % 97 AS VARCHAR)) AS digest
              FROM documents),
            dh AS (SELECT DISTINCT digest, host FROM rows0),
            g AS (
              SELECT r.digest,
                     CAST(count(*) AS BIGINT) AS n_docs,
                     CAST((SELECT count(*) FROM dh
                           WHERE dh.digest = r.digest) AS BIGINT)
                       AS n_hosts,
                     (SELECT string_agg(host, ',' ORDER BY host)
                      FROM dh WHERE dh.digest = r.digest) AS hosts
              FROM rows0 r GROUP BY r.digest)
            SELECT digest, n_docs, n_hosts, hosts
            FROM g WHERE n_hosts > 1 ORDER BY digest
        """,
        "weighted_sample_topk": """
            WITH s AS (
              SELECT doc_id, n_chars,
                     round(pow(
                       ('0x' || substr(sha256('es|' || doc_id), 1, 15))
                         ::BIGINT::DOUBLE / 1152921504606846976.0,
                       1.0 / n_chars), 12) AS es_key
              FROM documents WHERE n_chars > 0)
            SELECT doc_id, n_chars, es_key
            FROM s ORDER BY es_key DESC, doc_id LIMIT 50
        """,
    }
