"""Text-analysis columns for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All native expressions (split/regexp/length/sha) — these run over
100 TB of text, so they must stay inside whole-stage codegen; a
Python tokenizer here would dominate the job cost.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# tiny stopword lists for the heuristic scorer / language guesser
EN_STOP = ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"]
_WORD_SPLIT = r"\s+"
# BPE-ish token regex: words, numbers, or single non-space symbols
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def _c(col):
    return F.col(col) if isinstance(col, str) else col


def token_count(col, mode: str = "ws") -> F.Column:
    """Token count: 'ws' whitespace tokens, 'bpe' regex-token count."""
    c = _c(col)
    if mode == "ws":
        return F.size(F.split(F.trim(c), _WORD_SPLIT))
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def punct_ratio(col) -> F.Column:
    c = _c(col)
    n = F.length(c)
    punct = n - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(col) -> F.Column:
    """Share of whitespace tokens that are EN stopwords."""
    c = _c(col)
    toks = F.split(F.lower(F.trim(c)), _WORD_SPLIT)
    stops = F.size(F.filter(toks, lambda t: t.isin(EN_STOP)))
    total = F.size(toks)
    return F.when(total > 0, stops.cast("double") / total.cast("double")).otherwise(F.lit(0.0))


def quality_score(col) -> F.Column:
    """Composite [0,1] quality heuristic: length band + low punctuation
    + stopword presence. The standard cheap pre-filter before expensive
    dedup/training steps."""
    c = _c(col)
    n = F.length(c).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(c) * 4.0)
    stop_score = F.least(stopword_ratio(c) * 5.0, F.lit(1.0))
    return F.round((len_score + punct_pen + stop_score) / 3.0, 4)


def lang_guess(col) -> F.Column:
    """Heuristic language ID: Hangul / CJK / Cyrillic script detection,
    else EN-stopword density → 'en', else 'other'. Deterministic and
    SQL-expressible so the oracle can replay it."""
    c = _c(col)
    return (
        F.when(c.rlike(r"[가-힯]"), F.lit("ko"))
        .when(c.rlike(r"[一-鿿]"), F.lit("zh"))
        .when(c.rlike(r"[Ѐ-ӿ]"), F.lit("ru"))
        .when(stopword_ratio(c) > 0.05, F.lit("en"))
        .otherwise(F.lit("other"))
    )


# Unicode script classes for composition profiling. Plain codepoint
# ranges (no \p{...} properties) so Java regex (Spark) and RE2
# (DuckDB oracle) interpret them identically.
SCRIPT_CLASSES = [
    ("hangul", r"[가-힯]"),
    ("cjk", r"[一-鿿]"),
    ("cyrillic", r"[Ѐ-ӿ]"),
    ("latin", r"[A-Za-z]"),
    ("digit", r"[0-9]"),
]


def script_fracs(col) -> dict[str, F.Column]:
    """Per-document script composition: the fraction of non-whitespace
    characters in each script class (strip-and-diff counting — the
    same trick as punct_ratio, no regexp_count dependency), rounded to
    6 dp so any engine replays the values. The multilingual-corpus
    router signal: a CC-scale pipeline shards by script before
    language-specific tokenizers/filters run, and mixed-script docs
    (boilerplate in one script, body in another) are exactly the ones
    a single-label lang-ID misroutes — lang_guess answers "which
    language", this answers "how much of each". Returns named columns
    {n_chars, <class>_frac...}; compose dominant-script from the
    STAGED columns (one projection) rather than re-calling this, or
    each regex pass runs twice."""
    c = _c(col)
    base = F.regexp_replace(c, r"\s+", "")
    n = F.length(base)
    out: dict[str, F.Column] = {"n_chars": n.cast("long")}
    for name, pat in SCRIPT_CLASSES:
        cnt = n - F.length(F.regexp_replace(base, pat, ""))
        out[f"{name}_frac"] = F.round(
            F.when(n > 0, cnt.cast("double") / n.cast("double"))
            .otherwise(F.lit(0.0)), 6)
    return out


def dominant_script(frac_cols: dict[str, F.Column] | None = None) -> F.Column:
    """Dominant script from already-staged ``<class>_frac`` columns:
    the FIRST class (in SCRIPT_CLASSES order) attaining the max frac —
    a fixed priority, so ties are deterministic and a SQL CASE chain
    replays the pick; 'other' when no class matched any character."""
    cols = frac_cols or {f"{n}_frac": F.col(f"{n}_frac")
                         for n, _ in SCRIPT_CLASSES}
    fracs = [cols[f"{n}_frac"] for n, _ in SCRIPT_CLASSES]
    mx = F.greatest(*fracs)
    chain = F.when(mx == 0, F.lit("other"))
    for name, _ in SCRIPT_CLASSES:
        chain = chain.when(cols[f"{name}_frac"] == mx, F.lit(name))
    return chain.otherwise(F.lit("other"))


def fingerprint(col) -> F.Column:
    """Document fingerprint: sha2 over whitespace-normalized lowercase
    text — the exact-dedup key at corpus scale."""
    c = _c(col)
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.sha2(norm, 256)
