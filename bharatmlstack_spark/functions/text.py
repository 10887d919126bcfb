"""Text-analysis functions for training-data pipelines: language-ID,
quality scoring, token counting, document fingerprinting.

All pure Column expressions (JVM-side, codegen-friendly) with exact
integer/ratio arithmetic so every one of them is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small per-language stopword lists for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "una"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "de", "et", "est", "une", "que"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}
LANG_PRIORITY = ["en", "es", "de", "fr", "zh"]  # tie-break order

WORD_RE = r"\s+"
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"  # BPE-ish pre-tokenizer split


def words(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), WORD_RE)


def word_count(col: Column | str) -> Column:
    return F.size(words(col))


def token_count(col: Column | str) -> Column:
    """BPE-ish token count: letter runs, digit runs, and single punctuation
    marks (regexp_count is JVM-side; DuckDB twin:
    len(regexp_extract_all(...)))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_RE))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    total = F.length(c)
    punct = F.regexp_count(c, F.lit(r"[^\sA-Za-z0-9]"))
    return F.when(total > 0, punct.cast("double") / total.cast("double")).otherwise(0.0)


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or LANG_STOPWORDS["en"]
    ws = words(col)
    hits = F.size(F.filter(ws, lambda w: F.lower(w).isin([s.lower() for s in sw])))
    return F.when(F.size(ws) > 0, hits.cast("double") / F.size(ws).cast("double")).otherwise(0.0)


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    stopword presence (the classic C4/Gopher-style cheap filters), exact
    arithmetic only."""
    wc = word_count(col).cast("double")
    length_ok = F.when((wc >= 10) & (wc <= 1000), 1.0).otherwise(0.0)
    low_punct = F.when(punct_ratio(col) <= 0.2, 1.0).otherwise(0.0)
    has_stop = F.when(stopword_ratio(col) >= 0.05, 1.0).otherwise(0.0)
    return (length_ok + low_punct + has_stop) / F.lit(3.0)


def char_entropy(col: Column | str) -> Column:
    """Shannon entropy (natural log) of the character distribution —
    the cheap gibberish/binary-junk detector (near-zero entropy =
    one-character spam, ~ln(95) = random bytes; natural text sits in
    between). Pure array expressions, NO shuffle: the per-doc histogram
    is built with array HOFs (O(len x distinct_chars) per row, distinct
    chars bounded by the alphabet), so at 100 TB this is scan-bandwidth
    map work like the other quality signals. NULL/empty text -> 0.0.

    DuckDB twin: unnest chars -> per-char counts -> -SUM(p*ln(p)); or
    entropy(ch) * ln(2) (DuckDB's entropy aggregate is log2-based)."""
    c = F.col(col) if isinstance(col, str) else col
    cs = F.split(F.coalesce(c, F.lit("")), "")
    # neither Spark nor DuckDB emits a trailing empty element when
    # splitting by the empty pattern — Spark's split(x, '') returns
    # exactly the characters; the n > 0 guard covers empty/NULL input
    n = F.length(F.coalesce(c, F.lit(""))).cast("double")
    distinct = F.array_distinct(cs)
    probs = F.transform(
        distinct,
        lambda d: F.size(F.filter(cs, lambda x: x == d)).cast("double") / n,
    )
    h = F.aggregate(
        probs,
        F.lit(0.0),
        lambda acc, p: acc - p * F.log(p),
    )
    return F.when(n > 0, h).otherwise(F.lit(0.0))


def _stopword_hits(ws: Column, stopwords: list[str]) -> Column:
    # NB: the HOF lambda must be single-parameter — a second (default) arg
    # makes pyspark pass the element INDEX into it.
    lowered = [s.lower() for s in stopwords]
    return F.size(F.filter(ws, lambda w: F.lower(w).isin(lowered)))


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (the n-gram-heuristic core)."""
    ws = words(col)
    return {lang: _stopword_hits(ws, sw) for lang, sw in LANG_STOPWORDS.items()}


def lang_id(col: Column | str) -> Column:
    """argmax over per-language stopword hits, ties resolved by
    LANG_PRIORITY order; all-zero -> 'und'.

    NOTE: as a single Column expression each language's hit count (an
    interpreted higher-order filter) is re-evaluated in `greatest` AND in
    every tie-break branch — ~14x slower than the two-projection form.
    Use ``lang_id_frame`` for anything beyond a handful of rows."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def lang_id_frame(df, text_col: str = "text", out_col: str = "lang_guess"):
    """Frame-level language-ID: the per-language hit counts land in an
    intermediate projection FIRST, so each higher-order filter evaluates
    exactly once per row — Catalyst's CollapseProject declines to inline
    non-cheap expressions referenced more than once, which is precisely
    the barrier needed here (measured 14x over the inline form). This is
    the scan-path variant for corpus-scale scoring."""
    scores = lang_scores(text_col)
    tmp = df.select("*", *[c.alias(f"__lang_{l}") for l, c in scores.items()])
    cols = {l: F.col(f"__lang_{l}") for l in scores}
    best = F.greatest(*cols.values())
    expr = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        expr = F.when((cols[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return tmp.withColumn(out_col, expr).drop(*[f"__lang_{l}" for l in scores])


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------
# Patterns are written in the common subset of Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, \b — no backreferences,
# no lookaround — so the same pattern string drives both the query and its
# oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{2}-[0-9]{10}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

# redaction order matters only in that replacements must not themselves
# match a later pattern; the bracket tokens contain no digits/@, so any
# order is safe.
PII_PATTERNS: list[tuple[str, str]] = [
    (EMAIL_RE, "[EMAIL]"),
    (PHONE_RE, "[PHONE]"),
    (IPV4_RE, "[IP]"),
]


def pii_count(col: Column | str, pattern: str) -> Column:
    """Number of non-overlapping matches of one PII pattern."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its bracket token, all patterns."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def fingerprint(col: Column | str, mod: int = 2**31 - 1) -> Column:
    """Order-sensitive rolling hash over words: fold
    h = (h*31 + (len(w)*131 + ascii(first_char(w)))) mod p.

    Engine-portable by construction (no xxhash): the DuckDB twin is
    list_reduce over string_split with the same arithmetic."""
    ws = words(col)
    return F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: (
            acc * 31 + (F.length(w) * 131 + F.ascii(F.substring(w, 1, 1)))
        ) % mod,
    )
