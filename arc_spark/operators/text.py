"""Text analysis for training-data pipelines: token counting, quality
scoring, n-gram language ID, document fingerprinting.

All hot-path computation is JVM-side column expressions (split / regexp /
length / aggregate) so it stays inside whole-stage codegen; the language-ID
scorer uses a broadcastable profile joined via array intersection — no
Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------


def token_count(c: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(c: Column) -> Column:
    """Sub-word-ish token estimate: words + punctuation runs counted
    separately (a cheap BPE proxy: ~1 token per word piece / symbol)."""
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0))


# ---------------------------------------------------------------------------
# quality scoring (length / punctuation / stopword ratios)
# ---------------------------------------------------------------------------

_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be", "this", "are",
]


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-signal columns: n_chars_m, n_tokens, avg_token_len,
    punct_ratio, digit_ratio, stopword_ratio, upper_ratio, quality_score."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    words = F.split(F.lower(F.trim(c)), r"\s+")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.array_intersect(words, stop_arr))
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    upper = F.length(F.regexp_replace(c, r"[^A-Z]", ""))

    df = (
        df.withColumn("n_chars_m", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "avg_token_len",
            F.when(n_tokens > 0, (n_chars.cast("double") / n_tokens)).otherwise(F.lit(0.0)),
        )
        .withColumn("punct_ratio", punct.cast("double") / F.greatest(n_chars, F.lit(1)))
        .withColumn("digit_ratio", digits.cast("double") / F.greatest(n_chars, F.lit(1)))
        .withColumn("upper_ratio", upper.cast("double") / F.greatest(n_chars, F.lit(1)))
        .withColumn(
            "stopword_ratio",
            n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double"),
        )
    )
    # Heuristic composite in [0,1]: long-enough, low punctuation/digit noise.
    score = (
        F.least(F.col("n_tokens").cast("double") / F.lit(50.0), F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.col("punct_ratio") * 4.0, F.lit(1.0))) * 0.3
        + (1.0 - F.least(F.col("digit_ratio") * 4.0, F.lit(1.0))) * 0.3
    )
    return df.withColumn("quality_score", score)


# ---------------------------------------------------------------------------
# language identification (character n-gram heuristic)
# ---------------------------------------------------------------------------

# Tiny built-in trigram/charset profiles. Real pipelines would plug a model
# here; the operator contract (cheap, per-row, JVM-side) is the point.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " is ", "ing ", " to "],
    "de": [" der ", " die ", " und ", " ist ", "sch", " ein "],
    "fr": [" le ", " la ", " et ", " est ", " les ", " une "],
    "es": [" el ", " la ", " y ", " es ", " los ", "ción"],
    "zh": ["的", "是", "了", "在", "我", "不"],
}


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Append a predicted language column: argmax over per-language marker
    hit counts (computed as pure column expressions, one pass)."""
    c = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))

    def hits(markers: list[str]) -> Column:
        total = F.lit(0)
        for m in markers:
            # count occurrences via length difference
            total = total + (
                (F.length(c) - F.length(F.replace(c, F.lit(m), F.lit("")))) / len(m)
            ).cast("int")
        return total

    scored = F.array(
        *[
            F.struct(hits(m).alias("score"), F.lit(lang).alias("lang"))
            for lang, m in _LANG_MARKERS.items()
        ]
    )
    best = F.array_max(scored)
    return df.withColumn(
        out_col,
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


# ---------------------------------------------------------------------------
# scrubbing / filtering (training-data hygiene)
# ---------------------------------------------------------------------------

# RE2-compatible patterns (no backrefs/lookarounds) so the same regexes run
# under Spark's Java engine and DuckDB's RE2 for oracle parity.
_SCRUB_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\-. ]{7,}\d", "<PHONE>"),
]


def scrub_text(c: Column, kinds: list[str] | None = None) -> Column:
    """Redact PII-ish spans (emails, URLs, IPv4s, phone-like digit runs)
    with typed placeholder tokens — pure regexp_replace chain, stays in
    codegen; the standard pre-training scrub pass."""
    out = c
    for kind, pattern, token in _SCRUB_PATTERNS:
        if kinds is None or kind in kinds:
            out = F.regexp_replace(out, pattern, token)
    return out


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_tokens: int = 10,
    max_punct_ratio: float = 0.2,
    max_digit_ratio: float = 0.3,
) -> DataFrame:
    """Keep documents passing the standard quality gates (C4-style
    heuristics: long enough, not punctuation/digit noise)."""
    c = F.col(text_col)
    n_chars = F.greatest(F.length(c), F.lit(1))
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    return df.filter(
        (token_count(c) >= min_tokens)
        & (punct.cast("double") / n_chars <= max_punct_ratio)
        & (digits.cast("double") / n_chars <= max_digit_ratio)
    )


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "doc_fp") -> DataFrame:
    """64-bit content fingerprint (xxhash64 of normalized text) — the cheap
    exact-dup key. (Rolling-hash shingle fingerprints for near-dup live in
    operators.dedup.)"""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.withColumn(out_col, F.xxhash64(F.trim(norm)))
