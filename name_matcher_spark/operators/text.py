"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting. All pure JVM expressions
(regexp + hashing built-ins) — no Python anywhere, so these run at
full whole-stage-codegen speed over 100 TB of crawl text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# heuristic language identifier. Word-boundary regexes keep this
# SQL-portable (same semantics in the DuckDB oracle).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "with"],
    "es": ["el", "la", "los", "las", "que", "es", "una"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "est", "une", "dans", "pour"],
}


def _marker_hits(text: Column, words: list[str]) -> Column:
    pattern = "\\b(" + "|".join(words) + ")\\b"
    return F.regexp_count(F.lower(text), F.lit(pattern))


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, detected_lang, lang_score) — argmax over marker-hit counts,
    'und' (undetermined) when no marker fires. Deterministic tiebreak:
    language order en > es > de > fr (strict > comparison)."""
    t = F.col(text_col)
    hits = {lang: _marker_hits(t, words) for lang, words in LANG_MARKERS.items()}
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in LANG_MARKERS:  # insertion order = priority order
        is_better = hits[lang] > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, hits[lang]).otherwise(best_score)
    return docs.select(
        F.col(id_col),
        best_lang.alias("detected_lang"),
        best_score.cast("long").alias("lang_score"),
    )


def token_count(text: Column) -> Column:
    """Whitespace tokenization; empty text -> 0."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, "\\s+"))
    ).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-flavored proxy: word pieces + digits + punctuation each
    count (regexp token classes), approximating subword token counts
    without a vocab file."""
    return F.regexp_count(text, F.lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]")).cast("long")


def quality_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality signals: length, tokens, mean word length,
    punctuation ratio, stopword ratio, uppercase ratio — the standard
    crawl-filtering features, rounded for cross-engine comparability."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = F.regexp_count(t, F.lit("[^A-Za-z0-9\\s]"))
    n_upper = F.regexp_count(t, F.lit("[A-Z]"))
    n_stop = _marker_hits(t, LANG_MARKERS["en"])
    safe = lambda num, den: F.when(den > 0, F.round(num / den, 4)).otherwise(F.lit(0.0))  # noqa: E731
    return docs.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        safe(n_chars, n_tokens).alias("mean_token_len"),
        safe(n_punct, n_chars).alias("punct_ratio"),
        safe(n_upper, n_chars).alias("upper_ratio"),
        safe(n_stop, n_tokens).alias("stopword_ratio"),
    )


def fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Canonical content fingerprint: md5 of lowercased,
    whitespace-collapsed text (the exact-dedup key, exposed as its own
    operator for lineage tables)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    return docs.select(
        F.col(id_col), F.md5(F.encode(norm, "UTF-8")).alias("fingerprint")
    )
