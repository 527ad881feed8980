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


# Unicode-script languages, voted AHEAD of the Latin stopword markers:
# script characters are a far stronger signal than any stopword list.
# (lang, Java-regex char class, priority position). Kana is listed
# first and handled specially: Japanese text is usually Han-MAJORITY,
# so any above-threshold kana presence decides 'ja' before the Han
# count can vote 'zh'.
SCRIPT_CLASSES: list[tuple[str, str]] = [
    ("ja", "[\\p{IsHiragana}\\p{IsKatakana}]"),
    ("zh", "\\p{IsHan}"),
    ("ko", "\\p{IsHangul}"),
    ("ru", "\\p{IsCyrillic}"),
    ("ar", "\\p{IsArabic}"),
    ("hi", "\\p{IsDevanagari}"),
    ("el", "\\p{IsGreek}"),
]

# A script must cover >= 1/SCRIPT_MIN_FRACTION_DEN of the non-space
# characters (and be non-zero) to vote — one quoted CJK char inside an
# English paragraph must not flip the label.
SCRIPT_MIN_FRACTION_DEN = 20


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, detected_lang, lang_score).

    Priority rules (deterministic, mirrored by the DuckDB oracle):
      1. Script vote. Count characters per Unicode script class
         (SCRIPT_CLASSES); a script is ELIGIBLE when count > 0 and
         count * SCRIPT_MIN_FRACTION_DEN >= non-whitespace chars.
         Eligible kana -> 'ja' outright (see SCRIPT_CLASSES note);
         otherwise argmax over the remaining eligible scripts, ties
         broken by list order (strict > comparison).
      2. Latin stopword vote: argmax over marker-hit counts, language
         order en > es > de > fr (strict >).
      3. 'und' when nothing fires. lang_score is the winning count
         (script chars for rule 1, marker hits for rule 2)."""
    t = F.col(text_col)
    n_nonws = F.length(F.regexp_replace(t, "\\s+", ""))
    script = {lang: F.regexp_count(t, F.lit(pat)) for lang, pat in SCRIPT_CLASSES}
    eligible = {
        lang: (c > 0) & (c * SCRIPT_MIN_FRACTION_DEN >= n_nonws)
        for lang, c in script.items()
    }

    hits = {lang: _marker_hits(t, words) for lang, words in LANG_MARKERS.items()}
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in LANG_MARKERS:  # insertion order = priority order
        is_better = hits[lang] > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, hits[lang]).otherwise(best_score)

    s_lang = F.lit(None).cast("string")
    s_score = F.lit(0)
    for lang, _pat in SCRIPT_CLASSES[1:]:  # kana handled outright below
        is_better = eligible[lang] & (script[lang] > s_score)
        s_lang = F.when(is_better, F.lit(lang)).otherwise(s_lang)
        s_score = F.when(is_better, script[lang]).otherwise(s_score)

    final_lang = (
        F.when(eligible["ja"], F.lit("ja"))
        .when(s_lang.isNotNull(), s_lang)
        .otherwise(best_lang)
    )
    final_score = (
        F.when(eligible["ja"], script["ja"])
        .when(s_lang.isNotNull(), s_score)
        .otherwise(best_score)
    )
    return docs.select(
        F.col(id_col),
        final_lang.alias("detected_lang"),
        final_score.cast("long").alias("lang_score"),
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
