"""Text-analysis operators for large-scale training-data pipelines.

All pure Catalyst expressions (JVM-side, whole-stage-codegen'd) so they run
at 100 TB without a Python worker in the loop. Each has an exact ANSI-SQL
twin in __spark_entry__.oracle_sql (DuckDB-checked).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword marker sets per language (heuristic lang-id)
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "de", "una"],
}

_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"]


def token_count(col: Column) -> Column:
    """Whitespace token count (long)."""
    return F.size(F.filter(F.split(col, r"\s+"), lambda t: F.length(t) > 0)).cast("long")


def _count_pattern(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("long")


def quality_score(col: Column) -> Column:
    """Deterministic doc-quality heuristic in [0,1]:
    0.4·stopword-ratio-score + 0.3·alpha-ratio + 0.3·length-score.
    The length/punct/stopword-ratio family of filters used by public
    training-data pipelines (C4/Gopher-style rules), kept exactly
    SQL-expressible so DuckDB can oracle it."""
    n_tok = token_count(col)
    n_stop = _count_pattern(
        F.lower(col), r"\b(" + "|".join(_STOPWORDS) + r")\b"
    )
    stop_ratio = n_stop.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
    alpha_ratio = (
        _count_pattern(col, r"[A-Za-z]").cast("double")
        / F.greatest(F.length(col), F.lit(1)).cast("double")
    )
    len_score = F.least(F.length(col).cast("double") / F.lit(500.0), F.lit(1.0))
    return (
        F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.4
        + alpha_ratio * 0.3
        + len_score * 0.3
    )


def language_id(col: Column) -> Column:
    """Marker-word language guess over a closed set (en/de/fr/es), 'und' if
    no markers hit. Deterministic ties broken by fixed language order."""
    lowered = F.lower(col)
    counts = [
        (_count_pattern(lowered, r"\b(" + "|".join(words) + r")\b"), lang)
        for lang, words in _LANG_MARKERS.items()
    ]
    best = F.lit("und")
    best_n = F.lit(0).cast("long")
    # iterate in fixed order; strict > keeps the first language on ties
    for n, lang in counts:
        is_better = n > best_n
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_n = F.when(is_better, n).otherwise(best_n)
    return best


def doc_fingerprint(col: Column, shingle: int = 8) -> Column:
    """Winnowing-style document fingerprint: min xxhash64 over all
    `shingle`-char substrings (rolling-hash analog, fully Catalyst).
    Equal fingerprints ⇒ likely shared content region."""
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(col) - F.lit(shingle - 1), F.lit(1))
    )
    hashes = F.transform(starts, lambda i: F.xxhash64(F.substring(col, i, shingle)))
    return F.array_min(hashes)


def add_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(c))
        .withColumn("quality", quality_score(c))
        .withColumn("lang_guess", language_id(c))
        .withColumn("fingerprint", doc_fingerprint(c))
    )
