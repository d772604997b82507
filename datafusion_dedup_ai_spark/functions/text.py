"""Text-analysis operators for a training-data pipeline (extension scope,
SURVEY.md §2-C / BASELINE.json north star): tokenization, n-gram shingles,
quality scoring, language-ID heuristic, fingerprinting.

Everything is a pure Column expression (JVM, codegen-friendly) — text ops run
on every document at 100 TB scale, so nothing here drops to Python. The
module mirrors into DuckDB SQL in queries_text.py for the t2 oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker words for the language-ID heuristic. On real corpora these would be
# per-language stopword sets; held tiny and fixed so Spark and oracle agree.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "is", "to", "in")

ROLLING_HASH_MOD = 1_000_000_007
ROLLING_HASH_BASE = 31


def tokens(col: Column) -> Column:
    """Whitespace tokenization (documents are single-space normalized)."""
    return F.split(col, " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def regex_token_count(col: Column) -> Column:
    """BPE-ish segmentation count: letter runs, digit runs, other symbols."""
    return F.regexp_count(col, F.lit(r"[a-z]+|[A-Z]+|[0-9]+|[^A-Za-z0-9\s]")).cast(
        "bigint"
    )


def word_bigrams(col: Column) -> Column:
    """Adjacent word pairs as 'w1 w2' strings (shingles for near-dup)."""
    t = tokens(col)
    n = F.size(t)
    return F.zip_with(
        F.slice(t, 1, n - 1), F.slice(t, 2, n - 1), lambda x, y: F.concat_ws(" ", x, y)
    )


def distinct_shingles(col: Column) -> Column:
    return F.array_distinct(word_bigrams(col))


def stopword_count(col: Column) -> Column:
    return stopword_count_from_tokens(tokens(col))


def stopword_count_from_tokens(t: Column) -> Column:
    return F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))).cast("bigint")


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band + lexical diversity
    + stopword presence band. Mirrors queries_text.sql_quality_score."""
    return quality_score_from_tokens(tokens(col))


def quality_score_from_tokens(t: Column) -> Column:
    """quality_score over a precomputed token-array column (round-13:
    callers that score several signals from the same tokenization can
    project the split once instead of re-deriving it inside every fold —
    identical expression tree given t = tokens(text))."""
    n_tok = F.size(t).cast("double")
    n_distinct = F.size(F.array_distinct(t)).cast("double")
    sw = stopword_count_from_tokens(t).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    diversity = n_distinct / n_tok
    sw_ratio = sw / n_tok
    sw_score = F.when((sw_ratio >= 0.02) & (sw_ratio <= 0.4), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return len_score * F.lit(0.4) + diversity * F.lit(0.4) + sw_score * F.lit(0.2)


def lang_marker_count(col: Column, lang: str) -> Column:
    return lang_marker_count_from_tokens(tokens(col), lang)


def lang_marker_count_from_tokens(t: Column, lang: str) -> Column:
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(t, lambda x: x.isin(*markers))).cast("bigint")


def lang_id(col: Column) -> Column:
    """Pick the language with the most marker hits; ties -> language code
    ascending; zero hits -> 'und'."""
    return lang_id_from_tokens(tokens(col))


def lang_id_from_tokens(t: Column) -> Column:
    counts = [
        (lang, lang_marker_count_from_tokens(t, lang))
        for lang in sorted(LANG_MARKERS)
    ]
    best = None
    best_count = None
    # argmax with deterministic tie-break, expression-composed: fold langs in
    # sorted order, strictly-greater replaces.
    for lang, cnt in counts:
        if best is None:
            best, best_count = F.lit(lang), cnt
        else:
            take = cnt > best_count
            best = F.when(take, F.lit(lang)).otherwise(best)
            best_count = F.when(take, cnt).otherwise(best_count)
    return F.when(best_count > 0, best).otherwise(F.lit("und"))


def fingerprint_md5(col: Column) -> Column:
    return F.md5(col)


def rolling_hash(col: Column) -> Column:
    """Polynomial rolling hash over characters, mod a 30-bit prime — the
    order-sensitive cousin of md5 (equal for equal strings, cheap to fold)."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * ROLLING_HASH_BASE + F.ascii(ch)) % ROLLING_HASH_MOD,
    )
