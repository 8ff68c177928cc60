"""Text-analysis functions for training-data pipelines.

Extends the reference's content-quality surface (F18
``src/storage/ContentStorage.cpp:200-204``, A6 word count
``ContentStorage.cpp:27-35``, A5 keyword extraction with its stopword list
``ContentStorage.cpp:38-79``) with the standard large-corpus text metrics:
language ID (stopword-hit heuristic), quality scoring (length / punctuation
/ stopword ratios), token counting, and document fingerprinting. Everything
is a pure Catalyst expression — portable 1:1 to the DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from search_engine_core_spark.functions.tokenizer import tokenize_expr

# The reference's exact stopword list (ContentStorage.cpp:51-64).
REFERENCE_STOPWORDS = [
    "the", "and", "for", "are", "but", "not", "you", "all", "can", "had",
    "her", "was", "one", "our", "out", "day", "get", "has", "him", "his",
    "how", "its", "may", "new", "now", "old", "see", "two", "who", "boy",
    "did", "she", "use", "man", "way",
]

# Tiny per-language marker sets for the n-gram/stopword language heuristic.
LANG_MARKERS = {
    "en": ["the", "and", "is", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los", "una"],
    "fr": ["le", "la", "les", "des", "est", "une"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
}


def word_count(text: Column) -> Column:
    """A6 — whitespace token count (istringstream >> semantics: leading /
    trailing / repeated whitespace ignored)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def token_count(text: Column) -> Column:
    """Canonical-tokenizer token count (doclen)."""
    return F.size(tokenize_expr(text))


def content_quality(text: Column) -> Column:
    """F18 — min(1.0, chars/10000)."""
    return F.least(F.lit(1.0), F.length(text).cast("double") / 10000.0)


def punct_ratio(text: Column) -> Column:
    """Share of non-alnum, non-space characters — a quality signal."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(text) > 0, F.length(stripped).cast("double") / F.length(text)).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(text: Column) -> Column:
    """Share of canonical tokens that are reference stopwords."""
    toks = tokenize_expr(text)
    stops = F.filter(toks, lambda t: t.isin(REFERENCE_STOPWORDS))
    return F.when(F.size(toks) > 0, F.size(stops).cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length-quality damped by punctuation
    noise. Deterministic, portable to ANSI SQL."""
    return F.round(content_quality(text) * (1.0 - punct_ratio(text)), 4)


def lang_id(text: Column) -> Column:
    """Heuristic language ID via marker-token hit counts; deterministic
    argmax with fixed preference order on ties ('en' > 'es' > 'fr' > 'de'),
    'und' when nothing matches."""
    toks = tokenize_expr(text)

    def _member_of(values):  # single-arity lambda: F.filter treats 2-arg
        return lambda t: t.isin(values)  # lambdas as (element, index)!

    hits = {
        lang: F.size(F.filter(toks, _member_of(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*hits.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # insertion order = preference order
        expr = expr.when(hits[lang] == best, F.lit(lang))
    return expr


def fingerprint(text: Column) -> Column:
    """Document fingerprint: sha256 over the canonical token stream —
    whitespace/punctuation-insensitive exact-dup key (dedup-grade)."""
    return F.sha2(F.array_join(tokenize_expr(text), " "), 256)
