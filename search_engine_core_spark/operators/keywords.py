"""Keyword extraction (A5/W2) and prefix suggestions (S14).

A5 replicates ``ContentStorage::extractKeywords``
(``src/storage/ContentStorage.cpp:38-79``): whitespace-split words,
strip punctuation chars, lowercase, keep len > 3 minus the stopword list,
count, top-10 by frequency. The reference's sort is frequency-desc with
unspecified tie order (std::sort on a hash-map dump); we define the
deterministic contract (count desc, word asc) — same caveat as the top-k
tiebreak (SURVEY §7).

S14 replicates FT.SUGGET (``src/storage/RedisSearchStorage.cpp:374-401``)
as a prefix filter + frequency order over the term dictionary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_engine_core_spark.functions.text_quality import REFERENCE_STOPWORDS


def keyword_candidates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, word, cnt) after the reference's cleaning rules.

    ispunct strips ASCII punctuation anywhere in the word (not just edges):
    'foo.bar' -> 'foobar', exactly like the erase/remove_if in C++."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("raw"),
    )
    cleaned = words.select(
        "doc_id",
        F.lower(F.regexp_replace("raw", r"[!-/:-@\[-`{-~]", "")).alias("word"),
    )
    return (
        cleaned.filter((F.length("word") > 3) & ~F.col("word").isin(REFERENCE_STOPWORDS))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def top_keywords(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 10) -> DataFrame:
    """Top-k keywords per document via a ranking window (W2)."""
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("word"))
    return (
        keyword_candidates(docs, text_col, id_col)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def suggest(dfreq: DataFrame, prefix: str, k: int = 10) -> DataFrame:
    """FT.SUGGET analog: terms with the prefix, most frequent first."""
    return (
        dfreq.filter(F.col("term").startswith(prefix))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )
