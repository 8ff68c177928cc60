"""Corpus statistics + (term, doc_id, tf) triples.

Maps reference aggregations:
  A1 term-frequency count   (``SearchScorer.cpp:714-723``) -> explode+groupBy
  A2 document frequency     (``SearchScorer.cpp:225-255``) -> groupBy(term)
  A3 average document length(``SearchScorer.cpp:231-251``) -> avg(doclen)
  A4 corpus size N          (``SearchScorer.cpp:228``)     -> count()

All exact aggregations (BM25 rank-identity requires exact df/N/avgdl —
``approx_count_distinct`` is fine for diagnostics only). The explode ->
partial hash agg -> shuffle on (doc_id, term) -> final agg pipeline is
Catalyst's default; map-side combine keeps the shuffle at O(distinct
(doc,term)) not O(token occurrences).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_core_spark.functions.tokenizer import tokenize_expr


@dataclass(frozen=True)
class CorpusStats:
    """Scalar corpus statistics broadcast to scoring (J2: the reference
    keeps these in a driver-side map; we keep them as plan literals)."""

    n_docs: int
    avgdl: float


def triples(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, term, tf) — one row per distinct term per document.

    The single shuffle here is the groupBy on (doc_id, term); at 100 TB
    this is the dominant exchange of the build and is exactly the one the
    postings stage re-uses (we shuffle again by term there; triples are
    persisted bucketed by term hash in the index build to pay it once).
    """
    return (
        docs.select("doc_id", F.explode(tokenize_expr(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_frequency(trip: DataFrame) -> DataFrame:
    """(term, df) — exact document frequency. ``trip`` already has one row
    per (doc, term) so a plain count == countDistinct(doc_id), cheaper."""
    return trip.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def corpus_stats(docs: DataFrame, doclen_col: str = "doclen") -> CorpusStats:
    """N + avgdl in one job. avgdl uses the canonical token count
    (FIXTURES.md contract; the reference's char-length variant lives in
    the parity scorer)."""
    row = docs.agg(
        F.count(F.lit(1)).alias("n"), F.avg(doclen_col).alias("avgdl")
    ).collect()[0]
    return CorpusStats(n_docs=int(row["n"]), avgdl=float(row["avgdl"] or 0.0))
