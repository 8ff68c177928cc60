"""C4 corpus-level three-sentence-span deduplication.

Raffel et al. 2020 §2.2, final rule: "we discarded all but one of any
three-sentence span occurring more than once in the data set." Unlike
everything in :mod:`functions.c4` this is inherently a CORPUS-level
operation — one shuffle by construction — so it lives with the other
distributed dedup operators rather than the column-expression rules.

Semantics (deviations documented):

* sentence unit = ``functions.c4.sentence_split`` (deterministic regex
  boundary; TFDS c4_utils uses NLTK — dependency-free stand-in);
* span key = xxhash64 of the span text lowercased with all
  non-[a-z0-9] removed (c4_utils ``_hash_text`` uses a normalized MD5;
  same idea, cheaper hash — a collision would remove one extra span,
  negligible at 64 bits and documented rather than silent);
* the single kept occurrence of a duplicated span is the global
  ``min(struct(id, span_idx))`` — a pure function of the data, where
  c4_utils keeps whichever occurrence its pipeline happens to see first;
* a loser occurrence removes its three sentences (union across
  overlapping losing spans); docs with removals are rebuilt by joining
  surviving sentences with a single space (c4_utils rebuild), docs
  without removals keep their original text byte-for-byte.

Scale shape: one map-side explode of (id, span_idx, hash64) — 12 bytes
a span, never the span text; one map-side-combinable groupBy(hash) min;
one join back restricted to LOSERS only (duplicated spans are a small
fraction of a real corpus, and AQE may broadcast it); one groupBy(id)
to union removal indices; one sort-merge join to the docs. No step
holds a per-key list of documents, so skew on a viral span costs a
combiner, not an OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_core_spark.functions.c4 import sentence_split

__all__ = ["dedup_three_sentence_spans", "span_hashes"]

_SPAN = 3


def span_hashes(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, span_idx, span_hash) — one row per three-sentence span.
    Hashes are computed inside the array transform and the span STRING
    is never materialized as a column, so the exploded relation is a
    fixed 20-ish bytes per span regardless of document size."""
    sents = sentence_split(text_col)
    norm = lambda s: F.regexp_replace(F.lower(s), "[^a-z0-9]", "")
    n_spans = F.size(sents) - F.lit(_SPAN - 1)
    spans = F.when(
        n_spans >= 1,
        F.transform(
            F.sequence(F.lit(0), n_spans - 1),
            lambda i: F.struct(
                i.cast("int").alias("span_idx"),
                F.xxhash64(
                    norm(F.concat_ws(" ", F.slice(sents, i + 1, _SPAN)))
                ).alias("span_hash"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<span_idx:int,span_hash:bigint>>"))
    return df.select(
        F.col(id_col).alias("id"), F.explode(spans).alias("s")
    ).select("id", "s.span_idx", "s.span_hash")


def dedup_three_sentence_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    joiner: str = " ",
) -> DataFrame:
    """The corpus with every duplicated three-sentence span kept exactly
    once (at its global ``min(id, span_idx)`` occurrence) and removed —
    sentence-wise — everywhere else. Returns ``df`` with ``text_col``
    rewritten on affected docs only; schema and row count unchanged
    (a doc whose every sentence is removed keeps an empty string —
    compose with ``c4_doc_pass``/``gopher_quality_pass`` to drop it)."""
    spans = span_hashes(df, text_col, id_col)

    winners = spans.groupBy("span_hash").agg(
        F.min(F.struct("id", "span_idx")).alias("keep"),
        F.count(F.lit(1)).alias("n"),
    )
    losers = (
        spans.join(winners.filter(F.col("n") > 1), "span_hash")
        .filter(
            ~((F.col("id") == F.col("keep.id")) & (F.col("span_idx") == F.col("keep.span_idx")))
        )
        .select(
            "id",
            F.explode(
                F.sequence(F.col("span_idx"), F.col("span_idx") + F.lit(_SPAN - 1))
            ).alias("sent_idx"),
        )
        .groupBy("id")
        .agg(F.collect_set("sent_idx").alias("_removed"))
    )

    out = df.join(losers, df[id_col] == losers["id"], "left").drop(losers["id"])
    sents = sentence_split(text_col)
    rebuilt = F.array_join(
        F.filter(sents, lambda s, i: ~F.array_contains(F.col("_removed"), i.cast("int"))),
        joiner,
    )
    return out.withColumn(
        text_col,
        F.when(F.col("_removed").isNull(), F.col(text_col)).otherwise(rebuilt),
    ).drop("_removed")
