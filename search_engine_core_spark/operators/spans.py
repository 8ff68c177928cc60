"""Corpus-level duplicated-span removal: C4 sentence spans and
Lee-et-al token windows over one shared distributed core.

Two public instantiations of the same "keep one global occurrence of
any duplicated fixed-length span, excise the rest" semantics:

* :func:`dedup_three_sentence_spans` — Raffel et al. 2020 §2.2, final
  rule: "we discarded all but one of any three-sentence span occurring
  more than once in the data set". Unit = sentence
  (``functions.c4.sentence_split``), span = 3, span keys normalized
  (lowercase, everything but Unicode letters/digits stripped via
  ``(?U)\\W`` so non-Latin scripts keep their identity — c4_utils
  ``_hash_text`` normalizes with Python's Unicode-aware ``\\W`` before
  MD5; same idea, cheaper hash). Spans whose key normalizes to EMPTY
  (all-punctuation runs) are exempt from dedup — they carry no content
  identity and would otherwise all collide on one hash and gut each
  other.
* :func:`dedup_token_windows` — the windowed-hash approximation of
  Lee et al. 2021 (arXiv:2107.06499, "Deduplicating Training Data
  Makes Language Models Better") ExactSubstr: "when two documents
  share a substring of at least 50 tokens, remove the substring from
  one of them". Unit = whitespace token, span = ``window`` (paper: 50),
  exact keys (no normalization — ExactSubstr is exact). DEVIATIONS:
  the paper finds MAXIMAL duplicated substrings with a corpus suffix
  array and BPE tokens; fixed windows over whitespace tokens
  approximate that — a duplicated block of length L >= window is
  covered by its L-window+1 overlapping windows (their removal sets
  union to the whole block), but a duplicated run shorter than
  ``window`` is never seen, and removal boundaries land on whitespace
  tokens rather than BPE pieces. Document-scale suffix automata do not
  distribute; overlapping hashed windows are the standard shuffle-
  friendly stand-in.

Shared semantics (deviations from both papers documented):

* the single kept occurrence of a duplicated span is the global
  ``min(struct(id, span_idx))`` — a pure function of the data, where
  the reference pipelines keep whichever occurrence they happen to see
  first (order-dependent);
* a loser occurrence removes its ``span`` units (union across
  overlapping losing spans) MINUS any unit inside a kept occurrence —
  winner units are protected, so the one kept occurrence of every
  duplicated span survives intact even under chained cross-doc
  overlaps; a loser overlapping a winner is then only partially
  removed, leaving a fragment shorter than ``span`` (below the rule's
  own duplication threshold). Docs with removals are rebuilt by joining
  surviving units with ``joiner``, docs without removals keep their
  original text byte-for-byte;
* span keys are xxhash64 — a collision removes one extra span,
  negligible at 64 bits and documented rather than silent.

Scale shape: one map-side explode of (id, span_idx, hash64) — 12 bytes
a span, never the span text; one map-side-combinable groupBy(hash) min;
one join back restricted to LOSERS only (duplicated spans are a small
fraction of a real corpus, and AQE may broadcast it). The rebuild is
relational and touches AFFECTED docs only: explode their units,
anti-join the removed (id, unit_idx) rows, re-assemble in index order —
O(units) per doc with aggregation state bounded by the doc itself
(never an expression-level per-unit membership scan, which is
O(units x removed) on a fully-duplicated long doc). No step holds a
per-key list of documents, so skew on a viral span costs a combiner,
not an OOM. Token windows explode ~n_tokens rows per doc vs
~n_sentences for the C4 variant — ~20-50x more rows but still 12 B
each (a 1k-token doc is ~12 KB of exploded state, smaller than the doc).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_core_spark.functions.c4 import sentence_split

__all__ = ["dedup_three_sentence_spans", "dedup_token_windows", "span_hashes"]

_SPAN = 3

# (?U) makes Java's \W Unicode-aware (Python's re.sub(r"\W", ...) is by
# default), so Cyrillic/CJK/Greek spans keep distinct keys instead of
# all normalizing to "".
_C4_NORM = lambda s: F.regexp_replace(F.lower(s), r"(?U)[\W_]", "")  # noqa: E731


def _tokens(text: Column | str) -> Column:
    """Whitespace tokens, empties dropped (Python ``str.split()``
    semantics, same unit as ``text_quality.word_count``) — the shared
    textprims helpers, so a whitespace-semantics fix lands once there."""
    from search_engine_core_spark.functions.textprims import (
        text_or_empty,
        ws_words,
    )

    c = F.col(text) if isinstance(text, str) else text
    return ws_words(text_or_empty(c))


def _span_hash_rows(
    df: DataFrame,
    units: Column,
    id_col: str,
    span: int,
    norm: Callable[[Column], Column] | None,
) -> DataFrame:
    """(id, span_idx, span_hash) — one row per length-``span`` unit
    window. Hashes are computed inside the array transform and the span
    STRING is never materialized as a column, so the exploded relation
    is a fixed 20-ish bytes per span regardless of document size.

    The unit array is PROJECTED to a column before the window transform:
    ``units`` is an expression (a regexp sentence/word split), and
    Catalyst inlines non-attribute children at every lambda reference —
    ``F.slice(units, i+1, span)`` would re-split the document once per
    span element (the same duplicated-evaluation trap measured at ~20x
    in ``dedup.minhash_signature``; guide §4.4)."""
    key = norm or (lambda c: c)
    base = df.select(F.col(id_col).alias("id"), units.alias("_units"))
    u = F.col("_units")
    n_spans = F.size(u) - F.lit(span - 1)
    spans = F.when(
        n_spans >= 1,
        F.transform(
            F.sequence(F.lit(0), n_spans - 1),
            lambda i: F.struct(
                i.cast("int").alias("span_idx"),
                F.xxhash64(
                    key(F.concat_ws(" ", F.slice(u, i + 1, span)))
                ).alias("span_hash"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<span_idx:int,span_hash:bigint>>"))
    rows = base.select(
        "id", F.explode(spans).alias("s")
    ).select("id", "s.span_idx", "s.span_hash")
    if norm is not None:
        # spans whose key normalized to "" carry no content identity:
        # exempt them (they would all share xxhash64("") and gut every
        # all-punctuation run corpus-wide). Constant-folded comparison.
        rows = rows.filter(F.col("span_hash") != F.xxhash64(F.lit("")))
    return rows


def span_hashes(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """C4 sentence-span keys: (id, span_idx, span_hash), one row per
    normalized three-sentence span."""
    return _span_hash_rows(df, sentence_split(text_col), id_col, _SPAN, _C4_NORM)


def _dedup_spans_core(
    df: DataFrame,
    text_col: str,
    id_col: str,
    units_of: Callable[[str], Column],
    span: int,
    joiner: str,
    norm: Callable[[Column], Column] | None,
) -> DataFrame:
    """The corpus with every duplicated length-``span`` unit window kept
    exactly once (at its global ``min(id, span_idx)`` occurrence) and
    removed — unit-wise — everywhere else. Returns ``df`` with
    ``text_col`` rewritten on affected docs only; schema and row count
    unchanged (a doc whose every unit is removed keeps an empty string —
    compose with ``c4_doc_pass``/``gopher_quality_pass`` to drop it)."""
    spans = _span_hash_rows(df, units_of(text_col), id_col, span, norm)

    winners = spans.groupBy("span_hash").agg(
        F.min(F.struct("id", "span_idx")).alias("keep"),
        F.count(F.lit(1)).alias("n"),
    )
    # (id, unit_idx) rows to remove — overlapping losing spans produce
    # duplicate rows; the anti-join below absorbs them.
    dup = winners.filter(F.col("n") > 1)
    removed = (
        spans.join(dup, "span_hash")
        .filter(
            ~((F.col("id") == F.col("keep.id")) & (F.col("span_idx") == F.col("keep.span_idx")))
        )
        .select(
            "id",
            F.explode(
                F.sequence(F.col("span_idx"), F.col("span_idx") + F.lit(span - 1))
            ).alias("unit_idx"),
        )
    )
    # WINNER PROTECTION: chained overlaps can put a loser of one span on
    # top of the kept occurrence of ANOTHER (docs 'x y' / 'x y z' /
    # 'y z', window 2: removing 'x y z'-doc's losing 'x y' would destroy
    # its winning 'y z'). Subtracting every winner's units keeps the
    # "kept exactly once" invariant unconditionally; the cost is that a
    # loser overlapping a winner is only PARTIALLY removed (a fragment
    # shorter than ``span`` survives — below the rule's own threshold).
    protected = dup.select(
        F.col("keep.id").alias("id"),
        F.explode(
            F.sequence(
                F.col("keep.span_idx"), F.col("keep.span_idx") + F.lit(span - 1)
            )
        ).alias("unit_idx"),
    )
    removed = removed.join(protected, ["id", "unit_idx"], "left_anti")

    # Rebuild relationally, touching AFFECTED docs only: explode their
    # units, anti-join the removed indices, re-assemble in index order.
    # (An earlier version collected removal indices per doc and rebuilt
    # with a per-unit array_contains scan — O(units x removed) inside
    # one row's expression eval, ~2.5e9 comparisons for a fully-
    # duplicated 50k-token doc. The explode/anti-join/re-agg shape is
    # O(units) per doc and its per-row aggregation state is bounded by
    # the doc itself.)
    affected_ids = removed.select("id").distinct()
    affected_units = df.join(affected_ids, df[id_col] == affected_ids["id"]).select(
        # df[id_col] (not F.col) disambiguates when id_col == "id"
        df[id_col].alias("id"),
        F.posexplode(units_of(text_col)).alias("unit_idx", "unit"),
    )
    kept_agg = (
        affected_units.join(removed, ["id", "unit_idx"], "left_anti")
        .groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("unit_idx", "unit"))),
                    lambda s: s["unit"],
                ),
                joiner,
            ).alias("_rebuilt")
        )
    )
    # docs whose every unit was removed have no kept rows -> empty text
    rebuilt = affected_ids.join(kept_agg, "id", "left").select(
        "id", F.coalesce("_rebuilt", F.lit("")).alias("_rebuilt")
    )

    out = df.join(rebuilt, df[id_col] == rebuilt["id"], "left").drop(rebuilt["id"])
    return out.withColumn(
        text_col,
        F.when(F.col("_rebuilt").isNull(), F.col(text_col)).otherwise(F.col("_rebuilt")),
    ).drop("_rebuilt")


def dedup_three_sentence_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    joiner: str = " ",
) -> DataFrame:
    """C4's corpus-level rule: every duplicated three-sentence span kept
    exactly once, removed sentence-wise everywhere else (module
    docstring for semantics and scale shape)."""
    return _dedup_spans_core(
        df, text_col, id_col, sentence_split, _SPAN, joiner, _C4_NORM
    )


def dedup_token_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 50,
    joiner: str = " ",
) -> DataFrame:
    """Windowed-hash ExactSubstr (Lee et al. 2021): every duplicated
    ``window``-token run kept exactly once, removed token-wise
    everywhere else. A shared block of L >= window tokens loses its
    whole extent at the losing occurrences (overlapping windows tile
    it); runs shorter than ``window`` are below the rule's threshold by
    construction (module docstring for the approximation's limits)."""
    if window < 2:
        raise ValueError(f"dedup_token_windows: window must be >= 2, got {window}")
    return _dedup_spans_core(df, text_col, id_col, _tokens, window, joiner, None)
