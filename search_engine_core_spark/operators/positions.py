"""Positional postings sidecar (opt-in): token positions per (doc, term),
delta + varbyte encoded like the doc-gap streams in ``postings.py``.

Why: exact-phrase retrieval today needs the content column — the planner
semi-joins the phrase's token postings then substring-verifies with
``instr`` (``plans/planner.py`` F4). On a slim index
(``store_content=False``, the 100 TB shape where content stays in the
source Iceberg table) that meant ``attach_content`` re-joining the corpus
per query. A positions sidecar answers phrases from the index alone.

Semantics note (documented deviation ladder):
* The reference's FT.SEARCH exact phrase is RediSearch POSITIONAL
  token-adjacency matching; ``SearchScorer.cpp:116-125`` then
  substring-checks the hits. So reference semantics = adjacency ∧
  substring-on-hits.
* Our content path (F4) approximates that as has-all-tokens ∧ substring.
* With positions, the prefilter tightens to token-ADJACENCY ∧ substring —
  strictly closer to the reference (RediSearch would drop a doc whose
  phrase tokens never sit adjacent, e.g. a cross-token substring match
  like ``"aspark table"`` for phrase ``"spark table"`` — so do we).
* On a slim index without content, adjacency alone answers the phrase
  (pure RediSearch semantics, no substring pass) — the content-free mode.

Scale shape: position extraction is MAP-SIDE per doc (all of a doc's
positions live in its own row — no per-occurrence shuffle); the single
shuffle is the bucket repartition for the partitioned write. Query-time
reads are bucket-pruned to the phrase's terms, and the adjacency check is
per-doc column algebra (array_intersect over shifted position arrays) —
no UDF in the join, Python only in the Arrow decode of the tiny pruned
slice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_core_spark.functions.varbyte import vb_decode, vb_encode

POSITIONS_SCHEMA = "doc_id long, term string, npos int, pos_bytes binary"


def position_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, content) -> (doc_id, term, npos, pos_bytes): varbyte of
    (first_pos, gaps...) over the canonical tokenizer's token indices.
    Map-side only — a doc's positions never leave its input partition."""
    from search_engine_core_spark.functions.tokenizer import tokenize_py

    def gen(batches):
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "term": [], "npos": [], "pos_bytes": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                toks = tokenize_py(content or "")
                if not toks:
                    continue
                codes, uniques = pd.factorize(np.asarray(toks, dtype=object))
                order = np.argsort(codes, kind="stable")
                sorted_codes = codes[order]
                bounds = np.flatnonzero(
                    np.concatenate(([True], sorted_codes[1:] != sorted_codes[:-1]))
                )
                ends = np.concatenate((bounds[1:], [sorted_codes.size]))
                for b, e in zip(bounds, ends):
                    # stable sort keeps equal-key order -> positions ascending
                    pos = order[b:e].astype(np.uint64)
                    deltas = np.diff(pos, prepend=np.uint64(0))
                    deltas[0] = pos[0]
                    out["doc_id"].append(int(doc_id))
                    out["term"].append(str(uniques[sorted_codes[b]]))
                    out["npos"].append(int(e - b))
                    out["pos_bytes"].append(vb_encode(deltas))
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return docs.select("doc_id", "content").mapInPandas(gen, POSITIONS_SCHEMA)


def _decode_positions_udf():
    """pandas UDF: (npos, pos_bytes) -> array<int> of absolute positions.
    Type objects, not DDL strings (Spark 4 module-level UDF gotcha)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def dec(npos: pd.Series, buf: pd.Series) -> pd.Series:
        return pd.Series(
            [
                np.cumsum(vb_decode(b, count=int(n))).astype(np.int64).tolist()
                if n
                else []
                for n, b in zip(npos, buf)
            ]
        )

    return dec


def phrase_candidate_docs(positions: DataFrame, tokens: list[str]) -> DataFrame:
    """doc_ids where ``tokens`` occur at CONSECUTIVE token positions.

    m-way doc_id equi-join of the phrase terms' (bucket-pruned) position
    slices, then one expression: start positions =
    P0 ∩ (P1 - 1) ∩ ... ∩ (P_{m-1} - (m-1)); a doc qualifies iff the
    intersection is non-empty. Duplicate phrase tokens reuse the same
    slice under a fresh column alias (``"a b a"`` works)."""
    if not tokens:
        return positions.select("doc_id").limit(0)
    dec = _decode_positions_udf()
    out = None
    for i, t in enumerate(tokens):
        s = positions.filter(F.col("term") == t).select(
            "doc_id", dec(F.col("npos"), F.col("pos_bytes")).alias(f"_p{i}")
        )
        out = s if out is None else out.join(s, "doc_id", "inner")
    def _shift(offset: int):
        # single-arg lambda ONLY: F.transform passes the element index as a
        # second argument to two-parameter callables, so a `lambda x, i=i`
        # capture would have its offset silently overridden per element
        return lambda x: x - offset

    starts = F.col("_p0")
    for i in range(1, len(tokens)):
        starts = F.array_intersect(starts, F.transform(F.col(f"_p{i}"), _shift(i)))
    return out.filter(F.size(starts) > 0).select("doc_id")


def decode_positions_df(positions: DataFrame) -> DataFrame:
    """(doc_id, term, positions array<int>) — test/debug surface."""
    dec = _decode_positions_udf()
    return positions.select(
        "doc_id", "term", dec(F.col("npos"), F.col("pos_bytes")).alias("positions")
    )
