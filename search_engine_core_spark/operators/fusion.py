"""Reciprocal-rank fusion — hybrid lexical × vector search.

The reference serves lexical-only FT.SEARCH (``src/search_api.cpp:194-378``);
fusing its ranking with an embedding ANN ranking is the standard hybrid
upgrade a modern deployment of it would run, and RRF (Cormack, Clarke &
Büttcher, SIGIR 2009: ``score(d) = Σ_lists 1/(k + rank_list(d))``) is the
fusion rule Elasticsearch / OpenSearch / Vespa all default to because it
needs no score calibration between the BM25 and cosine scales — only the
two engines' RANKS, which this repo already pins deterministic
(double-rounded score desc, id asc) on both the Spark and oracle sides.

Scale shape: each input ranking is already a tiny top-n DataFrame (n_cand
rows, collected nowhere); fusion is a unionByName + groupBy over
≤ Σ n_cand rows — negligible next to the searches themselves, no full-table
work, and embarrassingly parallel. At 100 TB the cost of hybrid search IS
the cost of its two legs (WAND postings probe + ANN index probe); the fuse
step stays O(k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: the RRF dampening constant from the SIGIR'09 paper; 60 is the value
#: virtually every production implementation ships as default
DEFAULT_K_RRF = 60


def ranked(df: DataFrame, score_col: str, id_col: str,
           n_cand: int | None = None) -> DataFrame:
    """(id, rank) from a scored frame: rank = row_number over
    (score desc, id asc) — the repo-wide deterministic tiebreak, so the
    rank column is identical across engines whenever the (already
    double-rounded) scores are. ``n_cand`` truncates the list — RRF input
    lists are top-n by construction, and the (score, id) ordering makes
    the n-boundary deterministic too."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    out = df.select(F.col(id_col).alias("id"), F.row_number().over(w).alias("rank"))
    return out.filter(F.col("rank") <= n_cand) if n_cand is not None else out


def rrf_contrib(rank: Column, k_rrf: int = DEFAULT_K_RRF) -> Column:
    """One list's contribution for a row at ``rank`` (1-based)."""
    return F.lit(1.0) / (F.lit(float(k_rrf)) + rank.cast("double"))


def rrf_fuse(rankings: list[DataFrame], k: int = 10,
             k_rrf: int = DEFAULT_K_RRF, id_col: str = "doc_id") -> DataFrame:
    """Fuse N (id, rank) lists into a top-k by reciprocal-rank score.

    Output: (``id_col``, rrf_score) — rrf_score rounded to 6 dp (each
    term is ≤ 1/(k_rrf+1) ≈ 0.016; cross-engine ULP noise in a ≤N-term
    double sum is ~1e-16, far below the rounding grain, so the emitted
    value and the (score desc, id asc) k-boundary are deterministic).
    A document absent from one list simply contributes nothing for it —
    the SIGIR'09 convention (no imputed rank)."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contribs = [
        r.select(F.col("id"), rrf_contrib(F.col("rank"), k_rrf).alias("c"))
        for r in rankings
    ]
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    return (
        allc.groupBy("id")
        .agg(F.round(F.sum("c"), 6).alias("rrf_score"))
        .select(F.col("id").alias(id_col), "rrf_score")
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )


def hybrid_rrf_topk(
    lexical: DataFrame,
    vector: DataFrame,
    k: int = 10,
    n_cand: int = 30,
    k_rrf: int = DEFAULT_K_RRF,
    lex_score: str = "score",
    lex_id: str = "doc_id",
    vec_score: str = "cos_sim",
    vec_id: str = "vec_id",
) -> DataFrame:
    """Hybrid search: RRF-fuse a lexical (BM25) result with a vector
    (cosine) result sharing the same document key space. Both inputs are
    scored frames (typically each engine's own top-n); ranks are
    recomputed here under the deterministic (score desc, id asc) order so
    the fusion is insensitive to the inputs' physical row order."""
    lex = ranked(lexical, lex_score, lex_id, n_cand)
    vec = ranked(vector, vec_score, vec_id, n_cand)
    return rrf_fuse([lex, vec], k=k, k_rrf=k_rrf, id_col=lex_id)
