"""BM25 / TF-IDF scoring math as Catalyst column expressions.

Formula parity with the reference (all-JVM, no Python in the plan):

  F6 BM25 IDF   : log((N - df + 0.5) / (df + 0.5))
                  (``src/scoring/SearchScorer.cpp:265-266``) — NOTE: goes
                  negative for df > N/2; the reference does NOT clamp, so
                  neither do we (hot terms legitimately subtract).
  F7 BM25 TF    : tf*(k1+1) / (tf + k1*(1 - b + b*doclen/avgdl)),
                  k1=1.2, b=0.75 (``SearchScorer.cpp:268-273``;
                  defaults ``SearchScorer.h:39-42``).
  F5 capped/log TF (TF-IDF path): min(tf, 10) then log(1+tf)
                  (``SearchScorer.cpp:66-82``; defaults ``SearchScorer.h:32-36``).
  F8 TF-IDF IDF : log(N / df), df defaulting to 1 for unseen terms
                  (``SearchScorer.cpp:377-382``).
  F11 combined  : 0.3*base + 0.7*custom (``SearchScorer.cpp:399-412``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75
TF_CAP = 10.0
MIN_SCORE = 0.01  # P4 default threshold (SearchScorer.h:53)


def bm25_idf(df_col: Column, n_docs: int) -> Column:
    """F6 — unclamped Robertson IDF."""
    return F.log((F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5))


def bm25_tf(tf_col: Column, doclen_col: Column, avgdl: float, k1: float = K1, b: float = B) -> Column:
    """F7 — length-normalized TF saturation."""
    norm = doclen_col.cast("double") / F.lit(float(avgdl))
    return (tf_col * (k1 + 1.0)) / (tf_col + k1 * (1.0 - b + b * norm))


def bm25_term_score(tf_col: Column, df_col: Column, doclen_col: Column, n_docs: int, avgdl: float) -> Column:
    """Per-(doc, term) BM25 contribution; sum per doc for the total."""
    return bm25_idf(df_col, n_docs) * bm25_tf(tf_col, doclen_col, avgdl)


def capped_log_tf(tf_col: Column, cap: float = TF_CAP) -> Column:
    """F5 — cap then log1p (TF-IDF path default-on behaviors)."""
    return F.log(1.0 + F.least(tf_col.cast("double"), F.lit(cap)))


def tfidf_idf(df_col: Column, n_docs: int) -> Column:
    """F8 — log(N/df) with the reference's df-defaults-to-1 quirk."""
    return F.log(F.lit(float(n_docs)) / F.coalesce(df_col, F.lit(1)).cast("double"))


def combined_score(base: Column, custom: Column, redis_weight: float = 0.3) -> Column:
    """F11 — the RedisSearchCombined weighting."""
    return base * redis_weight + custom * (1.0 - redis_weight)


def minmax_normalize(score: Column, min_c: Column, max_c: Column) -> Column:
    """A10 — rescale to [0,1]; identity when the range collapses
    (``SearchScorer.cpp:527-546`` leaves scores untouched if range == 0)."""
    rng = max_c - min_c
    return F.when(rng > 0, (score - min_c) / rng).otherwise(score)
