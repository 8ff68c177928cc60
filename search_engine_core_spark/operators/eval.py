"""Offline ranking evaluation — relevance metrics over batched search output.

The reference validates its ranking quality with in-process E2E sweeps
(``tests/search_core/TestExactSearchE2E.cpp:99-146`` times and checks a
100-query batch; ``docs/architecture/SCORING_AND_RANKING.md`` documents the
expected orderings). The distributed twin of that workflow is offline
evaluation over a query log: replay N queries through
:func:`~search_engine_core_spark.operators.batch_query.search_many` (ONE
plan), join the results against a relevance-judgment table (qrels), and
compute the standard rank metrics — reciprocal rank, precision/recall@k,
average precision, and nDCG@k (Järvelin & Kekäläinen, TOIS 2002) — per
query and in aggregate. This is the eval loop every training-data /
ranker-tuning pipeline runs at scale (scorer A/B, relevance-feedback
mining, hard-negative selection).

Scale shape: everything is window + join + groupBy over the TOP-K rows per
query (k·|log| rows, never the corpus) and the qrels table — both tiny
relative to the index. The per-query windows partition by query (perfectly
parallel, no skew beyond k), the qrels join broadcasts when small, and
nothing collects on the driver: per-query metrics and the aggregate both
stay DataFrames, so a 1M-query eval is one job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_metrics(results: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """Per-query ranking metrics at cutoff ``k``.

    ``results``: (query, doc_id, score) — e.g. ``search_many`` output or
    any scored ranking; ranks are derived with the repo-wide deterministic
    tiebreak (score desc, doc_id asc). ``qrels``: (query, doc_id, rel)
    graded relevance, rel > 0 meaning relevant; binary judgments pass
    rel ∈ {0, 1} and get the classic binary forms of every metric.

    Returns one row per query in EITHER input (a query with judgments but
    zero results scores 0, not absent — silent drop-outs would inflate the
    aggregate) with columns: n_rel (judged relevant), hits (relevant in
    top-k), precision_at_k, recall_at_k, rr_at_k (reciprocal rank of the
    first relevant hit), ap_at_k (average precision, normalized by
    min(n_rel, k)), dcg_at_k / idcg_at_k / ndcg_at_k (graded, Burges
    2^rel−1 gains). Queries with no judged-relevant docs get NULL
    recall/ap/ndcg (undefined, excluded from aggregate means) and 0
    precision/rr.
    """
    # defensive dedupe BOTH sides: a duplicate (query, doc) result row
    # (e.g. a union of two scorers before fusion) would hold two ranks
    # and double-count its relevance — recall and ndcg could exceed 1.0;
    # keep the best-scored appearance, same tiebreak as ranking
    res = (
        results.select("query", "doc_id", "score")
        .groupBy("query", "doc_id")
        .agg(F.max("score").alias("score"))
    )
    # defensive dedupe: duplicate judgments for one (query, doc) would
    # fan out the results join; max-rel is the usual TREC resolution
    qr = (
        qrels.select(
            "query", "doc_id", F.col("rel").cast("double").alias("rel")
        )
        .groupBy("query", "doc_id")
        .agg(F.max("rel").alias("rel"))
    )

    w_rank = Window.partitionBy("query").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    topk = (
        res.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .join(qr, ["query", "doc_id"], "left")
        .withColumn("rel", F.coalesce("rel", F.lit(0.0)))
        .withColumn("is_rel", (F.col("rel") > 0).cast("int"))
    )
    # running relevant count up to each rank — the P(i) term of AP@k
    w_cum = (
        Window.partitionBy("query")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    topk = topk.withColumn("cum_rel", F.sum("is_rel").over(w_cum))
    gain = F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0)
    discount = F.log2(F.col("rank") + F.lit(1.0))
    got = topk.groupBy("query").agg(
        F.sum("is_rel").alias("hits"),
        F.max(
            F.when(F.col("is_rel") == 1, F.lit(1.0) / F.col("rank"))
        ).alias("_rr"),
        F.sum(gain / discount).alias("dcg_at_k"),
        F.sum(
            F.when(
                F.col("is_rel") == 1, F.col("cum_rel") / F.col("rank")
            )
        ).alias("_ap_num"),
    )

    # ideal DCG: the same gain formula over the query's judgments sorted
    # by rel desc, truncated at k (deterministic doc_id tiebreak — ties
    # have equal gain so the value is order-independent anyway)
    w_ideal = Window.partitionBy("query").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    ideal = (
        qr.filter(F.col("rel") > 0)
        .withColumn("irank", F.row_number().over(w_ideal))
        .filter(F.col("irank") <= k)
        .groupBy("query")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0))
                / F.log2(F.col("irank") + F.lit(1.0))
            ).alias("idcg_at_k")
        )
    )
    n_rel = (
        qr.groupBy("query")
        .agg(F.sum((F.col("rel") > 0).cast("long")).alias("n_rel"))
    )

    universe = res.select("query").union(qr.select("query")).distinct()
    out = (
        universe.join(n_rel, "query", "left")
        .join(got, "query", "left")
        .join(ideal, "query", "left")
        .withColumn("n_rel", F.coalesce("n_rel", F.lit(0)))
        .withColumn("hits", F.coalesce("hits", F.lit(0)))
        .withColumn("dcg_at_k", F.coalesce("dcg_at_k", F.lit(0.0)))
    )
    has_rel = F.col("n_rel") > 0
    return out.select(
        "query",
        "n_rel",
        "hits",
        F.round(F.col("hits") / F.lit(float(k)), 6).alias("precision_at_k"),
        F.round(
            F.when(has_rel, F.col("hits") / F.col("n_rel")), 6
        ).alias("recall_at_k"),
        F.round(F.coalesce("_rr", F.lit(0.0)), 6).alias("rr_at_k"),
        F.round(
            F.when(
                has_rel,
                F.coalesce("_ap_num", F.lit(0.0))
                / F.least(F.col("n_rel"), F.lit(float(k))),
            ),
            6,
        ).alias("ap_at_k"),
        F.round("dcg_at_k", 6).alias("dcg_at_k"),
        F.round(F.when(has_rel, F.col("idcg_at_k")), 6).alias("idcg_at_k"),
        F.round(
            F.when(has_rel, F.col("dcg_at_k") / F.col("idcg_at_k")), 6
        ).alias("ndcg_at_k"),
    ).orderBy("query")


def hard_negatives(results: DataFrame, qrels: DataFrame,
                   n: int = 5, skip_top: int = 0) -> DataFrame:
    """Mine hard negatives for ranker training: per query, the ``n``
    HIGHEST-ranked retrieved docs with no positive judgment — the
    near-miss examples contrastive training (DPR / cross-encoder
    distillation) wants, far harder than random negatives. ``skip_top``
    ignores the first ranks entirely (common practice: the very top
    unjudged hits are often unlabeled POSITIVES, not negatives — skip
    them rather than teach the ranker to demote them).

    Returns (query, doc_id, rank, score) with rank from the full result
    ordering. Same scale shape as :func:`rank_metrics`: windows over
    per-query results, one join against qrels, nothing on the driver.
    """
    w_rank = Window.partitionBy("query").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    ranked = results.select("query", "doc_id", "score").withColumn(
        "rank", F.row_number().over(w_rank)
    )
    positives = qrels.filter(F.col("rel") > 0).select("query", "doc_id")
    negs = (
        ranked.filter(F.col("rank") > skip_top)
        .join(positives, ["query", "doc_id"], "left_anti")
    )
    w_neg = Window.partitionBy("query").orderBy("rank")
    return (
        negs.withColumn("_nr", F.row_number().over(w_neg))
        .filter(F.col("_nr") <= n)
        .select("query", "doc_id", "rank", "score")
        .orderBy("query", "rank")
    )


def summarize_metrics(per_query: DataFrame) -> DataFrame:
    """One-row aggregate of :func:`rank_metrics` output: query count, MRR,
    MAP, mean precision/recall/nDCG@k. NULL per-query values (metrics
    undefined for judgment-less queries) are excluded by Spark's
    null-skipping avg — the TREC convention."""
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("rr_at_k"), 6).alias("mrr"),
        F.round(F.avg("ap_at_k"), 6).alias("map"),
        F.round(F.avg("precision_at_k"), 6).alias("mean_precision_at_k"),
        F.round(F.avg("recall_at_k"), 6).alias("mean_recall_at_k"),
        F.round(F.avg("ndcg_at_k"), 6).alias("mean_ndcg_at_k"),
    )
