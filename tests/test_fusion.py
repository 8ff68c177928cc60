"""Hybrid search: reciprocal-rank fusion (operators/fusion.py) plus the
absorbed q27 assertion — the full sign-bit bucket histogram is pinned
against a numpy twin here (the driver row q28 checks the query bucket's
count via bucket_n; this covers every other bucket)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_rrf_known_values(spark):
    """Hand-checkable fusion: RRF score is exactly sum(1/(60+rank))."""
    from search_engine_core_spark.operators.fusion import hybrid_rrf_topk

    lex = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double"
    )
    vec = spark.createDataFrame(
        [(2, 0.9), (4, 0.8)], "vec_id long, cos_sim double"
    )
    got = {r["doc_id"]: r["rrf_score"]
           for r in hybrid_rrf_topk(lex, vec, k=10).collect()}
    assert got == {
        1: round(1 / 61, 6),              # lex rank 1 only
        2: round(1 / 62 + 1 / 61, 6),     # lex rank 2 + vec rank 1
        3: round(1 / 63, 6),              # lex rank 3 only
        4: round(1 / 62, 6),              # vec rank 2 only (no imputed rank)
    }
    # both-list membership dominates: doc 2 outranks every single-list doc
    order = [r["doc_id"]
             for r in hybrid_rrf_topk(lex, vec, k=10).collect()]
    assert order[0] == 2


def test_rrf_rank_recomputed_and_deterministic(spark):
    """Ranks come from (score desc, id asc), not physical row order —
    a shuffled input fuses identically; ties break toward the lower id."""
    from search_engine_core_spark.operators.fusion import hybrid_rrf_topk

    rows = [(i, float(100 - i)) for i in range(1, 21)] + [(99, 80.0)]  # tie w/ 20
    lex = spark.createDataFrame(rows, "doc_id long, score double")
    vec = spark.createDataFrame([(5, 0.5)], "vec_id long, cos_sim double")
    a = hybrid_rrf_topk(lex, vec, k=21, n_cand=30).collect()
    b = hybrid_rrf_topk(lex.repartition(8), vec, k=21, n_cand=30).collect()
    assert [(r["doc_id"], r["rrf_score"]) for r in a] == [
        (r["doc_id"], r["rrf_score"]) for r in b
    ]
    got = {r["doc_id"]: r["rrf_score"] for r in a}
    # doc 20 (score 80.0) ties doc 99: lower id ranks first
    assert got[20] == round(1 / 80, 6) and got[99] == round(1 / 81, 6)


def test_rrf_n_cand_truncates(spark):
    from search_engine_core_spark.operators.fusion import hybrid_rrf_topk

    lex = spark.createDataFrame(
        [(i, float(10 - i)) for i in range(5)], "doc_id long, score double"
    )
    vec = spark.createDataFrame([], "vec_id long, cos_sim double")
    got = {r["doc_id"] for r in hybrid_rrf_topk(lex, vec, k=10, n_cand=2).collect()}
    assert got == {0, 1}  # ranks 3..5 cut before fusion


def test_rrf_fuse_three_lists(spark):
    """The fuse generalizes past two lists (e.g. BM25 + ANN + recency)."""
    from search_engine_core_spark.operators.fusion import ranked, rrf_fuse

    mk = lambda rows: ranked(
        spark.createDataFrame(rows, "doc_id long, s double"), "s", "doc_id"
    )
    got = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse(
            [mk([(1, 3.0), (2, 2.0)]), mk([(1, 9.0)]), mk([(2, 1.0), (1, 0.5)])],
            k=10,
        ).collect()
    }
    assert got == {
        1: round(1 / 61 + 1 / 61 + 1 / 62, 6),
        2: round(1 / 62 + 1 / 61, 6),
    }


def test_bucket_histogram_matches_numpy_twin(spark):
    """Absorbed q27: signbit_bucket over EVERY vector matches the numpy
    recomputation bucket-for-bucket (driver row q28 covers the query's
    bucket; this covers the rest)."""
    from search_engine_core_spark.operators import similarity

    emb = spark.read.parquet(SF_EMB)
    got = {
        r["bucket"]: r["n"]
        for r in emb.select(
            similarity.signbit_bucket(F.col("embedding"), 8).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    bits = (vecs[:, :8] > 0).astype(np.int64)
    buckets = bits @ (1 << np.arange(8))
    want_ids, want_ns = np.unique(buckets, return_counts=True)
    assert got == dict(zip(want_ids.tolist(), want_ns.tolist()))


def test_lsh_topk_bucket_n_matches_numpy(spark):
    from search_engine_core_spark.operators import similarity

    emb = spark.read.parquet(SF_EMB)
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    qvec = [float(x) for x in qrow["embedding"]]
    out = similarity.lsh_topk(
        emb.filter(F.col("vec_id") != 0), qvec, 5, n_bits=8, with_bucket_n=True
    ).collect()
    rows = emb.filter(F.col("vec_id") != 0).collect()
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    buckets = (vecs[:, :8] > 0).astype(np.int64) @ (1 << np.arange(8))
    qb = int((np.array(qvec[:8]) > 0).astype(np.int64) @ (1 << np.arange(8)))
    want_n = int((buckets == qb).sum())
    assert out and all(r["bucket_n"] == want_n for r in out)
