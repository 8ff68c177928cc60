"""search_many: batched multi-query evaluation (operators/batch_query).

Rank identity vs per-query ``search`` on both engines, routing split
(vectorized plain shapes vs per-query Planner subtrees), duplicate-query
collapse, and the one-scan contract (the vectorized part's plan holds no
postings FileScan — the batch decoded once up front).
"""

from __future__ import annotations

import math

import pytest

from search_engine_core_spark.engine import IndexSearchEngine, SearchEngine
from search_engine_core_spark.sources.index_io import IndexBuilder

BATCH = [
    "spark merge",                 # plain AND -> vectorized
    "spark OR merge OR token",     # plain OR  -> vectorized
    "ident_1_1",                   # single term -> vectorized
    "zzz_nosuchterm",              # vectorized, empty result
    '"spark table" merge',         # phrase    -> planner subtree
    "lang:python spark",           # filter    -> planner subtree
    "(config OR query) parse",     # mixed precedence -> planner subtree
]
N_VECTORIZED, N_PLANNER = 4, 3


@pytest.fixture(scope="module")
def ieng(spark, small_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bq") / "idx")
    IndexBuilder(spark, d, n_buckets=4, hot_df_threshold=50, n_shards=4).build(
        small_corpus
    )
    return IndexSearchEngine(spark, d, n_buckets=4)


def _by_query(df) -> dict[str, list[tuple[int, float]]]:
    out: dict[str, list[tuple[int, float]]] = {}
    for r in df.collect():  # already ordered (query, score desc, doc_id)
        out.setdefault(r["query"], []).append((r["doc_id"], r["score"]))
    return out


def _assert_identity(engine, batch_result):
    got = _by_query(batch_result)
    for q in BATCH:
        single = [
            (r["doc_id"], r["score"]) for r in engine.search(q, 10).collect()
        ]
        batch = got.get(q, [])
        assert [d for d, _ in batch] == [d for d, _ in single], f"rank drift: {q}"
        for (_, gs), (_, ns) in zip(batch, single):
            assert math.isclose(gs, ns, rel_tol=1e-9), f"score drift: {q}"


def test_index_engine_batch_rank_identity(ieng):
    res = ieng.search_many(BATCH, k=10)
    assert ieng.last_batch_stats == {
        "vectorized": N_VECTORIZED,
        "planner": N_PLANNER,
    }
    _assert_identity(ieng, res)


def test_inmemory_engine_batch_rank_identity(small_corpus):
    eng = SearchEngine(small_corpus)
    res = eng.search_many(BATCH, k=10)
    assert eng.last_batch_stats == {
        "vectorized": N_VECTORIZED,
        "planner": N_PLANNER,
    }
    _assert_identity(eng, res)


def test_duplicate_queries_collapse(ieng):
    dup = ieng.search_many(["spark merge", "spark merge"], k=5)
    single = ieng.search_many(["spark merge"], k=5)
    assert dup.collect() == single.collect()


def test_vectorized_batch_has_no_postings_scan(ieng):
    """One-scan contract: all-plain batches decode the union term set once
    (checkpoint-materialized) — the returned plan must NOT re-scan the
    postings dir per query."""
    res = ieng.search_many(["spark merge", "spark OR token", "return"], k=5)
    assert ieng.last_batch_stats == {"vectorized": 3, "planner": 0}
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "postings" not in plan, "vectorized batch re-scanned postings"
    assert len(res.collect()) > 0


def test_tfidf_batch_routes_planner(ieng):
    res = ieng.search_many(["spark merge"], k=5, algorithm="tfidf")
    assert ieng.last_batch_stats == {"vectorized": 0, "planner": 1}
    single = [
        (r["doc_id"], r["score"])
        for r in ieng.search("spark merge", 5, algorithm="tfidf").collect()
    ]
    got = [(r["doc_id"], r["score"]) for r in res.collect()]
    assert [d for d, _ in got] == [d for d, _ in single]


def test_fielded_batch_rank_identity(ieng, small_corpus):
    """algorithm='fielded' batches through the flagship fielded scorer —
    rank-identical per query to search(algorithm='fielded') on BOTH
    engines (an unrouted batch used to crash in Planner.scored_ast
    after paying the decode)."""
    queries = ["spark merge", '"spark table" config', "lang:python spark"]
    for engine in (ieng, SearchEngine(small_corpus)):
        res = engine.search_many(queries, k=5, algorithm="fielded")
        assert engine.last_batch_stats == {
            "vectorized": 0, "planner": 0, "fielded": 3,
        }
        got = _by_query(res)
        for q in queries:
            single = [
                (r["doc_id"], r["score"])
                for r in engine.search(q, 5, algorithm="fielded").collect()
            ]
            batch = got.get(q, [])
            assert [d for d, _ in batch] == [d for d, _ in single], q
            for (_, gs), (_, ns) in zip(batch, single):
                assert math.isclose(gs, ns, rel_tol=1e-9), q


def test_search_wand_rejects_filters(ieng):
    """A field filter changes result MEMBERSHIP; the explicit WAND entry
    must refuse rather than silently score an unfiltered OR."""
    with pytest.raises(ValueError, match="field filter"):
        ieng.search_wand("lang:python spark", 5)


def test_empty_batch(ieng):
    assert ieng.search_many([], k=5).count() == 0


def test_lsm_engine_batch_rank_identity(spark, small_corpus, tmp_path):
    """Three-engine parity: search_many over the LSM view (main ∖ sup ⊎
    segment ⊎ live delta, incl. a re-crawled doc spanning tiers) must be
    rank-identical to per-query DeltaSearchEngine.search — which routes
    plain shapes through WAND-over-LSM, so this also pins the batched
    merged-df computation against the WAND merged stats."""
    from pyspark.sql import functions as F

    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.streaming.incremental import (
        DeltaSearchEngine,
        minor_compact,
        start_incremental_index,
    )

    base = small_corpus.select("repo", "path", "commit", "lang", "content")
    h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(3))
    parts = [base.filter(h == i) for i in range(3)]
    idx = str(tmp_path / "idx")
    IndexBuilder(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4).build(
        parts[0]
    )
    # delta gen1: part1 + a re-crawl of 2 main docs -> minor-compacted seg
    recrawl = spark.createDataFrame(
        [
            (r["repo"], r["path"], r["commit"], r["lang"],
             "updbatch spark table merge " + r["content"][:40])
            for r in parts[0].limit(2).collect()
        ],
        base.schema,
    )
    inbox, ckpt = str(tmp_path / "inbox"), str(tmp_path / "ckpt")
    parts[1].unionByName(recrawl).write.parquet(f"{inbox}/b1")
    q = start_incremental_index(spark, f"{inbox}/b*", idx, ckpt)
    q.awaitTermination(120)
    assert minor_compact(spark, idx, n_buckets=4, hot_df_threshold=100,
                         n_shards=4) == 0
    # delta gen2 stays live level-0
    parts[2].write.parquet(f"{inbox}/b2")
    q = start_incremental_index(spark, f"{inbox}/b*", idx, ckpt)
    q.awaitTermination(120)

    deng = DeltaSearchEngine(spark, idx, n_buckets=4)
    batch = BATCH + ["updbatch"]  # lives ONLY in the segment tier
    res = deng.search_many(batch, k=10)
    assert deng.last_batch_stats == {
        "vectorized": N_VECTORIZED + 1,
        "planner": N_PLANNER,
    }
    got = _by_query(res)
    for qq in batch:
        single = [
            (r["doc_id"], r["score"]) for r in deng.search(qq, 10).collect()
        ]
        mine = got.get(qq, [])
        assert [d for d, _ in mine] == [d for d, _ in single], f"rank drift: {qq}"
        for (_, gs), (_, ns) in zip(mine, single):
            assert math.isclose(gs, ns, rel_tol=1e-9), f"score drift: {qq}"


def test_vectorized_batch_plan_shape(ieng):
    """Perf regression pin: the vectorized candidate aggregation must be a
    Tungsten HashAggregate (keeping _mode/_n_toks out of the agg buffer —
    a first(...) there forces SortAggregate, a full sort of the fan-out
    rows that measured ~10x the CPU on a 128-query replay), and the
    doclen join must broadcast at small-corpus scale, not sort-merge."""
    res = ieng.search_many(["spark merge", "spark OR token"], k=5)
    assert ieng.last_batch_stats == {"vectorized": 2, "planner": 0}
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan, plan
    assert "SortAggregate" not in plan, "agg degraded to SortAggregate"
    assert "SortMergeJoin" not in plan, "doclen join degraded to SMJ"
    assert len(res.collect()) > 0
