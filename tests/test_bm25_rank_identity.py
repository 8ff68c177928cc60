"""Rank-identity: Spark engine vs the pure-Python oracle on the synthetic
corpus — docIDs AND scores must match (rel tol 1e-9, FIXTURES.md §4)."""

from __future__ import annotations

import math

import pytest

from search_engine_core_spark.engine import SearchEngine
from search_engine_core_spark.oracle import OracleIndex

QUERIES = [
    "spark",
    "spark merge",              # implicit AND
    "spark AND merge",          # explicit AND
    "spark OR merge",           # OR
    "spark OR merge OR token",  # 3-way OR
    "spark AND merge OR token", # (spark merge)|token
    "return",                   # hot term, negative IDF
    "lang:python spark",        # filter + term
    "ident_1_1",                # rare long-tail
    "config query parse",
]


@pytest.fixture(scope="module")
def engine(small_corpus):
    eng = SearchEngine(small_corpus)
    yield eng
    eng.unpersist()


@pytest.fixture(scope="module")
def oracle(small_corpus):
    rows = small_corpus.select("doc_id", "content", "lang", "repo").collect()
    docs = [(r["doc_id"], r["content"]) for r in rows]
    meta = {r["doc_id"]: {"lang": r["lang"], "repo": r["repo"]} for r in rows}
    return OracleIndex(docs, meta)


def test_stats_match(engine, oracle):
    assert engine.stats.n_docs == oracle.n
    assert math.isclose(engine.stats.avgdl, oracle.avgdl, rel_tol=1e-12)


@pytest.mark.parametrize("query", QUERIES)
def test_topk_rank_identical(engine, oracle, query):
    k = 10
    got = [(r["doc_id"], r["score"]) for r in engine.search(query, k).collect()]
    want = oracle.topk(query, k)
    assert [d for d, _ in got] == [d for d, _ in want], f"docID order differs for {query!r}"
    for (gd, gs), (wd, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9), (query, gd, gs, ws)


def test_phrase_query(engine, oracle):
    # phrase filter via substring containment (F4) + token scoring
    q = '"spark table"'
    got = [(r["doc_id"], r["score"]) for r in engine.search(q, 10).collect()]
    want = oracle.topk(q, 10)
    assert [d for d, _ in got] == [d for d, _ in want]


def test_content_sha256_invariant(small_corpus):
    import hashlib

    rows = small_corpus.select("content", "content_sha256").limit(50).collect()
    for r in rows:
        assert hashlib.sha256(r["content"].encode()).hexdigest() == r["content_sha256"]


def test_corpus_deterministic_across_parallelism(spark):
    from search_engine_core_spark.corpus import synthesize_corpus

    a = synthesize_corpus(spark, n_docs=40, partitions=2).orderBy("repo", "path").collect()
    b = synthesize_corpus(spark, n_docs=40, partitions=7).orderBy("repo", "path").collect()
    assert a == b
