"""The cached-response layer (reference parity:
``docs/PERFORMANCE_OPTIMIZATIONS_SUMMARY.md:14-20`` — Redis result cache,
2 ms cached vs 150 ms uncached). Engines pin an immutable snapshot at
open, so the per-engine LRU is coherent by construction; these tests pin
identity of replayed rows, that a hit really runs no search, LRU
eviction, and availability on all three engines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    from search_engine_core_spark.corpus import synthesize_corpus, with_doc_columns

    return with_doc_columns(synthesize_corpus(spark, n_docs=120, tokens_per_doc=80)).cache()


def _rows(df):
    # round scores: engines may differ in the last ulp (summation order),
    # same convention as the rank-identity tests
    return [(r["doc_id"], round(r["score"], 6)) for r in df.collect()]


def test_cached_identity_and_no_recompute(spark, corpus, monkeypatch):
    from search_engine_core_spark.engine import SearchEngine

    eng = SearchEngine(corpus)
    cold = _rows(eng.search_cached("spark merge", 5))
    assert cold == _rows(eng.search("spark merge", 5))

    calls = []
    real = type(eng).search
    monkeypatch.setattr(type(eng), "search",
                        lambda self, *a, **kw: (calls.append(a), real(self, *a, **kw))[1])
    warm = _rows(eng.search_cached("spark merge", 5))
    assert warm == cold
    assert calls == []  # a hit runs no search at all
    # different k / algorithm are distinct entries -> both recompute
    eng.search_cached("spark merge", 7)
    eng.search_cached("spark merge", 5, algorithm="tfidf")
    assert len(calls) == 2
    eng.unpersist()


def test_cached_lru_eviction(spark, corpus, monkeypatch):
    from search_engine_core_spark.engine import SearchEngine

    eng = SearchEngine(corpus)
    monkeypatch.setattr(type(eng), "CACHE_MAX", 2)
    for q in ("spark", "merge", "token"):
        eng.search_cached(q, 3)
    assert len(eng._result_cache) == 2  # oldest evicted
    assert ("spark", 3, "bm25") not in eng._result_cache
    # re-asking the evicted query recomputes and re-enters
    calls = []
    real = type(eng).search
    monkeypatch.setattr(type(eng), "search",
                        lambda self, *a, **kw: (calls.append(a), real(self, *a, **kw))[1])
    eng.search_cached("spark", 3)
    assert len(calls) == 1
    eng.unpersist()


def test_cached_on_index_and_delta_engines(spark, corpus, tmp_path):
    from search_engine_core_spark.engine import IndexSearchEngine, SearchEngine
    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.streaming.incremental import DeltaSearchEngine

    idx = str(tmp_path / "idx")
    IndexBuilder(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4).build(
        corpus.select("repo", "path", "commit", "lang", "content")
    )
    want = _rows(SearchEngine(corpus).search("spark merge", 5))
    for eng in (IndexSearchEngine(spark, idx, n_buckets=4),
                DeltaSearchEngine(spark, idx, n_buckets=4)):
        assert _rows(eng.search_cached("spark merge", 5)) == want
        assert _rows(eng.search_cached("spark merge", 5)) == want  # warm


def test_cached_concurrent_hits_and_misses(spark, corpus):
    """A serving tier drives one engine from many driver threads (the
    reference's uWS workers share one Redis cache): concurrent mixed
    hits/misses must neither corrupt the LRU nor return wrong rows."""
    from concurrent.futures import ThreadPoolExecutor

    from search_engine_core_spark.engine import SearchEngine

    eng = SearchEngine(corpus)
    queries = ["spark", "merge", "token", "spark merge"]
    want = {q: _rows(eng.search(q, 5)) for q in queries}

    def hammer(i):
        q = queries[i % len(queries)]
        return q, _rows(eng.search_cached(q, 5))

    with ThreadPoolExecutor(max_workers=8) as ex:
        for q, got in ex.map(hammer, range(32)):
            assert got == want[q]
    assert set(eng._result_cache) == {(q, 5, "bm25") for q in queries}
    eng.unpersist()
