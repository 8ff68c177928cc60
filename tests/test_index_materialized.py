"""Materialized index: postings roundtrip, salted==unsalted, checkpoint
resume (crash -> resume -> identical index), WAND == naive ranks."""

from __future__ import annotations

import math
import shutil

import pytest
from pyspark.sql import functions as F

from search_engine_core_spark.engine import IndexSearchEngine, SearchEngine
from search_engine_core_spark.operators.postings import (
    build_postings,
    decode_postings_df,
)
from search_engine_core_spark.operators.stats import doc_frequency, triples
from search_engine_core_spark.sources.index_io import BuildAborted, IndexBuilder

QUERIES = [
    "spark merge",
    "spark OR merge OR token",
    "return",
    "config query parse",
    "ident_1_1 OR spark",
    "lang:python spark",
    '"spark table"',
]


@pytest.fixture(scope="module")
def built_index(spark, small_corpus, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx") / "index")
    IndexBuilder(spark, idx, n_buckets=4, hot_df_threshold=50, n_shards=4).build(small_corpus)
    return idx


def _triple_set(df):
    return {(r["doc_id"], r["term"], r["tf"]) for r in df.collect()}


def test_postings_roundtrip(spark, small_corpus):
    trip = triples(small_corpus)
    dfreq = doc_frequency(trip)
    postings = build_postings(trip, dfreq, hot_df_threshold=10**9, n_shards=1)
    decoded = decode_postings_df(postings)
    assert _triple_set(decoded) == _triple_set(trip)


def test_raw_occurrence_input_equals_preaggregated(spark, small_corpus):
    """The encoder's run-length tf on raw token occurrences must produce
    the same postings as pre-aggregated (doc_id, term, tf) triples."""
    from search_engine_core_spark.functions.tokenizer import tokenize_expr

    trip = triples(small_corpus).cache()
    dfreq = doc_frequency(trip)
    occ = small_corpus.select(
        "doc_id", F.explode(tokenize_expr("content")).alias("term")
    )
    via_agg = build_postings(trip, dfreq, hot_df_threshold=30, n_shards=4)
    via_raw = build_postings(occ, dfreq, hot_df_threshold=30, n_shards=4)
    assert _triple_set(decode_postings_df(via_agg)) == _triple_set(decode_postings_df(via_raw))
    trip.unpersist()


def test_salted_equals_unsalted(spark, small_corpus):
    trip = triples(small_corpus).cache()
    dfreq = doc_frequency(trip).cache()
    plain = build_postings(trip, dfreq, hot_df_threshold=10**9, n_shards=1)
    salted = build_postings(trip, dfreq, hot_df_threshold=30, n_shards=4)
    assert _triple_set(decode_postings_df(plain)) == _triple_set(decode_postings_df(salted))
    # hot terms really did get sharded
    n_hot_rows = salted.filter(F.col("shard") > 0).count()
    assert n_hot_rows > 0, "expected hot terms to produce shard>0 rows"
    # cold-term rows byte-identical between the two builds
    cold = dfreq.filter(F.col("df") <= 30).select("term")
    p1 = {r["term"]: (r["doc_gaps"], r["tfs"]) for r in plain.join(cold, "term").collect()}
    p2 = {r["term"]: (r["doc_gaps"], r["tfs"]) for r in salted.join(cold, "term").collect()}
    assert p1 == p2
    trip.unpersist()
    dfreq.unpersist()


def test_checkpoint_resume_identical(spark, small_corpus, tmp_path):
    clean_dir = str(tmp_path / "clean")
    crash_dir = str(tmp_path / "crash")
    IndexBuilder(spark, clean_dir, n_buckets=4, hot_df_threshold=50).build(small_corpus)
    crash_builder = IndexBuilder(
        spark, crash_dir, n_buckets=4, hot_df_threshold=50, commit_group=1
    )
    with pytest.raises(BuildAborted):
        crash_builder.build(small_corpus, fail_after_buckets=2)
    ck = spark.read.parquet(f"{crash_dir}/_checkpoint")
    done_before = ck.filter(
        (F.col("stage") == "postings") & (F.col("status") == "completed")
    ).count()
    assert done_before == 2
    # resume completes only the remaining buckets
    crash_builder.build(small_corpus)
    ck2 = spark.read.parquet(f"{crash_dir}/_checkpoint")
    assert ck2.filter(
        (F.col("stage") == "postings") & (F.col("status") == "completed")
    ).count() == 4
    # attempts recorded: resume rows carry a higher attempt
    assert ck2.agg(F.max("attempt")).collect()[0][0] >= 2
    # final postings semantically identical to the clean build
    a = decode_postings_df(spark.read.parquet(f"{clean_dir}/postings"))
    b = decode_postings_df(spark.read.parquet(f"{crash_dir}/postings"))
    assert _triple_set(a) == _triple_set(b)
    shutil.rmtree(crash_dir)


def test_resume_is_noop_when_complete(spark, small_corpus, built_index):
    ck_before = spark.read.parquet(f"{built_index}/_checkpoint").count()
    IndexBuilder(spark, built_index, n_buckets=4, hot_df_threshold=50, n_shards=4).build(
        small_corpus
    )
    ck_after = spark.read.parquet(f"{built_index}/_checkpoint").count()
    assert ck_after == ck_before  # nothing re-ran, nothing re-logged


@pytest.fixture(scope="module")
def engines(spark, small_corpus, built_index):
    mem = SearchEngine(small_corpus)
    idx = IndexSearchEngine(spark, built_index, n_buckets=4)
    yield mem, idx
    mem.unpersist()


@pytest.mark.parametrize("query", QUERIES)
def test_materialized_matches_inmemory(engines, query):
    mem, idx = engines
    a = [(r["doc_id"], r["score"]) for r in mem.search(query, 10).collect()]
    b = [(r["doc_id"], r["score"]) for r in idx.search(query, 10).collect()]
    assert [d for d, _ in a] == [d for d, _ in b]
    for (_, sa), (_, sb) in zip(a, b):
        assert math.isclose(sa, sb, rel_tol=1e-9)


@pytest.mark.parametrize(
    "query", ["spark merge", "spark OR merge OR token", "return", "spark AND merge", "ident_1_1 OR spark"]
)
def test_wand_matches_naive(engines, query):
    mem, idx = engines
    want = [(r["doc_id"], r["score"]) for r in mem.search(query, 10).collect()]
    got = [(r["doc_id"], r["score"]) for r in idx.search_wand(query, 10).collect()]
    assert [d for d, _ in got] == [d for d, _ in want], query
    for (_, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9)


@pytest.mark.parametrize("terms", [["spark", "merge", "token"], ["merge", "data", "value"]])
def test_wand_survivor_cap_overflow_rank_identical(engines, terms):
    """Adversarial shape for the r3 unbounded pass-2 collect: an OR query
    over mid-frequency terms where θ prunes weakly. survivor_cap=0 forces
    the overflow branch (any survivor trips the sentinel), which must fall
    back to the distributed full decode and stay rank-identical — pruned
    triples alone may under-score a survivor whose other-term blocks were
    θ-pruned."""
    mem, idx = engines
    query = " OR ".join(terms)
    want = [(r["doc_id"], r["score"]) for r in mem.search(query, 10).collect()]
    got = [
        (r["doc_id"], r["score"])
        for r in idx.search_wand(query, 10, survivor_cap=0).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9)


class TestQueryObservability:
    """engine.last_query_stats — the per-query diagnostics a serving tier
    monitors (route taken, seed size, θ, early exit, fallback labels).
    Values are scalars the driver already held; the contract here is that
    the trace matches what the query actually did."""

    def test_wand_route_records_seed_and_theta(self, engines):
        _, idx = engines
        idx.search("spark OR merge OR token", 10).collect()
        st = idx.last_query_stats
        assert st["route"] == "wand" and st["mode"] == "OR"
        assert st["rarest"] in {"spark", "merge", "token"}
        assert st["seed_size"] > 0
        # OR path past the seed: either early-exited on θ or ran pass 2
        assert st["early_exit"] or st["theta"] is not None

    def test_and_route_label(self, engines):
        _, idx = engines
        idx.search("spark AND merge", 10).collect()
        st = idx.last_query_stats
        assert st["route"] == "wand" and st["path"] == "and_semijoin"

    def test_planner_route_for_phrase(self, engines):
        _, idx = engines
        idx.search('"spark table" merge', 10).collect()
        assert idx.last_query_stats["route"] == "planner"

    def test_survivor_overflow_fallback_labeled(self, engines):
        _, idx = engines
        idx.search_wand("merge OR data OR value", 10, survivor_cap=0).collect()
        st = idx.last_query_stats
        assert st["route"] == "wand"
        # either pass 2 never ran (early exit) or the forced cap tripped
        assert st["early_exit"] or st["path"] == "survivor_overflow_fallback"
