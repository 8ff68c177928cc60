"""Round-3 surface: 64-bit SimHash Hamming near-dup, Kafka source
contract, the 'fielded' algorithm switch, parameterized session gap."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from search_engine_core_spark.operators import dedup

# ---- 64-bit SimHash ------------------------------------------------------

TEXTS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 0
    (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (3, "completely different content about spark dataframes and shuffles"),
    (4, "spark dataframes shuffle partitions broadcast joins catalyst"),
    (5, "zzz unrelated words entirely qqq www eee rrr ttt yyy uuu"),
]


@pytest.fixture(scope="module")
def sim_docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def _popcount(x: int) -> int:
    return bin(x & ((1 << 64) - 1)).count("1")


def test_simhash64_uses_all_bits(spark, sim_docs):
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(sim_docs, bits=64).collect()}
    # across several docs the high 32 bits must vary (16-bit simhash never
    # touched them; the two-hash-half widening must)
    highs = {s >> 32 & 0xFFFFFFFF for s in sigs.values()}
    assert len(highs) > 1
    # exact duplicate text -> identical fingerprint
    assert sigs[0] == sigs[2]


def test_simhash_near_dup_matches_bruteforce(spark, sim_docs):
    """The banded pigeonhole join must find EXACTLY the pairs a
    brute-force popcount finds (recall 1 by construction for d <= bands-1,
    no false positives after the verify step)."""
    d = 12
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(sim_docs, bits=64).collect()}
    ids = sorted(sigs)
    want = {
        (a, b, _popcount(sigs[a] ^ sigs[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _popcount(sigs[a] ^ sigs[b]) <= d
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_near_dup_pairs(sim_docs, bits=64, max_hamming=d).collect()
    }
    assert got == want
    # the exact-dup pair is hamming 0, the near-dup pair is small
    assert (0, 2, 0) in got


def test_simhash16_backcompat(spark, sim_docs):
    sigs = [r["simhash"] for r in dedup.simhash(sim_docs, bits=16).collect()]
    assert all(0 <= s < (1 << 16) for s in sigs)


# ---- Kafka source contract (S11/S12) ------------------------------------


def test_kafka_source_options_contract():
    from search_engine_core_spark.streaming.incremental import kafka_source_options

    opts = kafka_source_options("crawl-docs", "broker1:9092,broker2:9092")
    assert opts["subscribe"] == "crawl-docs"
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    # at-least-once contract: earliest on first start, offsets owned by
    # the Spark checkpoint (so no Kafka-side auto-commit key may appear),
    # retention expiry tolerated, catch-up batches bounded
    assert opts["startingOffsets"] == "earliest"
    assert opts["failOnDataLoss"] == "false"
    assert int(opts["maxOffsetsPerTrigger"]) > 0
    assert not any("commit" in k.lower() for k in opts)


def test_parse_kafka_corpus_value_json(spark):
    """The value-parsing stage is source-independent: feed it static rows
    shaped like Kafka records (binary value) and expect corpus rows;
    malformed JSON is dropped, not poisonous. The full kafka path needs
    broker jars absent from this sandbox — the reader construction itself
    is exercised via options above (documented skip)."""
    from search_engine_core_spark.streaming.incremental import parse_kafka_corpus

    good = json.dumps(
        {
            "repo": "org/r",
            "path": "src/a.py",
            "commit": "c1",
            "lang": "python",
            "content": "def f(): return 1",
        }
    )
    raw = spark.createDataFrame(
        [(b"k1", good.encode()), (b"k2", b"{not json"), (b"k3", None)],
        "key binary, value binary",
    )
    rows = parse_kafka_corpus(raw).collect()
    assert len(rows) == 1
    assert rows[0]["repo"] == "org/r" and rows[0]["content"].startswith("def f")


# ---- 'fielded' algorithm switch (X1/X4) ---------------------------------


def test_search_fielded_inmemory(spark, small_corpus):
    from search_engine_core_spark.engine import SearchEngine

    eng = SearchEngine(small_corpus)
    hits = eng.search("spark merge", 5, algorithm="fielded").collect()
    assert 0 < len(hits) <= 5
    assert [c for c in hits[0].asDict()] == ["doc_id", "score"]
    scores = [r["score"] for r in hits]
    assert scores == sorted(scores, reverse=True)
    eng.unpersist()


def test_search_fielded_matches_direct_call(spark, small_corpus):
    from search_engine_core_spark.engine import SearchEngine
    from search_engine_core_spark.functions.reference_scorer import fielded_topk

    eng = SearchEngine(small_corpus)
    a = [(r["doc_id"], round(r["score"], 9)) for r in eng.search("config query", 5, algorithm="fielded").collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in fielded_topk(small_corpus, "config query", 5, trip=eng.trip).collect()]
    assert a == b
    # hit-set restriction (reference shape): every scored doc holds at
    # least one query token; the unrestricted scan may only ADD
    # zero-match docs, never change the hits' scores
    c = [(r["doc_id"], round(r["score"], 9)) for r in fielded_topk(small_corpus, "config query", 50).collect()]
    assert set(a) <= set(c)
    eng.unpersist()


def test_search_fielded_on_materialized_index(spark, small_corpus, tmp_path):
    from search_engine_core_spark.engine import IndexSearchEngine, SearchEngine
    from search_engine_core_spark.sources.index_io import IndexBuilder

    idx = str(tmp_path / "fidx")
    IndexBuilder(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4).build(
        small_corpus.select("repo", "path", "commit", "lang", "content")
    )
    mem = SearchEngine(small_corpus)
    ie = IndexSearchEngine(spark, idx, n_buckets=4)
    a = [(r["doc_id"], round(r["score"], 9)) for r in mem.search("spark merge", 5, algorithm="fielded").collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in ie.search("spark merge", 5, algorithm="fielded").collect()]
    assert a == b
    mem.unpersist()


# ---- parameterized session gap ------------------------------------------


def test_sessionize_stream_respects_gap_param(spark, tmp_path):
    """r2 ADVICE: the stream fn hard-coded 30 min while the batch twin
    took gap_minutes. With gap=5 a 10-minute silence must split sessions
    in BOTH formulations."""
    import shutil as _sh

    from search_engine_core_spark.streaming.windows import sessionize, sessionize_batch

    base = 1_700_000_000
    rows = [
        (1, 100, base),
        (1, 101, base + 60),          # same session (1 min later)
        (1, 102, base + 60 + 600),    # 10-min silence -> NEW session at gap=5
        (2, 200, base),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_epoch long"
    ).select("user_id", "event_id", F.col("ts_epoch").cast("timestamp_ltz").alias("ts"))
    batch = sessionize_batch(events, gap_minutes=5, tiebreak_col="event_id")
    assert batch.filter(F.col("user_id") == 1).count() == 2

    d = tmp_path / "ev"
    events.write.parquet(str(d))
    stream = spark.readStream.schema(events.schema).parquet(str(d))
    q = (
        sessionize(stream, watermark="1 hour", gap_minutes=5)
        .writeStream.format("memory")
        .queryName("gap5_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM gap5_sessions WHERE user_id = 1").collect()
    # append mode: the CLOSED first session must emit (split proves the
    # 5-min gap reached the stateful fn); the open one may be withheld
    assert len(got) >= 1
    assert any(r["n_events"] == 2 for r in got)
    _sh.rmtree(str(d), ignore_errors=True)


# ---- LSM read path: query main + deltas without compaction ---------------


def test_lsm_read_path_and_compaction_equivalence(spark, tmp_path, small_corpus):
    """Build a main index from half the corpus, stream the other half as
    delta segments, and require THREE engines to agree rank-for-rank on
    the full corpus: the in-memory reference, the DeltaSearchEngine
    (main ⊎ delta, no compaction), and the post-compaction materialized
    engine (docs/stats/dfreq refreshed with the postings)."""
    import math

    from search_engine_core_spark.engine import IndexSearchEngine, SearchEngine
    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.streaming.incremental import (
        DeltaSearchEngine,
        compact_deltas,
        start_incremental_index,
    )

    base = small_corpus.select("repo", "path", "commit", "lang", "content")
    h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(2))
    idx = str(tmp_path / "idx")
    IndexBuilder(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4).build(
        base.filter(h == 0)
    )
    inbox = tmp_path / "inbox"
    base.filter(h == 1).write.parquet(f"{inbox}/b1")
    q = start_incremental_index(spark, f"{inbox}/b*", idx, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    ref = SearchEngine(small_corpus)
    queries = ["spark merge", "spark OR merge OR token", "return",
               '"spark table"', "lang:python spark"]
    want = {
        qq: [(r["doc_id"], r["score"]) for r in ref.search(qq, 10).collect()]
        for qq in queries
    }

    def check(eng, label):
        for qq in queries:
            got = [(r["doc_id"], r["score"]) for r in eng.search(qq, 10).collect()]
            assert [d for d, _ in got] == [d for d, _ in want[qq]], (label, qq)
            for (_, gs), (_, ws) in zip(got, want[qq]):
                assert math.isclose(gs, ws, rel_tol=1e-9), (label, qq, gs, ws)

    check(DeltaSearchEngine(spark, idx, n_buckets=4), "lsm-live")
    compact_deltas(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4)
    check(IndexSearchEngine(spark, idx, n_buckets=4), "post-compaction")
    # deltas are gone after compaction; the LSM engine over the compacted
    # index (empty level-0) must still agree
    check(DeltaSearchEngine(spark, idx, n_buckets=4), "lsm-empty-delta")
    ref.unpersist()
