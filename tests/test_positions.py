"""Positional postings sidecar (opt-in, round 4): encode/decode roundtrip,
npos==tf invariant, token-adjacency semantics, and rank identity of
phrase queries vs the content substring path — including the slim-index
mode where phrases are answered with NO content column at all."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_core_spark.engine import IndexSearchEngine
from search_engine_core_spark.functions.tokenizer import tokenize_py
from search_engine_core_spark.operators.positions import (
    decode_positions_df,
    phrase_candidate_docs,
    position_rows,
)
from search_engine_core_spark.sources.index_io import IndexBuilder

PHRASE_QUERIES = [
    '"spark table"',
    '"spark table" merge',
    '"config query" OR token',
    '"def" token',
]


@pytest.fixture(scope="module")
def pos_indexes(spark, small_corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("positx"))
    IndexBuilder(spark, base + "/plain", n_buckets=4, n_shards=2).build(small_corpus)
    IndexBuilder(
        spark, base + "/pos", n_buckets=4, n_shards=2, store_positions=True
    ).build(small_corpus)
    IndexBuilder(
        spark,
        base + "/slimpos",
        n_buckets=4,
        n_shards=2,
        store_content=False,
        store_positions=True,
    ).build(small_corpus)
    return base


def test_roundtrip_matches_tokenizer(spark):
    rows = [
        (1, "alpha beta alpha gamma"),
        (2, "beta"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    got = {
        (r["doc_id"], r["term"]): r["positions"]
        for r in decode_positions_df(position_rows(df)).collect()
    }
    for doc_id, content in rows:
        toks = tokenize_py(content)
        want: dict[str, list[int]] = {}
        for i, t in enumerate(toks):
            want.setdefault(t, []).append(i)
        for t, ps in want.items():
            assert got[(doc_id, t)] == ps
    assert not any(k[0] == 3 for k in got)  # empty doc emits nothing


def test_arrow_twin_identical_to_pandas(spark, small_corpus):
    """The builder's Arrow C++ extractor must produce byte-identical rows
    to the pandas reference twin on the full corpus."""
    from search_engine_core_spark.operators.positions import (
        POSITIONS_SCHEMA,
        position_rows_arrow,
    )

    src = small_corpus.select("doc_id", "content")
    a = {
        (r["doc_id"], r["term"]): (r["npos"], bytes(r["pos_bytes"]))
        for r in src.mapInArrow(position_rows_arrow, POSITIONS_SCHEMA).collect()
    }
    b = {
        (r["doc_id"], r["term"]): (r["npos"], bytes(r["pos_bytes"]))
        for r in position_rows(src).collect()
    }
    assert a == b and a


def test_npos_equals_tf(spark, small_corpus):
    from search_engine_core_spark.operators.stats import triples

    pos = position_rows(small_corpus.select("doc_id", "content"))
    trip = triples(small_corpus)
    joined = pos.select("doc_id", "term", "npos").join(
        trip.select("doc_id", "term", "tf"), ["doc_id", "term"], "full"
    )
    bad = joined.filter(
        F.col("npos").isNull()
        | F.col("tf").isNull()
        | (F.col("npos") != F.col("tf"))
    ).count()
    assert bad == 0


def test_adjacency_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),  # adjacent -> match
            (2, "alpha gap beta"),  # gap -> no match (canonical tokenizer
            # drops 1-char tokens, so the separator must be a real token)
            (3, "beta alpha"),  # reversed -> no match
            (4, "alphax beta alpha beta"),  # match later in doc
            (5, "qq ww aa bb aa zz"),  # duplicate-token phrase target
        ],
        "doc_id long, content string",
    )
    pos = position_rows(df)
    assert {r["doc_id"] for r in phrase_candidate_docs(pos, ["alpha", "beta"]).collect()} == {1, 4}
    assert {r["doc_id"] for r in phrase_candidate_docs(pos, ["aa", "bb", "aa"]).collect()} == {5}
    assert phrase_candidate_docs(pos, ["alpha", "gamma"]).count() == 0


def test_phrase_rank_identity_vs_substring_path(spark, pos_indexes):
    """Content present on both sides: the positional adjacency prefilter +
    substring verify must rank identically to the has-all-tokens +
    substring path (on this corpus substring occurrences only exist at
    token boundaries, so the tightened prefilter loses nothing)."""
    plain = IndexSearchEngine(spark, pos_indexes + "/plain", n_buckets=4)
    pos = IndexSearchEngine(spark, pos_indexes + "/pos", n_buckets=4)
    assert pos.reader.has_positions() and not plain.reader.has_positions()
    for q in PHRASE_QUERIES:
        a = [(r["doc_id"], round(r["score"], 9)) for r in plain.search(q, 10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in pos.search(q, 10).collect()]
        assert a == b, q


def test_slim_index_answers_phrases_without_content(spark, pos_indexes):
    """The 100 TB payoff: a slim index (content stays in the source table)
    with the positions sidecar answers phrase queries index-only. On this
    corpus token-adjacency equals the substring semantics for space-
    separated phrase hits, so ranks match the full content path."""
    slim = IndexSearchEngine(spark, pos_indexes + "/slimpos", n_buckets=4)
    assert "content" not in slim.reader.docs.columns
    full = IndexSearchEngine(spark, pos_indexes + "/plain", n_buckets=4)
    for q in ['"spark table"', '"config query" OR token']:
        a = [(r["doc_id"], round(r["score"], 9)) for r in full.search(q, 10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in slim.search(q, 10).collect()]
        assert a == b, q


def test_positions_stage_is_resume_idempotent(spark, pos_indexes):
    """A re-build over a completed index must skip the positions stage
    (checkpoint lineage), like every other stage — one completed row, no
    duplicates after the no-op re-run."""
    d = pos_indexes + "/pos"
    ck = spark.read.parquet(d + "/_checkpoint")
    before = ck.filter(F.col("stage") == "positions").count()
    assert before == 1
    IndexBuilder(spark, d, n_buckets=4, n_shards=2, store_positions=True).build(
        spark.createDataFrame([], "doc_id long, content string, repo string, path string, commit string, lang string, content_sha256 string, doclen int")
    )
    after = (
        spark.read.parquet(d + "/_checkpoint")
        .filter(F.col("stage") == "positions")
        .count()
    )
    assert after == 1


def test_lsm_phrase_on_slim_index_with_positions(spark, small_corpus, tmp_path):
    """Full LSM story for positional phrases: a SLIM main index (content
    never copied) + positions sidecar answers phrases across
    [main ∖ superseded ⊎ delta] before compaction, and compaction
    refreshes the sidecar (stale positions out, delta positions in) so
    the post-compaction index answers identically."""
    from search_engine_core_spark.corpus import with_doc_columns
    from search_engine_core_spark.streaming.incremental import (
        DeltaSearchEngine,
        compact_deltas,
        start_incremental_index,
    )

    d = str(tmp_path / "idx")
    IndexBuilder(
        spark, d, n_buckets=4, n_shards=2, store_content=False, store_positions=True
    ).build(small_corpus)

    # delta: one NEW doc holding a unique phrase, plus a RE-CRAWL of an
    # existing doc whose new content drops its old tokens entirely
    victim = small_corpus.select("repo", "path", "commit", "lang").first()
    inbox = str(tmp_path / "inbox")
    spark.createDataFrame(
        [
            ("org/new", "src/p.py", "c9", "python", "zebra quantum flux appears here"),
            (victim["repo"], victim["path"], victim["commit"], victim["lang"],
             "totally replaced words only"),
        ],
        "repo string, path string, commit string, lang string, content string",
    ).write.parquet(inbox)
    q = start_incremental_index(spark, inbox, d, str(tmp_path / "ckpt"))
    q.awaitTermination()

    new_id = with_doc_columns(
        spark.createDataFrame(
            [("org/new", "src/p.py", "c9", "python", "x")],
            "repo string, path string, commit string, lang string, content string",
        )
    ).first()["doc_id"]

    deng = DeltaSearchEngine(spark, d, n_buckets=4)
    hits = deng.search('"zebra quantum flux"', 10).collect()
    assert [r["doc_id"] for r in hits] == [new_id]

    compact_deltas(spark, d, n_buckets=4, hot_df_threshold=50, n_shards=2)
    ceng = IndexSearchEngine(spark, d, n_buckets=4)
    hits2 = ceng.search('"zebra quantum flux"', 10).collect()
    assert [r["doc_id"] for r in hits2] == [new_id]
    # the re-crawled doc's OLD positions must be gone: its old phrase
    # tokens no longer produce it as a phrase hit
    assert ceng.search('"totally replaced words"', 10).count() == 1


def test_phrase_adjacency_randomized_vs_python_oracle(spark):
    """Seeded randomized sweep: 200 docs over a 5-token alphabet (dense
    repeats + duplicate tokens inside phrases), every phrase of length
    2-3 checked against a pure-Python adjacency oracle."""
    import itertools
    import random

    rng = random.Random(42)
    alpha = ["aa", "bb", "cc", "dd", "ee"]
    docs = {
        i: [rng.choice(alpha) for _ in range(rng.randint(2, 12))] for i in range(200)
    }
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()], "doc_id long, content string"
    )
    pos = position_rows(df).localCheckpoint(eager=True)

    def py_oracle(phrase):
        out = set()
        for i, toks in docs.items():
            for s in range(len(toks) - len(phrase) + 1):
                if toks[s : s + len(phrase)] == phrase:
                    out.add(i)
                    break
        return out

    phrases = [list(p) for p in itertools.product(alpha[:3], repeat=2)] + [
        ["aa", "aa", "bb"],
        ["cc", "dd", "ee"],
        ["bb", "bb", "bb"],
    ]
    for ph in phrases:
        got = {r["doc_id"] for r in phrase_candidate_docs(pos, ph).collect()}
        assert got == py_oracle(ph), ph


def test_delete_removes_positions(spark, small_corpus, tmp_path):
    """Row-level delete must scrub the positional sidecar: on a slim
    index a phrase-only query draws candidates from positions alone, so
    stale rows would resurrect deleted docs as score-0 hits."""
    d = str(tmp_path / "idx")
    b = IndexBuilder(
        spark, d, n_buckets=4, n_shards=2, store_content=False, store_positions=True
    )
    b.build(small_corpus)
    eng = IndexSearchEngine(spark, d, n_buckets=4)
    victim_repo = small_corpus.select("repo").first()["repo"]
    doomed_ids = {
        r["doc_id"]
        for r in small_corpus.filter(F.col("repo") == victim_repo)
        .select("doc_id")
        .collect()
    }
    n = b.delete(F.col("repo") == victim_repo)
    assert n == len(doomed_ids) > 0
    left = (
        spark.read.option("basePath", f"{d}/positions")
        .parquet(f"{d}/positions")
        .filter(F.col("doc_id").isin([int(x) for x in doomed_ids]))
        .count()
    )
    assert left == 0
    # fresh reader (caches are load-time): no deleted doc in any phrase hit
    eng2 = IndexSearchEngine(spark, d, n_buckets=4)
    hits = {r["doc_id"] for r in eng2.search('"spark table"', 50).collect()}
    assert not (hits & doomed_ids)


def test_positions_scan_is_bucket_pruned(spark, pos_indexes):
    pos = IndexSearchEngine(spark, pos_indexes + "/pos", n_buckets=4)
    plan = (
        pos.reader.positions_for_terms(["spark", "table"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters")[1][:200]


def test_batch_decode_identical_to_rowwise():
    """r5: the segmented-numpy batch decode (one vb_decode over the
    concatenated streams + reset-cumsum) is value-identical to the
    per-row reference twin, including empty rows and row-order."""
    import numpy as np

    from search_engine_core_spark.functions.varbyte import vb_encode
    from search_engine_core_spark.operators.positions import (
        _decode_positions_rowwise,
        decode_positions_batch,
    )

    rng = np.random.default_rng(17)
    rows = []
    for _ in range(200):
        n = int(rng.integers(0, 12))
        pos = np.sort(rng.choice(5000, size=n, replace=False)).astype(np.uint64)
        deltas = np.diff(pos, prepend=np.uint64(0))
        if n:
            deltas[0] = pos[0]
        rows.append((n, vb_encode(deltas), pos.astype(np.int64)))
    npos = np.array([r[0] for r in rows], dtype=np.int64)
    bufs = [r[1] for r in rows]
    got = decode_positions_batch(npos, bufs)
    ref = _decode_positions_rowwise(npos, bufs)
    assert len(got) == len(ref) == len(rows)
    for g, r, (_, _, expect) in zip(got, ref, rows):
        assert np.array_equal(g, r)
        assert np.array_equal(np.asarray(g, dtype=np.int64), expect)
