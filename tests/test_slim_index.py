"""Slim-index mode (store_content=False): the 100 TB shape where the
source table keeps content and the index stores only metadata + postings.
Ranks must be identical to a full build; content-dependent paths come back
via attach_content."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_core_spark.engine import IndexSearchEngine
from search_engine_core_spark.sources.index_io import IndexBuilder


@pytest.fixture(scope="module")
def slim_and_full(spark, small_corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("slimidx"))
    IndexBuilder(spark, base + "/full", n_buckets=4, n_shards=2).build(small_corpus)
    IndexBuilder(
        spark, base + "/slim", n_buckets=4, n_shards=2, store_content=False
    ).build(small_corpus)
    return base


def test_slim_docs_have_no_content(spark, slim_and_full):
    slim_docs = spark.read.parquet(slim_and_full + "/slim/docs")
    assert "content" not in slim_docs.columns
    assert {"doc_id", "doclen", "content_sha256"} <= set(slim_docs.columns)


def test_slim_ranks_identical_to_full(spark, slim_and_full):
    full = IndexSearchEngine(spark, slim_and_full + "/full", n_buckets=4)
    slim = IndexSearchEngine(spark, slim_and_full + "/slim", n_buckets=4)
    for q in ["spark OR merge", "filter AND sort", "config query"]:
        a = [(r["doc_id"], round(r["score"], 9)) for r in full.search(q, 10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in slim.search(q, 10).collect()]
        assert a == b, q


def test_raw_occurrence_build_identical_to_map_side_tf(
    spark, small_corpus, slim_and_full, tmp_path_factory
):
    """map_side_tf=False (JVM tokenize + raw-occurrence shuffle, encoder
    run-length tf) must produce the same index content as the Arrow
    map-side-tf build."""
    d = str(tmp_path_factory.mktemp("rawidx"))
    IndexBuilder(
        spark, d + "/i", n_buckets=4, n_shards=2, map_side_tf=False
    ).build(small_corpus)
    raw_eng = IndexSearchEngine(spark, d + "/i", n_buckets=4)
    full_eng = IndexSearchEngine(spark, slim_and_full + "/full", n_buckets=4)
    for q in ["spark OR merge", "filter AND sort", '"def" token']:
        a = [(r["doc_id"], round(r["score"], 9)) for r in full_eng.search(q, 10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in raw_eng.search(q, 10).collect()]
        assert a == b, q
    # decoded triples identical, not just ranks
    from search_engine_core_spark.operators.postings import decode_postings_df

    t_raw = {
        (r["doc_id"], r["term"], r["tf"])
        for r in decode_postings_df(raw_eng.reader.postings_for_terms(["spark", "merge"])).collect()
    }
    t_full = {
        (r["doc_id"], r["term"], r["tf"])
        for r in decode_postings_df(full_eng.reader.postings_for_terms(["spark", "merge"])).collect()
    }
    assert t_raw == t_full


def test_attach_content_restores_phrase_and_content(spark, slim_and_full, small_corpus):
    slim = IndexSearchEngine(spark, slim_and_full + "/slim", n_buckets=4)
    slim.reader.attach_content(small_corpus)
    assert "content" in slim.reader.docs.columns
    # sha invariant: attached content hashes to the stored content_sha256
    bad = slim.reader.docs.filter(
        F.sha2("content", 256) != F.col("content_sha256")
    ).count()
    assert bad == 0
