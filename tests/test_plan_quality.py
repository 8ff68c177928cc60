"""Physical-plan assertions: the optimizations we rely on at 100 TB must
actually appear in the executed plan (SURVEY §4) — filter/partition
pushdown on the postings scan, broadcast of the df-stats side, column
pruning of heavy binary/content columns, whole-stage codegen on scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_core_spark.engine import IndexSearchEngine
from search_engine_core_spark.sources.index_io import IndexBuilder


@pytest.fixture(scope="module")
def idx(spark, small_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planidx") / "i")
    IndexBuilder(spark, d, n_buckets=4, hot_df_threshold=50, n_shards=4).build(small_corpus)
    return IndexSearchEngine(spark, d, n_buckets=4)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_postings_scan_prunes_partitions_and_pushes_term(idx):
    plan = _physical(idx.reader.postings_for_terms(["spark"]))
    assert "PartitionFilters" in plan
    # the bucket filter must reach PartitionFilters (not a post-scan Filter)
    assert "bucket" in plan.split("PartitionFilters")[1][:200]
    assert "EqualTo(term,spark)" in plan or "term" in plan.split("PushedFilters")[1][:200]


def test_docs_scan_prunes_columns(idx):
    # doclen join must not drag content/binary columns through the scan
    doclen = idx.reader.docs.select("doc_id", "doclen")
    plan = _physical(doclen)
    read_schema = plan.split("ReadSchema:")[1][:300]
    assert "content" not in read_schema
    assert "doclen" in read_schema


def test_df_stats_join_is_broadcast(idx):
    df = idx.search("spark merge", 5)
    plan = _physical(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_scoring_runs_in_wholestage_codegen(spark, small_corpus):
    from search_engine_core_spark.functions.scoring import bm25_term_score

    scored = small_corpus.select(
        bm25_term_score(F.lit(2.0), F.lit(10.0), F.col("doclen"), 100, 50.0).alias("s")
    )
    plan = _physical(scored)
    # executedPlan renders codegen stages with the "*(n)" prefix
    assert "*(" in plan or "WholeStageCodegen" in plan


def test_tokenize_filter_pushdown_to_parquet(spark, tmp_path):
    p = str(tmp_path / "docs")
    small = spark.range(100).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("text "), F.col("id")).alias("content")
    )
    small.write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("doc_id") < 10).select("doc_id")
    plan = _physical(df)
    assert "PushedFilters" in plan
    assert "LessThan(doc_id,10)" in plan
