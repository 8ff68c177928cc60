"""Round-6 partial-postings pipeline: the build shuffle carries
compressed per-(term, shard) partials instead of triple rows
(operators/partial_postings.py). Pins (a) JVM parity of the vectorized
XXH64 shard assignment, (b) row-level identity of the partial pipeline
vs ``build_postings`` (same groups, same blocks, same bytes), and
(c) the builder fast path producing a logically identical index."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_core_spark.corpus import synthesize_corpus, with_doc_columns
from search_engine_core_spark.functions.tokenizer import doc_tf_arrow
from search_engine_core_spark.functions.xxhash import pmod_xxh64_long_np, xxh64_long_np
from search_engine_core_spark.operators.partial_postings import (
    build_postings_from_docs,
)
from search_engine_core_spark.operators.postings import (
    build_postings,
    decode_postings_df,
)
from search_engine_core_spark.sources.index_io import IndexBuilder, _bucket_expr


def test_xxh64_long_np_matches_jvm(spark):
    rng = np.random.default_rng(11)
    vals = np.concatenate(
        [
            rng.integers(-(2**63), 2**63 - 1, 500, dtype=np.int64),
            np.array([0, 1, -1, 2**63 - 1, -(2**63)], dtype=np.int64),
        ]
    )
    df = spark.createDataFrame([(int(v),) for v in vals], "v long")
    jvm_h = np.array([r["h"] for r in df.select(F.xxhash64("v").alias("h")).collect()])
    jvm_p = np.array(
        [r["p"] for r in df.select(F.pmod(F.xxhash64("v"), F.lit(7)).alias("p")).collect()]
    )
    assert np.array_equal(jvm_h, xxh64_long_np(vals).astype(np.int64))
    assert np.array_equal(jvm_p, pmod_xxh64_long_np(vals, 7).astype(np.int64))


def _row_key(r):
    return (
        r["term"],
        r["shard"],
        r["bucket"],
        bytes(r["doc_gaps"]),
        bytes(r["tfs"]),
        tuple(r["block_first"]),
        tuple(r["block_last"]),
        tuple(r["block_n"]),
        tuple(r["block_gap_off"]),
        tuple(r["block_tf_off"]),
        tuple(r["block_max_tf"]),
        r["df"],
        r["max_tf"],
    )


def test_partial_pipeline_row_identical_to_build_postings(spark):
    docs = (
        with_doc_columns(synthesize_corpus(spark, n_docs=300, tokens_per_doc=100))
        .select("doc_id", "content")
        .localCheckpoint(eager=True)
    )
    trip = docs.mapInArrow(
        doc_tf_arrow, "doc_id long, term string, tf long"
    ).withColumn("bucket", _bucket_expr(4))
    dfreq = trip.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    hot = [r["term"] for r in dfreq.filter(F.col("df") > 60).collect()]
    hot_df = spark.createDataFrame([(t,) for t in hot], "term string")
    old = build_postings(trip, hot_df, 60, 4, bucket_col=True, hot_is_term_set=True)
    new = build_postings_from_docs(docs, hot, 4, n_buckets=4)
    assert {_row_key(r) for r in old.collect()} == {_row_key(r) for r in new.collect()}


def test_partial_pipeline_value_budget_chunking(spark, monkeypatch):
    """A tiny MERGE_VALUE_BUDGET forces the reduce stage through the
    chunk-splitting path (including the indivisible-group fallback);
    output must stay identical."""
    import search_engine_core_spark.operators.partial_postings as pp

    docs = (
        with_doc_columns(synthesize_corpus(spark, n_docs=120, tokens_per_doc=80))
        .select("doc_id", "content")
        .localCheckpoint(eager=True)
    )
    ref = {
        (r["doc_id"], r["term"], r["tf"])
        for r in decode_postings_df(
            build_postings_from_docs(docs, ["return", "import"], 4, n_buckets=4)
        ).collect()
    }
    monkeypatch.setattr(pp, "MERGE_VALUE_BUDGET", 50)
    got = {
        (r["doc_id"], r["term"], r["tf"])
        for r in decode_postings_df(
            build_postings_from_docs(docs, ["return", "import"], 4, n_buckets=4)
        ).collect()
    }
    assert got == ref and len(ref) > 0


def test_builder_partial_vs_triple_fast_path(spark, tmp_path):
    """IndexBuilder(partial_encode=True) and (False) produce logically
    identical indexes: same decoded triples, same dfreq, same stats."""
    corpus = synthesize_corpus(spark, n_docs=250, tokens_per_doc=90)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    IndexBuilder(spark, a, n_buckets=4, hot_df_threshold=60, n_shards=4).build(corpus)
    IndexBuilder(
        spark, b, n_buckets=4, hot_df_threshold=60, n_shards=4, partial_encode=False
    ).build(corpus)

    def triples(d):
        post = spark.read.option("basePath", f"{d}/postings").parquet(f"{d}/postings")
        return {
            (r["doc_id"], r["term"], r["tf"])
            for r in decode_postings_df(post).collect()
        }

    def dfreq(d):
        return {
            (r["term"], r["df"])
            for r in spark.read.parquet(f"{d}/dfreq").collect()
        }

    assert triples(a) == triples(b)
    assert dfreq(a) == dfreq(b)
    sa = spark.read.parquet(f"{a}/stats").collect()[0]
    sb = spark.read.parquet(f"{b}/stats").collect()[0]
    assert (sa["n_docs"], sa["avgdl"]) == (sb["n_docs"], sb["avgdl"])
