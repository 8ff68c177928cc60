"""Tokenizer parity: the three implementations agree and match the
reference semantics (SearchScorer.cpp:692-712 goldens from
tests/scoring/test_search_scorer.cpp:276-292)."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_core_spark.functions.tokenizer import (
    tokenize_expr,
    tokenize_pandas_udf,
    tokenize_py,
)

GOLDENS = [
    ("Machine Learning, and AI!", ["machine", "learning", "and", "ai"]),
    ("a I x", []),  # single chars dropped
    ("e-mail", ["mail"]),
    ("foo_bar baz123", ["foo", "bar", "baz123"]),
    ("", []),
    ("  \t\n ", []),
    ("UPPER lower MiXeD", ["upper", "lower", "mixed"]),
    ("x1 y2z", ["x1", "y2z"]),
    ("سلام world", ["world"]),  # non-ASCII acts as separator
]


def test_python_goldens():
    for text, want in GOLDENS:
        assert tokenize_py(text) == want, text


def test_spark_expr_matches_python(spark):
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(GOLDENS)], "id int, text string")
    rows = df.select("id", tokenize_expr("text").alias("toks")).orderBy("id").collect()
    for (text, want), row in zip(GOLDENS, rows):
        assert row["toks"] == want, text


def test_pandas_udf_matches_python(spark):
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(GOLDENS)], "id int, text string")
    rows = df.select("id", tokenize_pandas_udf("text").alias("toks")).orderBy("id").collect()
    for (text, want), row in zip(GOLDENS, rows):
        assert row["toks"] == want, text


def test_three_ways_agree_on_corpus(spark, small_corpus):
    sample = small_corpus.select("doc_id", "content").limit(30)
    a = sample.select("doc_id", tokenize_expr("content").alias("t")).collect()
    b = sample.select("doc_id", tokenize_pandas_udf("content").alias("t")).collect()
    got_a = {r["doc_id"]: r["t"] for r in a}
    got_b = {r["doc_id"]: r["t"] for r in b}
    py = {
        r["doc_id"]: tokenize_py(r["content"])
        for r in sample.collect()
    }
    assert got_a == py
    assert got_b == py
