"""Scalar / vectorized functions: tokenizer, scoring math, text utilities."""

from search_engine_core_spark.functions.tokenizer import (
    TOKEN_SPLIT_RE,
    tokenize_expr,
    tokenize_pandas_udf,
    tokenize_py,
)

__all__ = [
    "TOKEN_SPLIT_RE",
    "tokenize_expr",
    "tokenize_pandas_udf",
    "tokenize_py",
]
