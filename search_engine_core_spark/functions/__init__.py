"""Scalar / vectorized functions: tokenizer, scoring math, text utilities."""

from search_engine_core_spark.functions.c4 import (
    c4_clean_lines,
    c4_doc_pass,
    c4_filter,
    sentence_split,
)
from search_engine_core_spark.functions.code_quality import (
    attach_repo_license,
    code_filter,
    code_quality_pass,
    code_quality_signals,
    detect_license,
    license_filter,
    redact_secrets,
    secret_counts,
)
from search_engine_core_spark.functions.gopher import (
    gopher_filter,
    gopher_quality_pass,
    gopher_quality_signals,
    gopher_repetition_pass,
    gopher_repetition_signals,
    split_gopher_thresholds,
)
from search_engine_core_spark.functions.pii import (
    pii_counts,
    redact_pii,
    redact_pii_df,
)
from search_engine_core_spark.functions.tokenizer import (
    TOKEN_SPLIT_RE,
    tokenize_expr,
    tokenize_pandas_udf,
    tokenize_py,
)

__all__ = [
    "TOKEN_SPLIT_RE",
    "attach_repo_license",
    "c4_clean_lines",
    "c4_doc_pass",
    "c4_filter",
    "code_filter",
    "code_quality_pass",
    "code_quality_signals",
    "detect_license",
    "gopher_filter",
    "gopher_quality_pass",
    "gopher_quality_signals",
    "gopher_repetition_pass",
    "gopher_repetition_signals",
    "license_filter",
    "pii_counts",
    "redact_pii",
    "redact_pii_df",
    "redact_secrets",
    "secret_counts",
    "sentence_split",
    "split_gopher_thresholds",
    "tokenize_expr",
    "tokenize_pandas_udf",
    "tokenize_py",
]
