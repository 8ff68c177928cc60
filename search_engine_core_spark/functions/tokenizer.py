"""The canonical tokenizer (rank-identity-critical).

Reference semantics (``/root/reference/src/scoring/SearchScorer.cpp:692-712``,
``scoring_utils::extractTerms``): scan characters; maximal ASCII-alphanumeric
runs become tokens, lowercased; tokens shorter than 2 chars are dropped.
Non-ASCII bytes act as separators (C++ ``std::isalnum`` under the "C"
locale is false for them).

Three interchangeable implementations, all producing identical output:

* ``tokenize_expr``        — pure Catalyst column expression (JVM-side,
                             whole-stage codegen; the default hot path).
* ``tokenize_pandas_udf``  — Arrow-vectorized pandas UDF (the "code-aware
                             tokenizer via vectorized Arrow UDFs" extension
                             point; same output today, swap in language-aware
                             splitting per ``lang`` here without touching the
                             plan).
* ``tokenize_py``          — pure-Python oracle used by tests only.

The equivalent ANSI-SQL (DuckDB oracle) fragment is ``TOKENIZE_SQL``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Maximal alnum runs <=> split on non-alnum. Lowercasing first means the
# post-split alphabet is [a-z0-9]; anything else (punctuation, whitespace,
# non-ASCII) separates tokens, exactly like the reference's isalnum() scan.
TOKEN_SPLIT_RE = "[^a-z0-9]+"
MIN_TOKEN_LEN = 2

# DuckDB fragment: tokenize a text column into a list<varchar>.
TOKENIZE_SQL = (
    "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'),"
    " t -> length(t) >= 2)"
)

_PY_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize_expr(col: Column | str) -> Column:
    """Tokenize a string column into array<string> — JVM-side, codegen'd."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(c), TOKEN_SPLIT_RE)
    return F.filter(toks, lambda t: F.length(t) >= MIN_TOKEN_LEN)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_pandas_udf(s: pd.Series) -> pd.Series:
    """Arrow-vectorized tokenizer (pandas str ops, no per-row Python loop).

    Extension point for code-aware tokenization (camelCase / snake_case
    splitting per language) — keep output identical to ``tokenize_expr``
    for the default mode so the two paths stay rank-identical.
    """
    return s.fillna("").str.lower().str.findall(r"[a-z0-9]{2,}")


def tokenize_py(text: str) -> list[str]:
    """Pure-Python oracle tokenizer (tests only — never in a Spark plan)."""
    return [t for t in _PY_TOKEN_RE.findall((text or "").lower()) if len(t) >= MIN_TOKEN_LEN]


def doc_tf_arrow(batches):
    """mapInArrow: (doc_id, content) -> (doc_id, term, tf) — per-document
    term frequencies computed ENTIRELY in Arrow C++ (utf8_lower,
    split_pattern_regex, flatten + parent indices, hash group_by). This is
    the map-side combine for the index build done at document granularity:
    exact (every doc sits in one batch row), no JVM hash aggregation, and
    the downstream shuffle carries ~distinct(doc,term) rows instead of one
    row per token occurrence (3-4x fewer for code corpora).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    try:
        # one Spark task slot = one core: keep Arrow's internal pool from
        # silently borrowing the other executors' cores (it defaults to
        # every core on the machine, which corrupts strong-scaling runs)
        pa.set_cpu_count(1)
    except Exception:
        pass
    for batch in batches:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("content")), TOKEN_SPLIT_RE
        )
        parents = toks.value_parent_indices()
        vals = toks.flatten()
        keep = pc.greater_equal(pc.utf8_length(vals), MIN_TOKEN_LEN)
        vals = vals.filter(keep)
        parents = parents.filter(keep)
        doc_ids = pc.take(batch.column("doc_id"), parents)
        t = pa.table({"doc_id": doc_ids, "term": vals})
        agg = t.group_by(["doc_id", "term"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        yield pa.RecordBatch.from_arrays(
            [
                agg.column("doc_id").combine_chunks(),
                agg.column("term").combine_chunks(),
                pc.cast(agg.column("count_all"), pa.int64()).combine_chunks(),
            ],
            names=["doc_id", "term", "tf"],
        )
