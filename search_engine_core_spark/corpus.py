"""The source-code corpus: synthesis + canonical derived columns.

Input shape (BASELINE.json input_hint): an Iceberg/parquet table
``(repo string, path string, commit string, lang string, content string)``.
This module synthesizes it deterministically (seeded, partition-independent)
and derives the engine's canonical columns:

* ``doc_id``         = xxhash64(repo, path, commit)  — the reference keys
                       Redis hashes by std::hash(url)
                       (``src/storage/RedisSearchStorage.cpp:23-26``); we key
                       by a 64-bit hash of the natural key.
* ``content_sha256`` = sha2(content, 256)            — the per-row invariant
                       the driver verifies (BASELINE.json input_hint).
* ``doclen``         = token count under the canonical tokenizer.

Also provides an adapter from the driver's ``documents`` test table
(``doc_id, text, lang, source, n_chars``) into the same canonical shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_core_spark.functions.tokenizer import tokenize_expr

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"

# Code-flavored vocabulary, hot -> rare. The head tokens ("return",
# "import", "self", ...) appear in nearly every document so df is near N —
# that's what exercises skew salting and negative-IDF handling.
_HOT = ["return", "import", "def", "self", "if", "for", "in", "the", "is", "not"]
_MED = [
    "class", "value", "result", "data", "config", "index", "query", "parse",
    "token", "score", "merge", "batch", "spark", "table", "column", "filter",
    "join", "sort", "hash", "partition", "string", "count", "build", "node",
    "error", "state", "write", "read", "stream", "cache",
]
_LANGS = ["python", "cpp", "js", "go", "rust", "java"]


_HOT_ARR = np.array(_HOT)
_MED_ARR = np.array(_MED)


def _gen_rows(ids: np.ndarray, tokens_per_doc: int) -> pd.DataFrame:
    """Generate corpus rows for the given global row ids (deterministic per
    id — independent of partitioning, so any parallelism level yields the
    same table). Numpy-vectorized within each doc."""
    out = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for i in ids:
        i = int(i)
        rng = np.random.default_rng(42 + i)
        n_tok = int(rng.integers(tokens_per_doc // 2, tokens_per_doc * 2))
        # Zipf-ish mixture: 30% hot (df≈N — exercises negative IDF and skew
        # salting), 50% from a per-doc topic subset of the medium vocab
        # (df≈N/4 — selective, positive IDF), 20% rare long-tail idents.
        topic = _MED_ARR[rng.choice(len(_MED_ARR), size=8, replace=False)]
        kinds = rng.choice(3, size=n_tok, p=[0.30, 0.50, 0.20])
        hot = _HOT_ARR[rng.integers(0, len(_HOT_ARR), size=n_tok)]
        med = topic[rng.integers(0, len(topic), size=n_tok)]
        ra = rng.integers(0, 5000, size=n_tok)
        rb = rng.integers(0, 100, size=n_tok)
        rare = np.char.add(
            np.char.add(
                np.char.add("ident_", ra.astype("U8")), np.repeat("_", n_tok)
            ),
            rb.astype("U4"),
        )
        words = np.select([kinds == 0, kinds == 1], [hot, med], default=rare)
        # Light code-ish punctuation so the tokenizer has separators to chew.
        parts = []
        for j in range(0, n_tok, 8):
            parts.append(" ".join(words[j : j + 8]) + ("():\n" if j % 16 == 0 else ";\n"))
        out["repo"].append(f"org{i % 97}/project-{i % 13}")
        out["path"].append(f"src/m{i % 7}/file_{i}.py")
        out["commit"].append(f"{i % (1 << 32):040x}")
        out["lang"].append(_LANGS[i % len(_LANGS)])
        out["content"].append("".join(parts))
    return pd.DataFrame(out)


def synthesize_corpus(
    spark: SparkSession,
    n_docs: int = 200,
    tokens_per_doc: int = 120,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus in the input_hint shape.

    ``spark.range`` + ``mapInPandas`` so generation parallelizes with the
    cluster; per-row RNG seeding keeps output independent of partitioning.
    """
    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield _gen_rows(pdf["id"].to_numpy(), tokens_per_doc)

    return spark.range(0, n_docs, numPartitions=partitions).mapInPandas(gen, CORPUS_SCHEMA)


def widen_small_input(df: DataFrame) -> DataFrame:
    """Scale-adaptive parallelism floor for CPU-heavy derivations (guide
    §2.5 input skew): a compact parquet source can arrive as a handful
    of row-group splits (the sf1.0 documents table is ONE row group →
    tokenize/hash map stages run on ~6 of 32 cores). Repartition ONLY
    when the input has fewer partitions than the cluster's parallelism —
    a 100 TB scan already has thousands of splits and must never pay a
    content shuffle here. 2x over-partitioning amortizes stragglers;
    AQE never coalesces an explicit repartition."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n_in = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - exotic plans; widening is optional
        return df
    return df.repartition(2 * target) if n_in < target else df


def with_doc_columns(corpus: DataFrame) -> DataFrame:
    """Attach doc_id / content_sha256 / doclen to an input_hint corpus."""
    return (
        corpus.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .withColumn("content_sha256", F.sha2("content", 256))
        .withColumn("doclen", F.size(tokenize_expr("content")))
    )


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's documents table (doc_id, text, lang, source,
    n_chars) to the canonical shape. ``doc_id`` is kept verbatim so oracle
    SQL can reference it directly; doclen = canonical token count."""
    docs = widen_small_input(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("text").alias("content"),
            "lang",
            F.col("source").alias("repo"),
        )
        .withColumn("content_sha256", F.sha2("content", 256))
        .withColumn("doclen", F.size(tokenize_expr("content")))
    )
