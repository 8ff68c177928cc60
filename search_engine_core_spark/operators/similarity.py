"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline (F12 is the
reference's cosine, ``src/scoring/SearchScorer.cpp:668-690``, over sparse
term maps; here dense vectors). The scale path is sign-bit LSH bucketing:
project on fixed axes (the first ``n_bits`` dimensions), bucket by the
sign pattern, and search only the query's bucket — a 2^n_bits candidate
reduction with zero training, fully expressible in Catalyst (portable to
the SQL oracle, unlike random-hyperplane LSH whose coefficients can't be
shared across engines).

All arithmetic in float64 after an explicit cast — float32 folds differ
between engines. Fold order is left-to-right in both Spark ``aggregate``
and DuckDB ``list_dot_product``, keeping results bit-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector. One scan, one
    TakeOrderedAndProject — embarrassingly parallel; ties broken by id."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    # rank by the DOUBLE-ROUNDED cosine (round 7 then 4) + id tiebreak: the
    # inner round collapses cross-engine ULP noise, the outer one is the
    # emitted precision, and making the ORDER a function of the emitted
    # value keeps the k-boundary identical on both engines.
    out = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.round(F.round(cosine(F.col(vec_col), q), 7), 4).alias("cos_sim"),
    )
    if exclude_id is not None:
        out = out.filter(F.col("vec_id") != exclude_id)
    return out.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def signbit_bucket(vec: Column, n_bits: int = 8) -> Column:
    """LSH bucket id: bit j set iff vec[j] > 0 (1-indexed element_at)."""
    out = None
    for j in range(n_bits):
        bit = F.when(F.element_at(vec, j + 1) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("int")


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's sign-bit bucket.
    At 100 TB the embeddings table is written partitioned by bucket so this
    is a single-partition scan; recall can be raised by multi-probing
    neighboring buckets (flip one bit) — not needed for the oracle check."""
    qbucket = 0
    for j in range(n_bits):
        if float(query_vec[j]) > 0:
            qbucket |= 1 << j
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.withColumn("bucket", signbit_bucket(F.col(vec_col), n_bits))
        .filter(F.col("bucket") == qbucket)
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(F.round(cosine(F.col(vec_col), q), 7), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )
