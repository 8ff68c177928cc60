"""search_engine_core_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch Spark-first re-expression of the query/data-processing
capabilities of the reference engine ``mudassaralichouhan/search-engine-core``
(a C++20 web search engine delegating indexing to RediSearch and persistence
to MongoDB). Where the reference outsources the inverted index to Redis
(``src/storage/RedisSearchStorage.cpp:93-108``), this engine materializes it
explicitly: a partition-parallel tokenization stage emits ``(term, doc_id,
tf)`` triples, shuffled by term hash with explicit skew salting for hot
terms, merged into sorted posting lists with delta-gap + variable-byte
compression, and written as a partitioned table with per-partition
lineage/checkpoint rows for resumable builds. Query-time top-k uses
block-max pruning (WAND-style) over the compressed postings with
document-length-normalized BM25 (k1=1.2, b=0.75).

Design rules (enforced throughout):
  * DataFrame/SQL first — Catalyst does pushdown/pruning/join selection.
  * No per-row Python in any hot path: built-in ``pyspark.sql.functions``
    expressions where possible, Arrow-vectorized ``pandas_udf`` /
    ``applyInPandas`` / ``mapInPandas`` otherwise.
  * Every shuffle is deliberate: broadcast small sides, pre-partition by
    the key reused downstream, salt skewed keys.
"""

from search_engine_core_spark.engine import SearchEngine
from search_engine_core_spark.session import get_spark

__all__ = ["SearchEngine", "get_spark"]
__version__ = "0.1.0"
