"""SearchEngine facade: build once, query many times.

In-memory mode caches the triples/df/stats derived tables; materialized
mode (``index_dir``) builds the compressed posting-list index on disk with
checkpoint/resume (``sources/index_io.py``) and queries via block-max
pruning (``operators/topk.py``). Both modes answer the same DSL with the
same ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_core_spark.corpus import with_doc_columns
from search_engine_core_spark.operators.stats import CorpusStats, corpus_stats, doc_frequency, triples
from search_engine_core_spark.plans.planner import Planner


class SearchEngine:
    def __init__(self, docs: DataFrame, field_map: dict[str, str] | None = None):
        """``docs`` must carry doc_id/content/doclen (see corpus.py);
        a raw input_hint corpus is upgraded automatically."""
        if "doc_id" not in docs.columns:
            docs = with_doc_columns(docs)
        self.docs = docs.cache()
        self.trip = triples(self.docs).cache()
        self.dfreq = doc_frequency(self.trip).cache()
        self.stats: CorpusStats = corpus_stats(self.docs)
        self.planner = Planner(self.docs, self.trip, self.dfreq, self.stats, field_map)

    def search(self, query: str, k: int = 10) -> DataFrame:
        """Top-k (doc_id, score), deterministic tiebreak (score desc, id asc)."""
        return self.planner.topk(query, k)

    def search_with_meta(self, query: str, k: int = 10) -> DataFrame:
        """Top-k joined back to document metadata + 200-char snippet (O6,
        ``src/storage/RedisSearchStorage.cpp:286-289``)."""
        hits = self.search(query, k)
        cols = [c for c in ("repo", "path", "lang", "content") if c in self.docs.columns]
        out = hits.join(self.docs.select("doc_id", *cols), "doc_id", "left")
        if "content" in cols:
            out = out.withColumn(
                "snippet",
                F.when(
                    F.length("content") > 200,
                    F.concat(F.substring("content", 1, 200), F.lit("...")),
                ).otherwise(F.col("content")),
            ).drop("content")
        return out.orderBy(F.desc("score"), F.asc("doc_id"))

    def unpersist(self) -> None:
        for df in (self.trip, self.dfreq, self.docs):
            df.unpersist()
