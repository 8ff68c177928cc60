"""Materialized index: build, checkpoint/lineage, resume, read.

Mirrors the reference's resumable-crawl machinery (T6/S13: Mongo
``frontier_tasks`` rehydration, ``src/crawler/Crawler.cpp:62-78``,
``include/search_engine/storage/MongoDBStorage.h:97-117``) at the index
level: every build stage writes a lineage row to ``_checkpoint`` with
per-partition metrics; a restarted build skips completed stages and
re-runs only incomplete postings buckets idempotently (each bucket's
output dir is overwritten whole, so a crash mid-bucket can't corrupt).

On-disk layout (parquet standing in for Iceberg — same layout maps to an
Iceberg partitioned table 1:1; this sandbox has no Iceberg runtime jars):

  <index_dir>/docs/                 doc_id, repo, path, commit, lang,
                                    content, content_sha256, doclen
  <index_dir>/stats/                single row: n_docs, avgdl
  <index_dir>/dfreq/bucket=B/       term, df
  <index_dir>/triples/bucket=B/     doc_id, term, tf   (build intermediate,
                                    reused by all postings buckets — the
                                    tokenize shuffle is paid exactly once)
  <index_dir>/postings/bucket=B/    compressed posting rows (POSTINGS_SCHEMA)
  <index_dir>/_checkpoint/          stage, partition_id, status, n_docs,
                                    n_terms, attempt, duration_ms, updated_at

``bucket = pmod(xxhash64(term), n_buckets)`` — query-time term lookups prune
to one bucket directory (partition pruning on the parquet scan).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_core_spark.corpus import with_doc_columns
from search_engine_core_spark.operators.postings import build_postings
from search_engine_core_spark.operators.stats import CorpusStats, doc_frequency, triples

CHECKPOINT_SCHEMA = (
    "stage string, partition_id int, status string, n_docs long, "
    "n_terms long, attempt int, duration_ms long, updated_at timestamp"
)


class BuildAborted(RuntimeError):
    """Raised by fault injection in tests to simulate a mid-build crash."""


def _bucket_expr(n_buckets: int):
    return F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")


@dataclass
class IndexBuilder:
    spark: SparkSession
    index_dir: str
    n_buckets: int = 16
    hot_df_threshold: int = 100_000
    n_shards: int = 8

    # -- checkpoint ------------------------------------------------------
    def _ckpt_path(self) -> str:
        return f"{self.index_dir}/_checkpoint"

    def _completed(self) -> set[tuple[str, int]]:
        try:
            rows = (
                self.spark.read.parquet(self._ckpt_path())
                .filter(F.col("status") == "completed")
                .select("stage", "partition_id")
                .collect()
            )
        except Exception:
            return set()
        return {(r["stage"], r["partition_id"]) for r in rows}

    def _next_attempt(self) -> int:
        try:
            row = self.spark.read.parquet(self._ckpt_path()).agg(
                F.max("attempt").alias("a")
            ).collect()[0]
            return int(row["a"] or 0) + 1
        except Exception:
            return 1

    def _log(self, stage: str, partition_id: int, status: str, n_docs: int, n_terms: int, attempt: int, t0: float) -> None:
        row = [
            (
                stage,
                partition_id,
                status,
                n_docs,
                n_terms,
                attempt,
                int((time.monotonic() - t0) * 1000),
            )
        ]
        (
            self.spark.createDataFrame(
                row,
                "stage string, partition_id int, status string, n_docs long, n_terms long, attempt int, duration_ms long",
            )
            .withColumn("updated_at", F.current_timestamp())
            .write.mode("append")
            .parquet(self._ckpt_path())
        )

    # -- build -----------------------------------------------------------
    def build(self, corpus: DataFrame, fail_after_buckets: int | None = None) -> None:
        """Full build with resume. ``fail_after_buckets`` aborts after N
        postings buckets (fault injection for the resume test)."""
        done = self._completed()
        attempt = self._next_attempt()

        if ("docs", 0) not in done:
            t0 = time.monotonic()
            docs = with_doc_columns(corpus) if "doc_id" not in corpus.columns else corpus
            docs.write.mode("overwrite").parquet(f"{self.index_dir}/docs")
            n = self.spark.read.parquet(f"{self.index_dir}/docs").count()
            self._log("docs", 0, "completed", n, 0, attempt, t0)

        docs = self.spark.read.parquet(f"{self.index_dir}/docs")

        if ("stats", 0) not in done:
            t0 = time.monotonic()
            docs.agg(
                F.count(F.lit(1)).alias("n_docs"), F.avg("doclen").alias("avgdl")
            ).write.mode("overwrite").parquet(f"{self.index_dir}/stats")
            self._log("stats", 0, "completed", 0, 0, attempt, t0)

        if ("triples", 0) not in done:
            t0 = time.monotonic()
            trip = triples(docs).withColumn("bucket", _bucket_expr(self.n_buckets))
            trip.write.mode("overwrite").partitionBy("bucket").parquet(
                f"{self.index_dir}/triples"
            )
            self._log("triples", 0, "completed", 0, 0, attempt, t0)

        trip = self.spark.read.parquet(f"{self.index_dir}/triples")

        if ("dfreq", 0) not in done:
            t0 = time.monotonic()
            # df per term; bucket carried through (term -> one bucket).
            dfreq = trip.groupBy("term", "bucket").agg(F.count(F.lit(1)).alias("df"))
            dfreq.write.mode("overwrite").partitionBy("bucket").parquet(
                f"{self.index_dir}/dfreq"
            )
            self._log("dfreq", 0, "completed", 0, 0, attempt, t0)

        dfreq = self.spark.read.parquet(f"{self.index_dir}/dfreq")

        built = 0
        for b in range(self.n_buckets):
            if ("postings", b) in done:
                continue
            if fail_after_buckets is not None and built >= fail_after_buckets:
                raise BuildAborted(f"injected failure after {built} buckets")
            t0 = time.monotonic()
            bucket_trip = trip.filter(F.col("bucket") == b).select("doc_id", "term", "tf")
            bucket_df = dfreq.filter(F.col("bucket") == b).select("term", "df")
            postings = build_postings(
                bucket_trip, bucket_df, self.hot_df_threshold, self.n_shards
            )
            postings.write.mode("overwrite").parquet(f"{self.index_dir}/postings/bucket={b}")
            n_terms = (
                self.spark.read.parquet(f"{self.index_dir}/postings/bucket={b}")
                .select("term")
                .distinct()
                .count()
            )
            self._log("postings", b, "completed", 0, n_terms, attempt, t0)
            built += 1


class IndexReader:
    """Query-side view over a materialized index."""

    def __init__(self, spark: SparkSession, index_dir: str, n_buckets: int = 16):
        self.spark = spark
        self.index_dir = index_dir
        self.n_buckets = n_buckets
        self.docs = spark.read.parquet(f"{index_dir}/docs")
        row = spark.read.parquet(f"{index_dir}/stats").collect()[0]
        self.stats = CorpusStats(n_docs=int(row["n_docs"]), avgdl=float(row["avgdl"]))
        # basePath keeps the bucket partition column visible for pruning
        self.postings = spark.read.option("basePath", f"{index_dir}/postings").parquet(
            f"{index_dir}/postings"
        )
        self.dfreq = spark.read.parquet(f"{index_dir}/dfreq").select("term", "df")

    def postings_for_terms(self, terms: list[str]) -> DataFrame:
        """Partition-pruned postings scan: bucket isin + term isin both push
        into the parquet source (verify via .explain: PartitionFilters /
        PushedFilters)."""
        buckets = sorted(
            {
                r["b"]
                for r in self.spark.createDataFrame([(t,) for t in terms], "term string")
                .select(_bucket_expr(self.n_buckets).alias("b"))
                .collect()
            }
        )
        return self.postings.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
