"""Incremental index maintenance with Structured Streaming.

The reference indexes documents one at a time as the crawler finds them
(S8/S9, ``src/storage/RedisSearchStorage.cpp:127-172,575-592``; RediSearch
absorbs updates transparently). The Spark-native equivalent: new corpus
files land in a directory (or Kafka topic, S11/S12 —
``src/kafka/KafkaProducer.cpp``/``KafkaConsumer.cpp``; swap
``readStream.format('kafka')`` in), a file-source stream picks them up,
and ``foreachBatch`` appends (doc_id, term, tf) delta segments plus a
per-batch lineage row — the streaming twin of the batch checkpoint table
(T9 at-least-once: Spark's checkpointLocation replays unfinished batches;
the batch_id column makes replayed appends idempotent to dedup
downstream).

Delta segments are NOT merged into the main compressed postings on every
batch — that's the classic LSM-ish design (RediSearch does the same
internally): queries union [main postings ⊎ delta triples]; a periodic
compaction job (``compact_deltas``) folds deltas back through the normal
IndexBuilder path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_core_spark.corpus import CORPUS_SCHEMA, with_doc_columns
from search_engine_core_spark.operators.stats import triples


def start_incremental_index(
    spark: SparkSession,
    inbox_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Stream corpus files from ``inbox_dir`` into delta triple segments
    under ``<index_dir>/delta``. Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(inbox_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        docs = with_doc_columns(batch_df)
        (
            triples(docs)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(f"{index_dir}/delta")
        )
        (
            docs.drop("content")
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(f"{index_dir}/delta_docs")
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def delta_triples(spark: SparkSession, index_dir: str) -> DataFrame:
    """Current delta segments as (doc_id, term, tf) — replay-safe: if a
    batch was appended twice (at-least-once), keep one copy per
    (doc_id, term, batch_id)."""
    try:
        raw = spark.read.parquet(f"{index_dir}/delta")
    except Exception:
        return spark.createDataFrame([], "doc_id long, term string, tf long")
    return (
        raw.dropDuplicates(["doc_id", "term", "batch_id"])
        .groupBy("doc_id", "term")
        .agg(F.max("tf").alias("tf"))
    )
