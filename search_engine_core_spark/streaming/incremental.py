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


def kafka_source_options(
    topic: str,
    bootstrap_servers: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int = 100_000,
) -> dict[str, str]:
    """Reader options implementing the reference consumer's at-least-once
    contract (``src/kafka/KafkaConsumer.cpp:63-89``): it subscribes with
    ``auto.offset.reset=earliest`` and commits offsets MANUALLY only
    after a message is fully processed. Structured Streaming's Kafka
    source gives the same guarantee a different way — offsets live in the
    query's checkpointLocation and advance only when a batch commits, so
    Kafka-side auto-commit stays disabled (the source never commits to
    the broker). ``failOnDataLoss=false`` mirrors the reference's
    tolerate-and-log handling of retention-expired offsets
    (KafkaConsumer.cpp error branch); ``maxOffsetsPerTrigger`` bounds a
    catch-up batch the way ``maxFilesPerTrigger`` bounds the file source."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": str(max_offsets_per_trigger),
    }


def parse_kafka_corpus(raw: DataFrame) -> DataFrame:
    """Kafka records -> corpus rows: ``value`` holds one JSON document per
    message, the shape the reference's producer emits
    (``src/kafka/KafkaProducer.cpp:15-42`` sends the serialized document
    JSON). Malformed messages yield null fields (PERMISSIVE) and are
    dropped rather than poisoning the batch — the reference logs and
    skips deserialization failures the same way."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), CORPUS_SCHEMA).alias("d")
    ).select("d.*")
    return parsed.filter(F.col("content").isNotNull())


def start_incremental_index(
    spark: SparkSession,
    inbox_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    source: str = "files",
    kafka_options: dict | None = None,
):
    """Stream new corpus documents into delta triple segments under
    ``<index_dir>/delta``. Returns the StreamingQuery.

    ``source="files"`` tails ``inbox_dir`` (the sandbox default — no
    Kafka jars available here, so this path is what the integration
    tests exercise). ``source="kafka"`` swaps in the Kafka source with
    the reference consumer's at-least-once contract; ``kafka_options``
    are the kwargs of :func:`kafka_source_options`. Everything after the
    source — batching, idempotent replay via batch_id, lineage — is
    source-agnostic, so the swap is exactly the source + value parsing."""
    if source == "kafka":
        raw = (
            spark.readStream.format("kafka")
            .options(**kafka_source_options(**(kafka_options or {})))
            .load()
        )
        stream = parse_kafka_corpus(raw)
    elif source == "files":
        stream = (
            spark.readStream.schema(CORPUS_SCHEMA)
            .option("maxFilesPerTrigger", 64)
            .parquet(inbox_dir)
        )
    else:
        raise ValueError(f"unknown source {source!r} (files|kafka)")

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
    """Current delta segments as (doc_id, term, tf).

    Replay-safe AND update-correct: duplicate appends of the SAME batch
    (at-least-once replay) collapse via dropDuplicates on (doc, term,
    batch_id); a doc re-crawled in a LATER batch is resolved by keeping
    only its latest batch's triples — max(tf) across batches would pin a
    stale higher tf forever and never drop removed terms."""
    try:
        raw = spark.read.parquet(f"{index_dir}/delta")
    except Exception:
        return spark.createDataFrame([], "doc_id long, term string, tf long")
    deduped = raw.dropDuplicates(["doc_id", "term", "batch_id"])
    latest = deduped.groupBy("doc_id").agg(F.max("batch_id").alias("batch_id"))
    return deduped.join(latest, ["doc_id", "batch_id"]).select("doc_id", "term", "tf")


def compact_deltas(
    spark: SparkSession,
    index_dir: str,
    n_buckets: int = 16,
    hot_df_threshold: int = 100_000,
    n_shards: int = 8,
) -> None:
    """Fold the delta segments back into the main compressed postings —
    the LSM compaction step. Docs present in deltas REPLACE their main-
    index postings (re-crawl upsert, J3); the result is byte-equivalent to
    a fresh batch build over (main docs ∖ delta docs) ∪ delta docs.

    Plan shape: decode only the affected buckets' postings is not possible
    for doc-level replacement (a doc's terms span all buckets), so
    compaction is a full postings rewrite — run it at the cadence where
    delta volume amortizes it (classic LSM level-0 -> level-1 merge).
    """
    from search_engine_core_spark.operators.postings import (
        build_postings,
        decode_postings_df,
    )
    from search_engine_core_spark.sources.index_io import _bucket_expr

    delta = delta_triples(spark, index_dir)
    if delta.isEmpty():
        return
    reader_post = spark.read.option("basePath", f"{index_dir}/postings").parquet(
        f"{index_dir}/postings"
    )
    main = decode_postings_df(reader_post)
    delta_docs = delta.select("doc_id").distinct()
    merged = (
        main.join(delta_docs, "doc_id", "left_anti")
        .unionByName(delta)
        .withColumn("bucket", _bucket_expr(n_buckets))
    )
    dfreq = merged.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    postings = build_postings(
        merged, dfreq, hot_df_threshold, n_shards, bucket_col=True
    )
    # write-aside then swap: Spark cannot overwrite the path it reads from
    # (at scale this is an atomic Iceberg REPLACE / metadata swap; on the
    # local FS a directory rename plays that role)
    import shutil

    tmp = f"{index_dir}/postings_compact_tmp"
    (
        postings.sortWithinPartitions("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(tmp)
    )
    shutil.rmtree(f"{index_dir}/postings")
    shutil.move(tmp, f"{index_dir}/postings")
    shutil.rmtree(f"{index_dir}/delta", ignore_errors=True)
    shutil.rmtree(f"{index_dir}/delta_docs", ignore_errors=True)
