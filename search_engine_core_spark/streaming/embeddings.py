"""Continuous re-embedding ingest for the materialized embedding index.

A training-data pipeline re-embeds documents continuously (model refresh,
content re-crawl); the text index has had a streaming ingest since r3
(``streaming/incremental.py``). This is the embedding twin: micro-batches
of (vec_id, embedding) flow through Structured Streaming into
partition-local ``EmbeddingIndexBuilder.upsert`` calls — the J3 re-crawl
merge semantics (``src/storage/ContentStorage.cpp:246-273``) applied to
vectors, so a re-embedded document replaces its stored vector wherever
its old assignment lived and the ANN probes see the fresh embedding on
the next query.

Shape differences vs the text LSM are deliberate:

* No level-0 / segments. A text delta must stay un-merged because folding
  postings is expensive; an embedding upsert rewrites ONLY the affected
  (bucket[, cell]) leaf partitions (cost ~ touched partitions, never the
  index), so every micro-batch lands directly in its final layout — there
  is nothing to compact, ever.
* Idempotent replay comes from REPLACE semantics, not batch_id dedup:
  re-upserting the same rows replaces them with themselves (n_vecs net
  change 0) — an at-least-once redelivery converges to the same logical
  state without the text side's latest-batch-wins bookkeeping.
* Bootstrap: the first micro-batch against a missing index runs
  ``build`` — planes/centroids are pinned by that batch (meta.json is
  committed first, the builder's resume contract) and every later batch
  assigns with the STORED sidecar, so probing stays bit-identical across
  the index's whole life. Re-pinning the sidecar on a drifted corpus is
  an explicit rebuild, exactly like the reference re-indexing.

Crash window, honestly: ``upsert``'s partition swap is per-directory
moves, not one atomic commit — a crash mid-swap can leave a subset of the
touched partitions new and the rest old until the micro-batch replays
(which re-upserts and converges). At 100 TB the swap maps onto an Iceberg
REPLACE-partition commit and the window disappears.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: streaming source schema — the embeddings table's key + vector
EMB_STREAM_SCHEMA = "vec_id long, embedding array<float>"


def start_incremental_embeddings(
    spark: SparkSession,
    inbox_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    builder_kwargs: dict | None = None,
):
    """Stream (vec_id, embedding) micro-batches into the materialized
    embedding index. Returns the StreamingQuery.

    ``builder_kwargs`` configure the ``EmbeddingIndexBuilder`` (n_bits,
    n_centroids, ...) — they matter on the bootstrap batch and MUST match
    across restarts (the builder itself re-reads meta.json for planes and
    centroids, so layout params are only consulted at bootstrap).

    Rows are collapsed to one per vec_id inside each micro-batch (the
    builder's duplicate guard would otherwise reject the batch); the
    winner is the lexicographic max embedding — arbitrary but
    deterministic across replays. Producers with real versions should
    collapse to latest themselves before writing the batch, exactly like
    the text side's batch_id latest-wins contract.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from search_engine_core_spark.sources.embedding_index import (
            EmbeddingIndexBuilder,
        )

        batch = (
            batch_df.where(F.col("vec_id").isNotNull() & F.col("embedding").isNotNull())
            .groupBy("vec_id")
            .agg(F.max("embedding").alias("embedding"))
        )
        builder = EmbeddingIndexBuilder(spark, index_dir, **(builder_kwargs or {}))
        if os.path.exists(f"{index_dir}/meta.json"):
            builder.upsert(batch)
        elif batch.limit(1).count():
            builder.build(batch)

    stream = (
        spark.readStream.schema(EMB_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(inbox_dir)
    )
    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
