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
            # content kept: the LSM read path (DeltaSearchEngine) serves
            # phrase-verify/snippets from delta docs too; the duplication
            # is bounded by compaction cadence (level-0 residency)
            docs.withColumn("batch_id", F.lit(batch_id))
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


from search_engine_core_spark.engine import _PaginatedSearch


class DeltaSearchEngine(_PaginatedSearch):
    """The LSM READ path: answer queries over [main postings ⊎ delta
    segments] WITHOUT waiting for compaction — newly streamed documents
    are searchable as soon as their micro-batch commits, exactly like
    RediSearch absorbing live HSET updates while the reference crawls
    (``src/storage/RedisSearchStorage.cpp:127-172``). ``compact_deltas``
    later folds the same rows into the compressed postings; ranks are
    identical before and after by construction (tested).

    Semantics per query:
    * candidate triples = decoded main postings for the query terms,
      MINUS docs superseded by any delta batch (re-crawl replacement),
      UNION the delta triples (latest-batch-wins, replay-deduped);
    * df for idf = exact count over that merged term slice (a term's
      global df IS the number of docs holding it — the merged slice
      contains every such doc for the query's terms);
    * corpus stats (N, avgdl) = main stats adjusted by the delta docs —
      one tiny aggregation at engine construction.

    Scale shape: the main side stays bucket-pruned + block-compressed;
    the delta side is a plain columnar scan bounded by compaction
    cadence (classic LSM level-0). Nothing decodes outside the query's
    terms."""

    def __init__(self, spark: SparkSession, index_dir: str, n_buckets: int = 16):
        from search_engine_core_spark.sources.index_io import IndexReader

        self.spark = spark
        self.index_dir = index_dir
        self.reader = IndexReader(spark, index_dir, n_buckets)
        self.delta = delta_triples(spark, index_dir).localCheckpoint(eager=True)
        try:
            ddocs = spark.read.parquet(f"{index_dir}/delta_docs")
            w_latest = ddocs.groupBy("doc_id").agg(F.max("batch_id").alias("batch_id"))
            self.delta_docs = (
                ddocs.dropDuplicates(["doc_id", "batch_id"])
                .join(w_latest, ["doc_id", "batch_id"])
                .drop("batch_id")
                .localCheckpoint(eager=True)
            )
        except Exception:
            # no delta_docs (empty level-0, e.g. right after compaction):
            # an empty frame with the MAIN docs schema keeps every column
            # through the union (a narrower schema would project content
            # away and break phrase verify / snippets)
            self.delta_docs = spark.createDataFrame([], self.reader.docs.schema)
        sup = self.delta_docs.select("doc_id")
        # every column both sides share survives (lang/repo filters,
        # content for phrase verify + snippets); engine-specific extras drop
        common = [c for c in self.reader.docs.columns if c in self.delta_docs.columns]
        if not common:
            common = ["doc_id", "doclen"]
        self.docs = (
            self.reader.docs.select(*common)
            .join(sup, "doc_id", "left_anti")
            .unionByName(self.delta_docs.select(*common))
        )
        agg = self.docs.agg(
            F.count(F.lit(1)).alias("n"), F.avg("doclen").alias("avgdl")
        ).collect()[0]
        from search_engine_core_spark.operators.stats import CorpusStats

        self.stats = CorpusStats(n_docs=int(agg["n"]), avgdl=float(agg["avgdl"] or 1.0))

    def search(self, query: str, k: int = 10, algorithm: str = "bm25") -> DataFrame:
        from search_engine_core_spark.operators.postings import decode_postings_df
        from search_engine_core_spark.plans.planner import Planner, scoring_terms
        from search_engine_core_spark.plans.query_parser import QueryParser

        ast = QueryParser().parse(query)
        terms = scoring_terms(ast)
        sup = self.delta_docs.select("doc_id")
        if terms:
            main_trip = decode_postings_df(
                self.reader.postings_for_terms(terms)
            ).join(sup, "doc_id", "left_anti")
            trip = main_trip.unionByName(
                self.delta.filter(F.col("term").isin(terms))
            ).localCheckpoint(eager=True)
        else:
            trip = self.spark.createDataFrame([], "doc_id long, term string, tf long")
        dfreq = trip.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        return Planner(
            self.docs, trip, dfreq, self.stats, phrase_docs_fn=self._phrase_docs_fn()
        ).topk_ast(ast, k, algorithm)

    def _phrase_docs_fn(self):
        """Positional phrase candidates over [main positions ∖ superseded
        ⊎ delta positions] when the main index stores the sidecar — so a
        SLIM main index answers phrases across the whole LSM view with no
        content re-attach. Delta docs' positions are extracted on the fly
        (level-0 is small by compaction cadence); superseded main docs are
        anti-joined out exactly like their postings."""
        if not self.reader.has_positions():
            return None
        from search_engine_core_spark.functions.tokenizer import tokenize_py
        from search_engine_core_spark.operators.positions import (
            POSITIONS_SCHEMA,
            phrase_candidate_docs,
            position_rows_arrow,
        )

        def fn(term):
            toks = tokenize_py(term.value)
            if not toks:
                return None
            uniq = list(dict.fromkeys(toks))
            pos = (
                self.reader.positions_for_terms(uniq)
                .select("doc_id", "term", "npos", "pos_bytes")
                .join(self.delta_docs.select("doc_id"), "doc_id", "left_anti")
            )
            if "content" in self.delta_docs.columns:
                delta_pos = (
                    self.delta_docs.select("doc_id", "content")
                    .mapInArrow(position_rows_arrow, POSITIONS_SCHEMA)
                    .filter(F.col("term").isin(uniq))
                )
                pos = pos.unionByName(delta_pos)
            return phrase_candidate_docs(pos, toks)

        return fn


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

    # the docs table, corpus stats and dfreq must move WITH the postings,
    # or post-compaction readers score against a corpus that no longer
    # contains the delta docs (stale N/avgdl, missing doclens) — the
    # compacted index must be indistinguishable from a fresh batch build
    # only a MISSING delta_docs dir (triples-only stream) is tolerable;
    # write/rmtree/move failures must propagate — postings are already
    # rewritten, and swallowing them would leave docs/stats inconsistent
    # with the compacted postings
    from pyspark.errors import AnalysisException

    try:
        ddocs = spark.read.parquet(f"{index_dir}/delta_docs")
    except AnalysisException:
        ddocs = None  # no delta_docs: docs table unchanged
    if ddocs is not None:
        latest = ddocs.groupBy("doc_id").agg(F.max("batch_id").alias("batch_id"))
        ddocs = (
            ddocs.dropDuplicates(["doc_id", "batch_id"])
            .join(latest, ["doc_id", "batch_id"])
            .drop("batch_id")
        )
        main_docs = spark.read.parquet(f"{index_dir}/docs")
        cols = [c for c in main_docs.columns if c in ddocs.columns]
        new_docs = (
            main_docs.select(*cols)
            .join(ddocs.select("doc_id"), "doc_id", "left_anti")
            .unionByName(ddocs.select(*cols))
        )
        dtmp = f"{index_dir}/docs_compact_tmp"
        new_docs.write.mode("overwrite").parquet(dtmp)
        shutil.rmtree(f"{index_dir}/docs")
        shutil.move(dtmp, f"{index_dir}/docs")

    # the positional sidecar (if built) must move with the postings too:
    # superseded docs' stale positions out, delta docs' positions in —
    # per-(doc, term) rows, so compaction here is an anti-join + append,
    # not a full re-extract of the main corpus
    import os

    if os.path.isdir(f"{index_dir}/positions"):
        from search_engine_core_spark.operators.positions import (
            POSITIONS_SCHEMA,
            position_rows_arrow,
        )

        old_pos = spark.read.option("basePath", f"{index_dir}/positions").parquet(
            f"{index_dir}/positions"
        )
        kept = old_pos.join(delta_docs, "doc_id", "left_anti")
        if ddocs is not None and "content" in ddocs.columns:
            fresh = (
                ddocs.select("doc_id", "content")
                .mapInArrow(position_rows_arrow, POSITIONS_SCHEMA)
                .withColumn("bucket", _bucket_expr(n_buckets))
            )
            new_pos = kept.select(*fresh.columns).unionByName(fresh)
        else:
            new_pos = kept
        ptmp = f"{index_dir}/positions_compact_tmp"
        (
            new_pos.repartition("bucket")
            .sortWithinPartitions("bucket", "term", "doc_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(ptmp)
        )
        shutil.rmtree(f"{index_dir}/positions")
        shutil.move(ptmp, f"{index_dir}/positions")
    docs_now = spark.read.parquet(f"{index_dir}/docs")
    stats_df = docs_now.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("doclen").alias("avgdl")
    )
    stats_df.write.mode("overwrite").parquet(f"{index_dir}/stats_compact_tmp")
    shutil.rmtree(f"{index_dir}/stats")
    shutil.move(f"{index_dir}/stats_compact_tmp", f"{index_dir}/stats")
    post_now = spark.read.option("basePath", f"{index_dir}/postings").parquet(
        f"{index_dir}/postings"
    )
    new_dfreq = post_now.groupBy("term", "bucket").agg(F.sum("df").alias("df"))
    (
        new_dfreq.sortWithinPartitions("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{index_dir}/dfreq_compact_tmp")
    )
    shutil.rmtree(f"{index_dir}/dfreq", ignore_errors=True)
    shutil.move(f"{index_dir}/dfreq_compact_tmp", f"{index_dir}/dfreq")
    shutil.rmtree(f"{index_dir}/delta", ignore_errors=True)
    shutil.rmtree(f"{index_dir}/delta_docs", ignore_errors=True)
