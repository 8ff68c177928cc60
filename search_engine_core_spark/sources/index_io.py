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
from dataclasses import dataclass, field

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_core_spark.corpus import with_doc_columns
from search_engine_core_spark.functions.tokenizer import tokenize_expr
from search_engine_core_spark.operators.postings import build_postings
from search_engine_core_spark.operators.stats import CorpusStats, triples

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
    commit_group: int | None = None  # buckets per write job (None = all)
    encode_partitions: int | None = None  # pin the encode exchange width
    store_content: bool = True  # False = slim docs table (no content copy)
    # True (default): per-doc tf computed map-side in an Arrow Python
    # stage — the shuffle carries distinct (doc,term) rows, ~2x fewer than
    # raw occurrences, at the cost of a second JVM<->Python crossing.
    # False: pure-JVM tokenize+explode; the encoder run-length-counts tf
    # post-shuffle. Measured A/B at 2M docs: the raw shape's 400M-row sort
    # spills hard on a 4-core/12GB executor (670 s vs 309 s postings) and
    # only matches map-side-tf at 16 cores — keep the default unless
    # executors have memory to sort raw occurrences without spilling.
    map_side_tf: bool = True
    # True (default, requires map_side_tf): the fast path tokenizes,
    # computes tf, assigns hot shards AND varbyte-encodes PARTIAL posting
    # lists in ONE Arrow map stage, so the build shuffle carries ~4 B per
    # posting instead of a ~40 B triple row, and the reduce-side Python
    # stage receives ~40x fewer rows (operators/partial_postings.py;
    # guide §2.3/§8 — measured: postings stage 13.3 s -> see
    # OPTIMIZATION_r06.md, logically identical output, test-pinned).
    # False restores the triple-shuffle shape.
    partial_encode: bool = True
    # Opt-in positional sidecar (<index_dir>/positions/bucket=B/): token
    # positions per (doc, term), delta+varbyte encoded — phrase queries
    # answered index-only (no attach_content on slim indexes). Positions
    # roughly double index bytes, hence opt-in (operators/positions.py).
    store_positions: bool = False
    # Opt-in: write the docs table on a side thread while the postings job
    # runs (requires spark.scheduler.mode=FAIR to actually share slots).
    # Measured on one shared-memory-bus box: helps the small config
    # (fills 4-core bubbles, 372->301 s) but HURTS the big one (FAIR
    # slot-splitting stretches the CPU-bound encode, 150->206 s), so the
    # default is the sequential shape; on a real cluster with per-node
    # buses the overlap trade may flip back.
    overlap_docs_write: bool = False
    stage_secs: dict = field(default_factory=dict)  # per-stage wall seconds

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
        except AnalysisException:  # no lineage yet — fresh build
            return set()
        return {(r["stage"], r["partition_id"]) for r in rows}

    def _next_attempt(self) -> int:
        try:
            row = self.spark.read.parquet(self._ckpt_path()).agg(
                F.max("attempt").alias("a")
            ).collect()[0]
            return int(row["a"] or 0) + 1
        except AnalysisException:  # no lineage yet — first attempt
            return 1

    def _mark(self, stage: str, t0: float) -> float:
        dur = time.monotonic() - t0
        self.stage_secs[stage] = self.stage_secs.get(stage, 0.0) + dur
        return dur

    def _log(self, stage: str, partition_id: int, status: str, n_docs: int, n_terms: int, attempt: int, t0: float) -> None:
        self._log_many(
            [(stage, partition_id, status, n_docs, n_terms, attempt, int(self._mark(stage, t0) * 1000))]
        )

    def _log_many(self, rows: list[tuple]) -> None:
        """ONE append job for any number of lineage rows — per-bucket logs
        used to be one tiny parquet write job EACH, a pure serial tail that
        the 4-executor config paid identically to the 1-executor one."""
        if not rows:
            return
        (
            self.spark.createDataFrame(
                rows,
                "stage string, partition_id int, status string, n_docs long, n_terms long, attempt int, duration_ms long",
            )
            .withColumn("updated_at", F.current_timestamp())
            .write.mode("append")
            .parquet(self._ckpt_path())
        )

    # -- build -----------------------------------------------------------
    def build(self, corpus: DataFrame, fail_after_buckets: int | None = None) -> None:
        """Full build with resume. ``fail_after_buckets`` aborts after N
        postings buckets (fault injection for the resume test).

        Two execution shapes, same output:
        * ``commit_group`` unset -> FAST path: no triples intermediate —
          hot terms detected from a seeded sample, postings built in ONE
          pipelined job (tokenize -> tf agg -> shuffle(term,shard) ->
          sort -> Arrow encode -> partitioned write), exact df derived
          afterwards from postings metadata (sum of shard df — a
          column-stats scan, no re-tokenize).
        * ``commit_group`` set -> RESUMABLE path: triples materialized
          partitioned by bucket so crashed builds re-run only pending
          buckets (T6 semantics).
        """
        done = self._completed()
        attempt = self._next_attempt()

        obs = None
        full_docs = with_doc_columns(corpus) if "doc_id" not in corpus.columns else corpus
        docs_thread = None
        docs_err: list[Exception] = []
        if ("docs", 0) not in done:
            t0_docs = time.monotonic()
            from pyspark.sql import Observation

            docs_out = full_docs
            # corpus stats ride the docs write via observe(): no second
            # full scan job just for (n_docs, avgdl) — at 1-executor scale
            # that scan was pure serial tail
            obs = Observation("corpus_stats")
            docs_out = docs_out.observe(
                obs, F.count(F.lit(1)).alias("n_docs"), F.avg("doclen").alias("avgdl")
            )
            if not self.store_content:
                # Slim mode — the 100 TB shape: the source table (Iceberg)
                # already holds content; copying it into the index doubles
                # storage and makes the docs stage a pure memcpy job. The
                # slim table keeps metadata + doclen + content_sha256;
                # readers re-attach content by deriving doc_id from the
                # source (deterministic) via IndexReader.attach_content.
                docs_out = docs_out.drop("content")

            def _write_docs():
                try:
                    t0w = time.monotonic()
                    docs_out.write.mode("overwrite").parquet(f"{self.index_dir}/docs")
                    # stage_secs: the WRITE's own duration (the lineage
                    # row's t0_docs spans to build end in overlap mode)
                    self.stage_secs["docs_write"] = time.monotonic() - t0w
                except Exception as e:  # surfaced after join
                    docs_err.append(e)

            if self.commit_group is None and self.overlap_docs_write:
                # opt-in overlap (see the field's docstring for the
                # measured trade): tokenize reads the in-memory source
                # projection instead of the not-yet-written docs parquet
                import threading

                docs_thread = threading.Thread(target=_write_docs, name="docs-write")
                docs_thread.start()
            else:
                _write_docs()
                if docs_err:
                    raise docs_err[0]
                # the docs write just finished, so its Observation is
                # immediately available — stash n_docs NOW so the hot-term
                # sampler never pays a count job on a fresh build (it read
                # getattr(self, '_n_docs') which _finish_docs_and_stats
                # only sets AFTER the postings stage)
                self._n_docs = int(obs.get["n_docs"])
        else:
            t0_docs = None

        if t0_docs is not None and docs_thread is not None:
            docs = full_docs  # postings tokenize directly from the source
        elif not self.store_content:
            # slim parquet has no content column — tokenize from the source
            docs = full_docs
        else:
            docs = self.spark.read.parquet(f"{self.index_dir}/docs")

        def _finish_docs_and_stats():
            """Join the overlapped docs write, then stats + lineage — also
            called on postings failure so a crash leaves docs/stats
            checkpointed exactly like the sequential build did."""
            if docs_thread is not None:
                docs_thread.join()
                if docs_err:
                    raise docs_err[0]
            if ("stats", 0) not in done:
                t0 = time.monotonic()
                if obs is not None:
                    got = obs.get
                    stats_df = self.spark.createDataFrame(
                        [(int(got["n_docs"]), float(got["avgdl"]))], "n_docs long, avgdl double"
                    )
                else:  # resume path: docs were written by a previous attempt
                    stats_df = self.spark.read.parquet(f"{self.index_dir}/docs").agg(
                        F.count(F.lit(1)).alias("n_docs"), F.avg("doclen").alias("avgdl")
                    )
                stats_df.write.mode("overwrite").parquet(f"{self.index_dir}/stats")
                self._log("stats", 0, "completed", 0, 0, attempt, t0)
            self._n_docs = int(
                self.spark.read.parquet(f"{self.index_dir}/stats").collect()[0]["n_docs"]
            )
            if t0_docs is not None:
                # doc count from the docs write's observation — no count scan
                self._log("docs", 0, "completed", self._n_docs, 0, attempt, t0_docs)

        if self.commit_group is None:
            try:
                self._build_fast(docs, done, attempt, fail_after_buckets)
            except BaseException:
                # still finish the overlapped docs/stats writes (their
                # thread may hold resources), but never let THEIR failure
                # mask the build error being propagated — the root cause
                # of a failed build must surface, not the secondary one
                try:
                    _finish_docs_and_stats()
                except Exception:
                    pass
                raise
            else:
                _finish_docs_and_stats()
        else:
            _finish_docs_and_stats()
            self._build_resumable(docs, done, attempt, fail_after_buckets)

        if ("dfreq", 0) not in self._completed():
            t0 = time.monotonic()
            # exact df from postings metadata: shard dfs sum per term.
            # Reads only (bucket, term, df) columns — parquet prunes the
            # heavy binary columns away.
            post = self.spark.read.option(
                "basePath", f"{self.index_dir}/postings"
            ).parquet(f"{self.index_dir}/postings")
            dfreq = post.groupBy("term", "bucket").agg(F.sum("df").alias("df"))
            dfreq.sortWithinPartitions("bucket").write.mode("overwrite").partitionBy(
                "bucket"
            ).parquet(f"{self.index_dir}/dfreq")
            self._log("dfreq", 0, "completed", 0, 0, attempt, t0)

        if self.store_positions and ("positions", 0) not in self._completed():
            from search_engine_core_spark.operators.positions import (
                POSITIONS_SCHEMA,
                position_rows_arrow,
            )

            t0 = time.monotonic()
            pos = (
                docs.select("doc_id", "content")
                .mapInArrow(position_rows_arrow, POSITIONS_SCHEMA)
                .withColumn("bucket", _bucket_expr(self.n_buckets))
            )
            # one shuffle keyed by the partition column: each bucket dir is
            # written by a bounded task set (same discipline as postings)
            (
                pos.repartition("bucket")
                .sortWithinPartitions("bucket", "term", "doc_id")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(f"{self.index_dir}/positions")
            )
            self._log("positions", 0, "completed", 0, 0, attempt, t0)

    def _hot_terms_sampled(self, docs: DataFrame) -> DataFrame:
        """Estimate the hot-term set (df > threshold) from a seeded sample.

        Hot terms are by definition near-ubiquitous, so a small sample
        finds them with near-certainty; misclassification only changes
        sharding (perf), never index content. Returns a DataFrame(term)
        suitable for broadcast."""
        n_total = getattr(self, "_n_docs", None) or docs.count()
        target = 5_000  # enough to see every df/N >= ~1% term w.h.p.
        fraction = min(1.0, target / max(n_total, 1))
        # limit() instead of sample(): sample(fraction) still SCANS the whole
        # table (no pushdown), which at 2M docs re-read ~3 GB just to pick
        # 5k rows; limit() stops after the first partitions. The positional
        # bias is acceptable here — hot terms are near-ubiquitous, and a
        # miss only changes sharding (perf), never index content.
        sample = docs.limit(target) if fraction < 1.0 else docs
        est = (
            sample.select(F.explode(F.array_distinct(tokenize_expr("content"))).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("s_df"))
        )
        cutoff = self.hot_df_threshold * fraction
        return est.filter(F.col("s_df") > cutoff).select("term")

    def _hot_terms_sampled_local(self, docs: DataFrame) -> list[str]:
        """Driver-side twin of :meth:`_hot_terms_sampled` for the partial
        build path (which needs the hot LIST on the driver anyway): pull
        the same bounded sample's content (a few MB) and tokenize/count
        in Arrow C++ locally — the explode/groupBy Spark job this
        replaces cost ~1-1.4 s per build, ~20% of the warm build
        (measured r6). Same estimator, same cutoff, same benign
        misclassification contract (sharding only, never content)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from search_engine_core_spark.functions.tokenizer import (
            MIN_TOKEN_LEN,
            TOKEN_SPLIT_RE,
        )

        n_total = getattr(self, "_n_docs", None) or docs.count()
        target = 5_000
        fraction = min(1.0, target / max(n_total, 1))
        sample = docs.select("content")
        if fraction < 1.0:
            sample = sample.limit(target)
        content = sample.toArrow()["content"].combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(content), TOKEN_SPLIT_RE)
        parents = toks.value_parent_indices()
        vals = toks.flatten()
        keep = pc.greater_equal(pc.utf8_length(vals), MIN_TOKEN_LEN)
        # per-doc distinct then per-term doc counts == the sampled df
        agg = (
            pa.table({"doc": parents.filter(keep), "term": vals.filter(keep)})
            .group_by(["doc", "term"], use_threads=False)
            .aggregate([])
            .group_by(["term"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        cutoff = self.hot_df_threshold * fraction
        counts = agg.column("count_all").to_numpy()
        terms = agg.column("term").to_pylist()
        return [t for t, c in zip(terms, counts) if c > cutoff]

    def _build_fast(self, docs, done, attempt, fail_after_buckets) -> None:
        if ("postings", -1) in done or all(
            ("postings", b) in done for b in range(self.n_buckets)
        ):
            return
        if fail_after_buckets is not None:
            raise BuildAborted("injected failure before fast postings job")
        t0 = time.monotonic()
        if self.partial_encode and self.map_side_tf:
            # partial-encode pipeline: the one exchange carries compressed
            # per-(term, shard) partials; hot set collected driver-side
            # (it is bounded-small by construction — near-ubiquitous terms)
            from search_engine_core_spark.operators.partial_postings import (
                build_postings_from_docs,
            )

            hot_terms = self._hot_terms_sampled_local(docs)
            postings = build_postings_from_docs(
                docs.select("doc_id", "content"),
                hot_terms,
                self.n_shards,
                n_buckets=self.n_buckets,
                n_partitions=self.encode_partitions,
            )
            (
                postings.sortWithinPartitions("bucket")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(f"{self.index_dir}/postings")
            )
            self._log_bucket_lineage(list(range(self.n_buckets)), attempt, t0)
            return
        if self.map_side_tf:
            # per-doc tf computed map-side in Arrow C++ (functions/
            # tokenizer.doc_tf_arrow): no JVM hash agg, and the one shuffle
            # carries distinct (doc, term) rows, not raw token occurrences
            from search_engine_core_spark.functions.tokenizer import doc_tf_arrow

            trip = docs.select("doc_id", "content").mapInArrow(
                doc_tf_arrow, "doc_id long, term string, tf long"
            )
        else:
            # pure-JVM tokenize+explode: no tf column — the encoder counts
            # run lengths after the (term, shard) shuffle (postings.py
            # raw-occurrence path)
            trip = docs.select(
                "doc_id", F.explode(tokenize_expr("content")).alias("term")
            )
        trip = trip.withColumn("bucket", _bucket_expr(self.n_buckets))
        hot = self._hot_terms_sampled(docs)
        postings = build_postings(
            trip,
            hot,
            self.hot_df_threshold,
            self.n_shards,
            bucket_col=True,
            hot_is_term_set=True,
            n_partitions=self.encode_partitions,
        )
        (
            postings.sortWithinPartitions("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(f"{self.index_dir}/postings")
        )
        self._log_bucket_lineage(list(range(self.n_buckets)), attempt, t0)

    def _build_resumable(self, docs, done, attempt, fail_after_buckets) -> None:
        if ("triples", 0) not in done:
            t0 = time.monotonic()
            trip = triples(docs).withColumn("bucket", _bucket_expr(self.n_buckets))
            # sort by the partition column within tasks: the dynamic
            # partition writer then streams ONE open file at a time instead
            # of n_buckets concurrent writers per task
            trip.sortWithinPartitions("bucket").write.mode("overwrite").partitionBy(
                "bucket"
            ).parquet(f"{self.index_dir}/triples")
            self._log("triples", 0, "completed", 0, 0, attempt, t0)

        trip = self.spark.read.parquet(f"{self.index_dir}/triples")
        if ("tripdf", 0) not in done:
            t0 = time.monotonic()
            # build-time df (salting input), bucketed like the triples
            tdf = trip.groupBy("term", "bucket").agg(F.count(F.lit(1)).alias("df"))
            tdf.sortWithinPartitions("bucket").write.mode("overwrite").partitionBy(
                "bucket"
            ).parquet(f"{self.index_dir}/_tripdf")
            self._log("tripdf", 0, "completed", 0, 0, attempt, t0)
        tdf = self.spark.read.parquet(f"{self.index_dir}/_tripdf")

        # Postings buckets are the lineage unit; commit_group buckets share
        # one Spark job (partitionBy write). Granularity tradeoff: small
        # groups = finer crash recovery, more driver-loop overhead; at
        # 10^12-file scale size groups so one job runs ~30-60 min. A group
        # that dies mid-job re-runs whole (its bucket dirs were not yet
        # checkpointed), keeping resume idempotent.
        group = self.commit_group or self.n_buckets
        pending = [b for b in range(self.n_buckets) if ("postings", b) not in done]
        built = 0
        for gi in range(0, len(pending), group):
            batch = pending[gi : gi + group]
            if fail_after_buckets is not None and built >= fail_after_buckets:
                raise BuildAborted(f"injected failure after {built} buckets")
            t0 = time.monotonic()
            batch_trip = trip.filter(F.col("bucket").isin(batch)).select(
                "doc_id", "term", "tf", "bucket"
            )
            batch_df = tdf.filter(F.col("bucket").isin(batch)).select("term", "df")
            postings = build_postings(
                batch_trip, batch_df, self.hot_df_threshold, self.n_shards, bucket_col=True
            )
            # dynamic overwrite: only the batch's bucket dirs are replaced;
            # sorted by bucket so each task streams one writer at a time
            (
                postings.sortWithinPartitions("bucket")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(f"{self.index_dir}/postings")
            )
            self._log_bucket_lineage(batch, attempt, t0)
            built += len(batch)

    # -- delete ------------------------------------------------------------
    def delete(self, predicate) -> int:
        """Row-level delete (P11): remove every doc matching ``predicate``
        (a Column, e.g. ``F.col('repo') == 'org1/project-1'``) from docs,
        stats and postings — the Spark twin of
        ``RedisSearchStorage::deleteDocumentsByDomain``
        (``src/storage/RedisSearchStorage.cpp:594-648``: FT.SEARCH the
        domain, DEL each doc hash). Returns the number of docs removed.

        Mechanism: filtered rewrite. Postings are decoded, anti-joined
        against the doomed doc set, re-encoded and swapped in whole (a
        doc's terms span every bucket, so doc-level delete touches all of
        them; at Iceberg scale the swap is an atomic REPLACE commit). A
        lineage row records the delete so resume semantics stay intact.
        """
        import shutil

        attempt = self._next_attempt()
        t0 = time.monotonic()
        docs = self.spark.read.parquet(f"{self.index_dir}/docs")
        # materialize the doomed set NOW: its lineage points at the docs
        # dir we are about to swap out from under it
        doomed = docs.filter(predicate).select("doc_id").localCheckpoint(eager=True)
        n_doomed = doomed.count()
        if n_doomed == 0:
            return 0
        kept_docs = docs.join(doomed, "doc_id", "left_anti")
        tmp_docs = f"{self.index_dir}/docs_del_tmp"
        kept_docs.write.mode("overwrite").parquet(tmp_docs)
        shutil.rmtree(f"{self.index_dir}/docs")
        shutil.move(tmp_docs, f"{self.index_dir}/docs")

        docs = self.spark.read.parquet(f"{self.index_dir}/docs")
        docs.agg(
            F.count(F.lit(1)).alias("n_docs"), F.avg("doclen").alias("avgdl")
        ).write.mode("overwrite").parquet(f"{self.index_dir}/stats")
        self._n_docs = int(
            self.spark.read.parquet(f"{self.index_dir}/stats").collect()[0]["n_docs"]
        )

        from search_engine_core_spark.operators.postings import decode_postings_df

        post = self.spark.read.option("basePath", f"{self.index_dir}/postings").parquet(
            f"{self.index_dir}/postings"
        )
        kept = decode_postings_df(post).join(doomed, "doc_id", "left_anti").withColumn(
            "bucket", _bucket_expr(self.n_buckets)
        )
        dfreq = kept.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        postings = build_postings(
            kept, dfreq, self.hot_df_threshold, self.n_shards, bucket_col=True
        )
        tmp_post = f"{self.index_dir}/postings_del_tmp"
        (
            postings.sortWithinPartitions("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(tmp_post)
        )
        shutil.rmtree(f"{self.index_dir}/postings")
        shutil.move(tmp_post, f"{self.index_dir}/postings")

        import pathlib

        if pathlib.Path(f"{self.index_dir}/dfreq").exists():
            newpost = self.spark.read.option(
                "basePath", f"{self.index_dir}/postings"
            ).parquet(f"{self.index_dir}/postings")
            nd = newpost.groupBy("term", "bucket").agg(F.sum("df").alias("df"))
            tmp_dfreq = f"{self.index_dir}/dfreq_del_tmp"
            nd.sortWithinPartitions("bucket").write.mode("overwrite").partitionBy(
                "bucket"
            ).parquet(tmp_dfreq)
            shutil.rmtree(f"{self.index_dir}/dfreq")
            shutil.move(tmp_dfreq, f"{self.index_dir}/dfreq")

        # positional sidecar (if built): doomed docs' positions must go
        # too, or a phrase-only query would resurrect them as score-0 hits
        # (slim-index phrase candidates come from positions alone)
        if pathlib.Path(f"{self.index_dir}/positions").exists():
            old_pos = self.spark.read.option(
                "basePath", f"{self.index_dir}/positions"
            ).parquet(f"{self.index_dir}/positions")
            tmp_pos = f"{self.index_dir}/positions_del_tmp"
            (
                old_pos.join(doomed, "doc_id", "left_anti")
                .repartition("bucket")
                .sortWithinPartitions("bucket", "term", "doc_id")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(tmp_pos)
            )
            shutil.rmtree(f"{self.index_dir}/positions")
            shutil.move(tmp_pos, f"{self.index_dir}/positions")

        self._log("delete", 0, "completed", n_doomed, 0, attempt, t0)
        return n_doomed

    def _log_bucket_lineage(self, buckets: list[int], attempt: int, t0: float) -> None:
        """Per-bucket lineage rows from one metadata-only scan of the just
        written postings (parquet prunes to bucket/term/df columns)."""
        import pathlib

        dur_ms = int(self._mark("postings", t0) * 1000)
        paths = [
            p
            for b in buckets
            if (p := f"{self.index_dir}/postings/bucket={b}")
            and pathlib.Path(p).exists()  # empty buckets write no dir
        ]
        by_bucket = {}
        if paths:
            stats_rows = (
                self.spark.read.option("basePath", f"{self.index_dir}/postings")
                .parquet(*paths)
                .groupBy("bucket")
                .agg(
                    F.count_distinct(F.col("term")).alias("n_terms"),
                    F.sum("df").alias("n_postings"),
                )
                .collect()
            )
            by_bucket = {int(r["bucket"]): r for r in stats_rows}
        # ONE lineage write for the whole batch of buckets
        self._log_many(
            [
                (
                    "postings",
                    b,
                    "completed",
                    int(by_bucket[b]["n_postings"]) if b in by_bucket else 0,
                    int(by_bucket[b]["n_terms"]) if b in by_bucket else 0,
                    attempt,
                    dur_ms,
                )
                for b in buckets
            ]
        )


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
        # driver-resident term dictionary (lazy): None = not yet loaded,
        # False = too big for the driver (size guard tripped)
        self._term_dict: dict[str, tuple[int, int]] | None | bool = None

    # every real engine holds the term dictionary in RAM (the reference's
    # RediSearch keeps it entirely in memory); at 10^12-file scale the
    # vocabulary may not fit a driver, so the load is guarded — above the
    # cap, callers fall back to a per-query pruned metadata scan.
    TERM_DICT_CAP = 4_000_000

    def term_meta(self, terms: list[str]) -> dict[str, tuple[int, int]] | None:
        """term -> (df, max_tf) aggregated over shards, from the
        driver-resident dictionary; None when the dictionary exceeds
        TERM_DICT_CAP (caller must scan per-query). Loaded once per
        reader — like the cached ``stats`` row, it reflects the index at
        load time; recreate the reader after a delete()/rebuild."""
        if self._term_dict is None:
            tbl = (
                self.postings.groupBy("term")
                .agg(F.sum("df").alias("df"), F.max("max_tf").alias("max_tf"))
                .limit(self.TERM_DICT_CAP + 1)
                .toArrow()
            )
            if tbl.num_rows > self.TERM_DICT_CAP:
                self._term_dict = False
            else:
                self._term_dict = {
                    t: (int(d), int(m))
                    for t, d, m in zip(
                        tbl["term"].to_pylist(),
                        tbl["df"].to_pylist(),
                        tbl["max_tf"].to_pylist(),
                    )
                }
        if self._term_dict is False:
            return None
        return {t: self._term_dict[t] for t in terms if t in self._term_dict}

    # Lucene keeps per-doc norms (doclen) resident per segment; the Spark
    # analog caches the (doc_id, doclen) arrays once per reader so query-
    # time BM25 needs no per-query docs-table join. 8M docs = ~128 MB;
    # above the guard, callers fall back to the join.
    NORMS_CAP = 8_000_000

    def norms(self):
        """(sorted doc_id int64 array, aligned doclen float64 array), or
        None when n_docs exceeds NORMS_CAP. One job on first call."""
        if getattr(self, "_norms", None) is None:
            if self.stats.n_docs > self.NORMS_CAP:
                self._norms = False
            else:
                import numpy as np

                tbl = self.docs.select("doc_id", "doclen").toArrow()
                ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                dls = tbl["doclen"].to_numpy(zero_copy_only=False).astype(np.float64)
                order = np.argsort(ids)
                self._norms = (ids[order], dls[order])
        return None if self._norms is False else self._norms

    def attach_content(self, corpus: DataFrame) -> None:
        """Slim-index complement (store_content=False builds): re-attach
        the content column by joining the source table on the
        deterministically derived doc_id. Content-dependent query paths
        (snippets, exact-phrase verify) then work unchanged; the join is
        a doc_id equijoin the optimizer can co-partition with the index."""
        from search_engine_core_spark.corpus import with_doc_columns

        if "content" in self.docs.columns:
            return
        src = with_doc_columns(corpus) if "doc_id" not in corpus.columns else corpus
        self.docs = self.docs.join(
            src.select("doc_id", "content"), "doc_id", "left"
        )

    def postings_for_terms(self, terms: list[str]) -> DataFrame:
        """Partition-pruned postings scan: bucket isin + term isin both push
        into the parquet source (verify via .explain: PartitionFilters /
        PushedFilters)."""
        from search_engine_core_spark.functions.xxhash import term_bucket

        # bucket computed driver-side with the pure-Python xxh64 twin of
        # Spark's xxhash64 — no Spark job just to plan the scan
        buckets = sorted({term_bucket(t, self.n_buckets) for t in terms})
        return self.postings.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )

    def has_positions(self) -> bool:
        """True when the opt-in positional sidecar was built
        (``IndexBuilder(store_positions=True)``)."""
        import os

        return os.path.isdir(f"{self.index_dir}/positions")

    def positions_for_terms(self, terms: list[str]) -> DataFrame:
        """Bucket-pruned positional-postings scan — same pruning discipline
        as :meth:`postings_for_terms`."""
        from search_engine_core_spark.functions.xxhash import term_bucket

        if getattr(self, "_positions", None) is None:
            self._positions = self.spark.read.option(
                "basePath", f"{self.index_dir}/positions"
            ).parquet(f"{self.index_dir}/positions")
        buckets = sorted({term_bucket(t, self.n_buckets) for t in terms})
        return self._positions.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
