"""Round-6 isolation benchmarks (guide §1.4): noop-sink timings for the
stages the frozen ``bench.py`` prices only in aggregate, so before/after
claims in OPTIMIZATION_r06.md are reproducible line by line.

``bench.py`` is FROZEN for driver measurement — this file is the
overflow: per-stage isolation of the dedup_cc pipeline (signature /
pairs / components), the curation stages (c4 / spans / gopher), the
LSM maintenance ops at delta size, and the per-query engine legs.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py
Prints one JSON line: {"stages": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from search_engine_core_spark.corpus import synthesize_corpus  # noqa: E402
from search_engine_core_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    spark = get_spark("bench_extra", cores=cores, shuffle_partitions=max(cores, 16))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out: dict[str, float] = {}

    def t(name, fn, n=2):
        best = None
        for _ in range(n):
            spark.sparkContext.setJobDescription(name)
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"# {name}: {best:.2f}s", file=sys.stderr, flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # ---- dedup_cc decomposition ----------------------------------------
    from search_engine_core_spark.operators.components import (
        canonical_docs,
        connected_components,
    )
    from search_engine_core_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signature,
        simhash,
    )

    t("minhash_signature", lambda: noop(minhash_signature(docs, n_perm=8)))
    t("minhash_lsh_pairs", lambda: noop(minhash_lsh_pairs(docs, n_perm=8, max_bucket=64)))
    pairs_ck = minhash_lsh_pairs(docs, n_perm=8, max_bucket=64).localCheckpoint(eager=True)
    t("components_label", lambda: connected_components(pairs_ck).count())
    t("components_star", lambda: __import__(
        "search_engine_core_spark.operators.components", fromlist=["x"]
    ).connected_components_star(pairs_ck).count())
    t("canonical_docs_e2e", lambda: canonical_docs(
        docs, minhash_lsh_pairs(docs, n_perm=8, max_bucket=64)
    ).count(), n=1)
    t("simhash64", lambda: noop(simhash(docs, bits=64)))

    # ---- curation stage isolation --------------------------------------
    from search_engine_core_spark.functions.c4 import c4_filter
    from search_engine_core_spark.functions.gopher import gopher_filter
    from search_engine_core_spark.operators.spans import dedup_three_sentence_spans

    def sentenced():
        return docs.repartition(cores).withColumn(
            "text",
            F.concat(F.regexp_replace("text", r"((?:\w+ ){7}\w+) ", "$1. "), F.lit(".")),
        )

    t("c4_filter", lambda: noop(c4_filter(sentenced(), "text", min_sentences=1)))
    t("c4_spans", lambda: noop(dedup_three_sentence_spans(
        c4_filter(sentenced(), "text", min_sentences=1), "text", "doc_id")))
    t("gopher_filter", lambda: noop(gopher_filter(
        sentenced(), "text", min_words=10, min_required_stopwords=1)))

    # ---- r6: build-pipeline isolation (noop sinks, guide §1.4) ---------
    # the partial-encode A/B the round's headline claims rest on:
    # tokenize-only, the old triple-shuffle encode, the new partial-
    # encode pipeline — all over the same synthesized corpus
    from search_engine_core_spark.corpus import with_doc_columns
    from search_engine_core_spark.functions.tokenizer import doc_tf_arrow
    from search_engine_core_spark.operators.partial_postings import (
        build_postings_from_docs,
    )
    from search_engine_core_spark.operators.postings import build_postings
    from search_engine_core_spark.sources.index_io import IndexBuilder, _bucket_expr

    n_docs_b = max(2000, int(200_000 * sf))
    workb = tempfile.mkdtemp(prefix="bench_extra_b_", dir="/dev/shm")
    try:
        synthesize_corpus(spark, n_docs=n_docs_b, tokens_per_doc=200).write.mode(
            "overwrite"
        ).parquet(f"{workb}/corpus")
        docs_b = with_doc_columns(spark.read.parquet(f"{workb}/corpus")).select(
            "doc_id", "content"
        )
        docs_b.write.mode("overwrite").parquet(f"{workb}/docs")
        docs_b = spark.read.parquet(f"{workb}/docs")
        bb = IndexBuilder(
            spark, f"{workb}/never", n_buckets=8,
            hot_df_threshold=max(1000, n_docs_b // 10), n_shards=cores,
        )
        hot_terms = bb._hot_terms_sampled_local(docs_b)
        trip_b = docs_b.mapInArrow(
            doc_tf_arrow, "doc_id long, term string, tf long"
        ).withColumn("bucket", _bucket_expr(8))
        t("build_tokenize_tf_noop", lambda: noop(trip_b))
        hot_df = spark.createDataFrame([(x,) for x in hot_terms] or [("__none__",)],
                                       "term string")
        old_post = build_postings(
            trip_b, hot_df, max(1000, n_docs_b // 10), cores,
            bucket_col=True, hot_is_term_set=True,
        )
        t("build_postings_triple_noop", lambda: noop(old_post))
        new_post = build_postings_from_docs(
            docs_b, hot_terms, cores, n_buckets=8
        )
        t("build_postings_partial_noop", lambda: noop(new_post))
    finally:
        shutil.rmtree(workb, ignore_errors=True)

    # ---- LSM maintenance at delta size ---------------------------------
    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.streaming.incremental import (
        merge_segments,
        minor_compact,
        start_incremental_index,
    )

    n_docs = max(2000, int(200_000 * sf))
    work = tempfile.mkdtemp(prefix="bench_extra_", dir="/dev/shm")
    try:
        synthesize_corpus(spark, n_docs=n_docs, tokens_per_doc=200).write.mode(
            "overwrite"
        ).parquet(f"{work}/corpus")
        corpus = spark.read.parquet(f"{work}/corpus")
        idx = f"{work}/index"
        b = IndexBuilder(
            spark, idx, n_buckets=8,
            hot_df_threshold=max(1000, n_docs // 10), n_shards=cores,
        )
        t("index_build", lambda: b.build(corpus), n=1)
        out.update({f"build_stage_{k}": round(v, 3) for k, v in b.stage_secs.items()})
        n_delta = max(200, n_docs // 100)
        for i in (1, 2):
            synthesize_corpus(spark, n_docs=n_delta, tokens_per_doc=200).write.mode(
                "overwrite"
            ).parquet(f"{work}/inbox{i}")
            q = start_incremental_index(
                spark, f"{work}/inbox{i}", idx, f"{work}/ckpt{i}",
                trigger_available_now=True,
            )
            q.awaitTermination()
            t(f"minor_compact_{i}", lambda: minor_compact(
                spark, idx, n_buckets=8,
                hot_df_threshold=max(1000, n_docs // 10), n_shards=cores,
            ), n=1)
        t("merge_segments", lambda: merge_segments(
            spark, idx, [0, 1], n_buckets=8,
            hot_df_threshold=max(1000, n_docs // 10), n_shards=cores,
        ), n=1)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({"metric": "stage_secs", "stages": out, "sf": sf,
                      "cores": cores, "loadavg_1m": round(os.getloadavg()[0], 2)}))


if __name__ == "__main__":
    main()
