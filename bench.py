"""Benchmark harness (driver contract): ONE JSON line on stdout.

Measures the north-rule metrics at $SPARK_GRAFT_SF_DIR scale:
  * index-build throughput (docs/sec): the input_hint corpus is
    pre-materialized to parquet UNTIMED (a real deployment reads an
    existing Iceberg table; the synthetic generator is harness, not
    engine), then the full tokenize -> salted shuffle -> compressed
    postings -> checkpointed write build is timed. MIN OF 2 full builds
    (r3: a one-shot sample cost a round of signal to box noise);
  * top-k query latency over the materialized index (naive + WAND paths),
    each leg min-of-2;
  * LSM freshness: micro-batch ingest -> first correct delta-path query,
    plus the delta-vs-compacted query-latency A/B;
  * representative driver-table queries (BM25 over documents, cosine
    top-k over embeddings, lineitem rollup).

Output: {"metric": "suite_wall_sec", "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": <sf>, "index_build_docs_per_sec": N,
         "query_p95_ms": N, "cores": N, "runs": 2, "loadavg_1m": N}
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
from search_engine_core_spark.engine import IndexSearchEngine  # noqa: E402
from search_engine_core_spark.session import get_spark  # noqa: E402
from search_engine_core_spark.sources.index_io import IndexBuilder  # noqa: E402

QUERY_SET = [
    "spark merge",
    "spark OR merge OR token",
    "config query parse",
    "return",
    "ident_1_1 OR spark",
    "lang:python spark table",
    '"spark table" merge',
    "filter AND sort AND hash",
]
N_RUNS = 2  # min-of-N for build + query legs


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    n_docs = max(2000, int(200_000 * sf))
    loadavg = os.getloadavg()[0]

    spark = get_spark("bench", cores=cores, shuffle_partitions=max(cores, 16))
    timings: dict[str, float] = {}
    t_suite = time.monotonic()

    work = tempfile.mkdtemp(prefix="bench_", dir="/dev/shm")
    # corpus materialization is harness setup, not engine work — untimed
    synthesize_corpus(spark, n_docs=n_docs, tokens_per_doc=200).write.mode(
        "overwrite"
    ).parquet(f"{work}/corpus")
    corpus = spark.read.parquet(f"{work}/corpus")

    build_secs = []
    for r in range(N_RUNS):
        d = f"{work}/index_r{r}"
        build_secs.append(
            _timed(
                lambda: IndexBuilder(
                    spark,
                    d,
                    n_buckets=8,
                    hot_df_threshold=max(1000, n_docs // 10),
                    n_shards=cores,
                ).build(corpus)
            )
        )
    build_sec = min(build_secs)
    timings["index_build"] = round(build_sec, 3)
    docs_per_sec = n_docs / build_sec
    index_dir = f"{work}/index_r{build_secs.index(build_sec)}"
    for r in range(N_RUNS):
        if f"{work}/index_r{r}" != index_dir:
            shutil.rmtree(f"{work}/index_r{r}", ignore_errors=True)

    # -- query latency over the materialized index ------------------------
    eng = IndexSearchEngine(spark, index_dir, n_buckets=8)
    lat_ms: list[float] = []
    for i, q in enumerate(QUERY_SET):
        dt = min(_timed(lambda: eng.search(q, 10).collect()) for _ in range(N_RUNS))
        timings[f"search_{i}"] = round(dt, 3)
        lat_ms.append(dt * 1000)
    for i, q in enumerate(["spark OR merge OR token", "filter AND sort AND hash"]):
        dt = min(_timed(lambda: eng.search_wand(q, 10).collect()) for _ in range(N_RUNS))
        timings[f"wand_{i}"] = round(dt, 3)
        lat_ms.append(dt * 1000)
    lat_sorted = sorted(lat_ms)
    p95 = lat_sorted[min(len(lat_sorted) - 1, int(0.95 * len(lat_sorted)))]
    # batched evaluation (r5, operators/batch_query): ALL 8 queries in ONE
    # plan — one union-term postings decode + one vectorized scoring pass
    # for the plain shapes. Compare with sum(search_0..7): the delta is
    # N-1 scheduling round-trips, the per-query floor a query tier pays
    # when it answers a replay log one query at a time.
    dt = min(
        _timed(lambda: eng.search_many(QUERY_SET, 10).collect())
        for _ in range(N_RUNS)
    )
    timings["query_batch8"] = round(dt, 3)
    # cached-response layer (reference parity: Redis result cache, 2 ms
    # cached vs 150 ms uncached) — cold fill untimed, then warm hits
    eng.search_cached("spark merge", 10).collect()
    dt = min(
        _timed(lambda: eng.search_cached("spark merge", 10).collect())
        for _ in range(N_RUNS)
    )
    timings["query_cached"] = round(dt, 3)

    # -- LSM: ingest-to-searchable freshness + compaction A/B -------------
    from search_engine_core_spark.streaming.incremental import (
        DeltaSearchEngine,
        compact_deltas,
        minor_compact,
        start_incremental_index,
    )

    inbox = f"{work}/inbox"
    os.makedirs(inbox, exist_ok=True)
    # producer side (untimed): a micro-batch re-crawling 1% of the corpus
    n_delta = max(200, n_docs // 100)
    synthesize_corpus(spark, n_docs=n_delta, tokens_per_doc=200).write.mode(
        "overwrite"
    ).parquet(inbox)

    def ingest_and_query():
        q = start_incremental_index(
            spark, inbox, index_dir, f"{work}/ckpt", trigger_available_now=True
        )
        q.awaitTermination()
        DeltaSearchEngine(spark, index_dir, n_buckets=8).search(
            "spark merge", 10
        ).collect()

    # freshness = micro-batch commit -> first correct query over
    # [main ⊎ delta] (single-shot: the ingest is not idempotent-timed)
    timings["lsm_freshness"] = round(_timed(ingest_and_query), 3)
    deng = DeltaSearchEngine(spark, index_dir, n_buckets=8)
    dt = min(
        _timed(lambda: deng.search("spark merge", 10).collect()) for _ in range(N_RUNS)
    )
    # search() routes WAND-eligible shapes through block-max WAND over
    # the LSM view (r5); the _planner line is the general decode-
    # everything path the same query used before — the A/B is the
    # fast-path win at this corpus size
    timings["lsm_query_delta"] = round(dt, 3)

    def _planner_query(eng):
        from search_engine_core_spark.plans.planner import scoring_terms
        from search_engine_core_spark.plans.query_parser import QueryParser

        ast = QueryParser().parse("spark merge")
        return eng._search_planner(ast, scoring_terms(ast), 10, "bm25").collect()

    dt = min(_timed(lambda: _planner_query(deng)) for _ in range(N_RUNS))
    timings["lsm_query_delta_planner"] = round(dt, 3)
    # minor compaction: fold level-0 into an immutable compressed segment —
    # cost scales with the DELTA (n_delta docs), never the main index
    # (r5; compare with lsm_compact, the full-rewrite major path below)
    timings["lsm_compact_minor"] = round(
        _timed(
            lambda: minor_compact(
                spark,
                index_dir,
                n_buckets=8,
                hot_df_threshold=max(1000, n_docs // 10),
                n_shards=cores,
            )
        ),
        3,
    )
    seng = DeltaSearchEngine(spark, index_dir, n_buckets=8)
    dt = min(
        _timed(lambda: seng.search("spark merge", 10).collect()) for _ in range(N_RUNS)
    )
    timings["lsm_query_segment"] = round(dt, 3)
    dt = min(_timed(lambda: _planner_query(seng)) for _ in range(N_RUNS))
    timings["lsm_query_segment_planner"] = round(dt, 3)
    # second delta generation -> segment 1 (untimed producer + fold),
    # then the size-tiered middle layer folds [0, 1] into one segment:
    # cost ~ the two deltas' size, never the main index (compare
    # lsm_compact below, the full-rewrite major path)
    from search_engine_core_spark.streaming.incremental import merge_segments

    inbox2 = f"{work}/inbox2"
    synthesize_corpus(spark, n_docs=n_delta, tokens_per_doc=200).write.mode(
        "overwrite"
    ).parquet(inbox2)
    q2 = start_incremental_index(
        spark, inbox2, index_dir, f"{work}/ckpt2", trigger_available_now=True
    )
    q2.awaitTermination()
    minor_compact(
        spark, index_dir, n_buckets=8,
        hot_df_threshold=max(1000, n_docs // 10), n_shards=cores,
    )
    # retain=True only swaps the run's tree DELETE for a rename into
    # _retired/ (and the forced prune-off is a no-op here — no segments
    # exist above the run), so the timed merge cost is unchanged in kind;
    # it is what makes the snapshot-restore line below possible
    timings["lsm_merge_segments"] = round(
        _timed(
            lambda: merge_segments(
                spark,
                index_dir,
                [0, 1],
                n_buckets=8,
                hot_df_threshold=max(1000, n_docs // 10),
                n_shards=cores,
                retain=True,
            )
        ),
        3,
    )
    meng = DeltaSearchEngine(spark, index_dir, n_buckets=8)
    dt = min(
        _timed(lambda: meng.search("spark merge", 10).collect()) for _ in range(N_RUNS)
    )
    timings["lsm_query_merged"] = round(dt, 3)
    # snapshot time travel (r5): restore "the index as of commit 0" —
    # post-merge that cover comes from the retired pre-merge tree — and
    # query it. The restore is metadata-only (hardlinks, zero Spark
    # jobs), so its cost should sit orders of magnitude under any
    # compaction line regardless of index size; the query line shows the
    # restored dir is a first-class index, not a degraded replica.
    from search_engine_core_spark.streaming.snapshots import restore_snapshot

    snap_out = f"{work}/snap0"
    timings["lsm_snapshot_restore"] = round(
        _timed(lambda: restore_snapshot(index_dir, 0, snap_out)), 3
    )
    reng = DeltaSearchEngine(spark, snap_out, n_buckets=8)
    dt = min(
        _timed(lambda: reng.search("spark merge", 10).collect()) for _ in range(N_RUNS)
    )
    timings["lsm_query_restored"] = round(dt, 3)
    timings["lsm_compact"] = round(
        _timed(
            lambda: compact_deltas(
                spark,
                index_dir,
                n_buckets=8,
                hot_df_threshold=max(1000, n_docs // 10),
                n_shards=cores,
            )
        ),
        3,
    )
    ceng = IndexSearchEngine(spark, index_dir, n_buckets=8)
    dt = min(
        _timed(lambda: ceng.search("spark merge", 10).collect()) for _ in range(N_RUNS)
    )
    timings["lsm_query_compacted"] = round(dt, 3)

    # -- embedding index: build + streaming re-embed freshness -------------
    from search_engine_core_spark.sources.embedding_index import (
        EmbeddingIndex,
        EmbeddingIndexBuilder,
    )
    from search_engine_core_spark.streaming.embeddings import (
        start_incremental_embeddings,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb_idx = f"{work}/emb_idx"
    timings["emb_index_build"] = round(
        _timed(lambda: EmbeddingIndexBuilder(spark, emb_idx, n_bits=6).build(emb)), 3
    )
    # streaming re-embed of ~5% of the corpus (deterministic: negated
    # vectors — guaranteed bucket moves); freshness = micro-batch commit
    # -> first probe seeing the fresh assignments (partition-local upsert,
    # cost ~ touched leaves, never the index)
    einbox, eckpt = f"{work}/emb_inbox", f"{work}/emb_ckpt"
    n_emb = emb.count()
    emb.orderBy("vec_id").limit(max(50, n_emb // 20)).select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
    ).coalesce(1).write.mode("overwrite").parquet(einbox)
    qvec_bench = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]

    def _emb_refresh():
        qq = start_incremental_embeddings(spark, einbox, emb_idx, eckpt)
        qq.awaitTermination()
        EmbeddingIndex(spark, emb_idx).ann_topk(qvec_bench, 10, n_probe=4).collect()

    timings["emb_freshness"] = round(_timed(_emb_refresh), 3)

    # -- driver-table queries ---------------------------------------------
    from search_engine_core_spark.entry_queries import _engine, build_queries

    # warm the per-sf in-memory engine caches once and report it as its
    # own line: cache materialization is index-open cost (the twin of the
    # IndexBuilder step the search_/wand legs already got), not the
    # per-query latency q01 is meant to measure
    t0 = time.monotonic()
    eng01 = _engine(spark, sf_dir)
    for df in (eng01.docs, eng01.trip, eng01.dfreq):
        df.count()
    timings["engine_open"] = round(time.monotonic() - t0, 3)

    # r5: q01-q06 answer from the materialized index — surface the driver
    # index open (build on a cold cache, else reader warmup) as its own
    # line so q01's min-of-2 below measures warm per-query latency
    from search_engine_core_spark.entry_queries import _index_engine

    timings["driver_index_open"] = round(
        _timed(lambda: _index_engine(spark, sf_dir)), 3
    )

    qs = build_queries()
    # q27 = hybrid RRF (lexical index probe + cosine top-30 + O(k) fuse);
    # its delta over q01+q26 is the fusion overhead, which should be noise
    for name in ["q01_bm25_or_topk", "q26_cosine_bruteforce_topk",
                 "q27_hybrid_rrf_topk", "q33_lineitem_rollup"]:
        dt = min(
            _timed(lambda: qs[name](spark, sf_dir).collect()) for _ in range(N_RUNS)
        )
        timings[name] = round(dt, 3)

    # -- dedup resolution: LSH pairs -> connected components -> corpus ----
    # the full "actually deduplicate" pipeline (r5): candidate pairs over
    # the whole documents table, min-label components, one survivor per
    # cluster. Rounds = cluster diameter (≤ 2 by max_bucket construction),
    # so the cost is a handful of join+groupBy rounds over the PAIR set.
    from search_engine_core_spark.operators.components import canonical_docs
    from search_engine_core_spark.operators.dedup import minhash_lsh_pairs

    docs_tbl = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def _dedup_cc():
        pairs = minhash_lsh_pairs(docs_tbl, n_perm=8, max_bucket=64)
        canonical_docs(docs_tbl, pairs).count()

    timings["dedup_cc"] = round(_timed(_dedup_cc), 3)

    # same pipeline through the alternating-star resolver (the
    # long-diameter escape hatch) — same survivors by construction,
    # costlier rounds, bounded round COUNT
    def _dedup_cc_star():
        pairs = minhash_lsh_pairs(docs_tbl, n_perm=8, max_bucket=64)
        canonical_docs(docs_tbl, pairs, algorithm="star").count()

    timings["dedup_cc_star"] = round(_timed(_dedup_cc_star), 3)

    # -- corpus curation stage: C4 clean -> span dedup -> Gopher -> PII --
    # everything except the span shuffle is a map-side column expression,
    # so this line prices ONE corpus-level shuffle plus three fused scans.
    from search_engine_core_spark.operators.curation import curate

    # the synthetic corpus has no sentence punctuation, so the C4 rules
    # would trivially empty it — synthesize a period every 8 words (pure
    # column expr, priced with the pipeline) and loosen the stopword gate
    # (the synthetic vocab carries only "the" from the required set).
    # repartition first: the sf table is ONE parquet row-group (one input
    # split -> one task for the whole otherwise-map-side pipeline); at
    # real scale the scan has thousands of splits, so model that here.
    def _sentenced():
        return docs_tbl.repartition(cores).withColumn(
            "text",
            F.concat(
                F.regexp_replace("text", r"((?:\w+ ){7}\w+) ", "$1. "), F.lit(".")
            ),
        )

    _curation_opts = dict(
        c4_opts={"min_sentences": 1},
        gopher_opts={"min_words": 10, "min_required_stopwords": 1},
    )

    def _curation():
        curate(_sentenced(), "text", "doc_id", **_curation_opts).count()

    timings["curation_c4_gopher_pii"] = round(_timed(_curation), 3)

    # the audit shape: per-doc per-rule attribution report folded to the
    # one-row funnel — keeps every input doc (no stage drops), one action.
    from search_engine_core_spark.operators.curation import (
        curation_funnel,
        curation_report,
    )

    def _curation_funnel():
        rep = curation_report(_sentenced(), "text", "doc_id", **_curation_opts)
        curation_funnel(rep).collect()

    timings["curation_report_funnel"] = round(_timed(_curation_funnel), 3)

    # CCNet perplexity gate (r5): train the add-k bigram LM on the corpus
    # and keep the lowest-perplexity 2/3 — prices tokenize + two
    # map-side-combinable count aggs + the scoring join + the quantile
    # pass (approx: the 100 TB shape; curate() inside the pipeline uses
    # the exact percentile for report identity). broadcast_lm=True is
    # the bounded-LM plan (occurrence scoring against a broadcast LM —
    # CCNet's own shape is a bounded reference-corpus LM): measured
    # 1.7-2.4× over the collapsed default with scaling efficiency 0.70
    # vs 0.50 (operators/lm.py docstring); the collapsed default remains
    # the unbounded-corpus fallback.
    from search_engine_core_spark.operators.lm import perplexity_filter

    def _ppl_gate():
        perplexity_filter(
            docs_tbl.repartition(cores), "text", "doc_id", keep_frac=2 / 3,
            broadcast_lm=True,
        ).count()

    timings["ccnet_perplexity_filter"] = round(_timed(_ppl_gate), 3)

    # BPE tokenizer train + encode (r5): one distributed word-count pass,
    # the driver merge loop over the bounded type table (the HF shape),
    # then the Arrow-batched encode of the whole corpus under the trained
    # vocabulary — prices what a real pipeline runs before any token
    # budget (pack_sequences) means anything.
    from search_engine_core_spark.operators.bpe import bpe_token_count, train_bpe

    def _bpe():
        model = train_bpe(docs_tbl, n_merges=200)
        docs_tbl.select(
            F.sum(bpe_token_count(model, "text")).alias("n")
        ).collect()

    timings["bpe_train_encode"] = round(_timed(_bpe), 3)

    # windowed-hash ExactSubstr: prices the token-level explode (one row
    # per window) + groupBy + loser join. window=20 because the synthetic
    # docs run ~45 words; the paper's 50 would yield zero windows here.
    from search_engine_core_spark.operators.spans import dedup_token_windows

    def _token_dedup():
        dedup_token_windows(
            docs_tbl.repartition(cores), "text", "doc_id", window=20
        ).count()

    timings["dedup_token_windows"] = round(_timed(_token_dedup), 3)

    # -- code-corpus curation: StarCoder gates + secret redaction --------
    # runs on the input_hint corpus itself (repo/path/commit/lang/content)
    # — ONE map-side scan of the code table: the default Arrow-batched
    # signal struct (14x the interpreted-expression twin, BENCH A/B) +
    # JVM-side secret redaction; doc_id via xxhash64(natural key).
    from search_engine_core_spark.corpus import with_doc_columns
    from search_engine_core_spark.operators.curation import curate_code

    def _code_curation():
        # the synthetic corpus has no comment lines, so the comment-ratio
        # floor would trivially empty it — disable that one gate (same
        # policy as the web-text line loosening C4/Gopher above); every
        # other gate evaluates its full expression per row.
        curate_code(
            with_doc_columns(corpus).select("doc_id", "lang", "content"),
            "content",
            "doc_id",
            "lang",
            code_opts={"min_comment_frac": None},
        ).count()

    timings["curate_code_filter"] = round(_timed(_code_curation), 3)

    total = time.monotonic() - t_suite
    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "suite_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_docs_indexed": n_docs,
                "index_build_docs_per_sec": round(docs_per_sec, 1),
                "query_p95_ms": round(p95, 1),
                "cores": cores,
                "runs": N_RUNS,
                "loadavg_1m": round(loadavg, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
