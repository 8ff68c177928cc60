"""Benchmark harness (driver contract): ONE JSON line on stdout.

Measures the north-rule metrics at $SPARK_GRAFT_SF_DIR scale:
  * index-build throughput (docs/sec): the input_hint corpus is
    pre-materialized to parquet UNTIMED (a real deployment reads an
    existing Iceberg table; the synthetic generator is harness, not
    engine), then the full tokenize -> salted shuffle -> compressed
    postings -> checkpointed write build is timed;
  * top-k query latency over the materialized index (naive + WAND paths);
  * representative driver-table queries (BM25 over documents, cosine
    top-k over embeddings, lineitem rollup).

Output: {"metric": "suite_wall_sec", "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": <sf>, "index_build_docs_per_sec": N,
         "query_p95_ms": N, "cores": N}
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    n_docs = max(2000, int(200_000 * sf))

    spark = get_spark("bench", cores=cores, shuffle_partitions=max(cores, 16))
    timings: dict[str, float] = {}
    t_suite = time.monotonic()

    work = tempfile.mkdtemp(prefix="bench_", dir="/dev/shm")
    # corpus materialization is harness setup, not engine work — untimed
    synthesize_corpus(spark, n_docs=n_docs, tokens_per_doc=200).write.mode(
        "overwrite"
    ).parquet(f"{work}/corpus")
    corpus = spark.read.parquet(f"{work}/corpus")

    t0 = time.monotonic()
    IndexBuilder(
        spark,
        f"{work}/index",
        n_buckets=8,
        hot_df_threshold=max(1000, n_docs // 10),
        n_shards=cores,
    ).build(corpus)
    build_sec = time.monotonic() - t0
    timings["index_build"] = round(build_sec, 3)
    docs_per_sec = n_docs / build_sec

    # -- query latency over the materialized index ------------------------
    eng = IndexSearchEngine(spark, f"{work}/index", n_buckets=8)
    lat_ms: list[float] = []
    for i, q in enumerate(QUERY_SET):
        t0 = time.monotonic()
        eng.search(q, 10).collect()
        dt = time.monotonic() - t0
        timings[f"search_{i}"] = round(dt, 3)
        lat_ms.append(dt * 1000)
    for i, q in enumerate(["spark OR merge OR token", "filter AND sort AND hash"]):
        t0 = time.monotonic()
        eng.search_wand(q, 10).collect()
        dt = time.monotonic() - t0
        timings[f"wand_{i}"] = round(dt, 3)
        lat_ms.append(dt * 1000)
    lat_sorted = sorted(lat_ms)
    p95 = lat_sorted[min(len(lat_sorted) - 1, int(0.95 * len(lat_sorted)))]

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

    qs = build_queries()
    for name in ["q01_bm25_or_topk", "q26_cosine_bruteforce_topk", "q33_lineitem_rollup"]:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).collect()
        timings[name] = round(time.monotonic() - t0, 3)

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
            }
        )
    )


if __name__ == "__main__":
    main()
