"""spark-submit entrypoint — the north rule's deployment shape
("run via spark-submit --py-files on a multi-executor cluster at N and
4N executors").

The job never pins a master: ``SparkSession.builder.getOrCreate()``
inherits whatever ``spark-submit --master`` provided, so the SAME file
runs on local[], local-cluster[] (the sandbox's honest multi-executor
proxy) and a real YARN/k8s cluster. The two cluster sizes of the scaling
rule are just two ``--master local-cluster[N,c,mem]`` invocations of the
same command; ``scripts/scaling_bench.py`` automates exactly that pair
plus the uniform-plan discipline.

Sandbox smoke (mirrors a cluster submit):
    /opt/spark/bin/spark-submit \
        --master 'local-cluster[2,2,4096]' \
        --conf spark.executor.memory=4096m \
        --py-files "$(python -c 'import sys; sys.path.insert(0,".");
            from search_engine_core_spark.session import _package_zip;
            print(_package_zip())')" \
        scripts/spark_submit_job.py suite --corpus-docs 2000 \
        --index /tmp/submit_idx

Subcommands:
    build  --corpus <parquet dir> --index <dir>   batch index build
    query  --index <dir> --query "<dsl>" [--k 10] top-k over a built index
    suite  --corpus-docs N --index <dir>          synthesize + build + run
                                                  the bench query set
    stream --index <dir> --checkpoint <dir>       incremental delta ingest
           [--source files --inbox <dir>]         (file inbox, the sandbox
           [--source kafka --topic T              default), or the Kafka
            --bootstrap host:9092]                source — submit with
                                                  --packages "$(python -c
            'import scripts.spark_submit_job as j; print(j.kafka_packages())')"
            so the day a broker exists the swap is one flag, zero code.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

# package import works both via --py-files (zip on sys.path) and from a
# repo checkout (parent dir on sys.path)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402


def kafka_packages() -> str:
    """The ``--packages`` coordinate for Structured Streaming's Kafka
    source, pinned to the RUNNING Spark version. The Scala suffix is
    derived from the Spark major version: PyPI pyspark 3.x wheels are
    built against Scala 2.12 (loading a _2.13 jar there fails at class
    load), pyspark 4.x against 2.13. Kept callable so submit scripts
    never hardcode a coordinate that drifts from the installed pyspark."""
    import pyspark

    major = int(pyspark.__version__.split(".")[0])
    scala = "2.13" if major >= 4 else "2.12"
    return f"org.apache.spark:spark-sql-kafka-0-10_{scala}:{pyspark.__version__}"


def _spark() -> SparkSession:
    spark = SparkSession.builder.appName("search_engine_core_spark-job").getOrCreate()
    from search_engine_core_spark.session import _package_zip

    spark.sparkContext.addPyFile(_package_zip())
    return spark


def cmd_build(args) -> None:
    from search_engine_core_spark.sources.index_io import IndexBuilder

    spark = _spark()
    corpus = spark.read.parquet(args.corpus)
    t0 = time.monotonic()
    IndexBuilder(spark, args.index, n_buckets=args.buckets).build(corpus)
    n = spark.read.parquet(f"{args.index}/stats").collect()[0]["n_docs"]
    dt = time.monotonic() - t0
    print(json.dumps({"built_docs": int(n), "build_sec": round(dt, 2),
                      "docs_per_sec": round(n / dt, 1)}))


def cmd_query(args) -> None:
    from search_engine_core_spark.engine import IndexSearchEngine

    spark = _spark()
    eng = IndexSearchEngine(spark, args.index, n_buckets=args.buckets)
    t0 = time.monotonic()
    rows = eng.search(args.query, args.k).collect()
    print(json.dumps({
        "query": args.query,
        "latency_ms": round((time.monotonic() - t0) * 1000, 1),
        "hits": [{"doc_id": r["doc_id"], "score": round(r["score"], 4)} for r in rows],
    }))


def cmd_suite(args) -> None:
    from search_engine_core_spark.corpus import synthesize_corpus
    from search_engine_core_spark.engine import IndexSearchEngine
    from search_engine_core_spark.sources.index_io import IndexBuilder

    spark = _spark()
    corpus = synthesize_corpus(spark, n_docs=args.corpus_docs, tokens_per_doc=200)
    t0 = time.monotonic()
    IndexBuilder(spark, args.index, n_buckets=args.buckets).build(corpus)
    build = time.monotonic() - t0
    eng = IndexSearchEngine(spark, args.index, n_buckets=args.buckets)
    lat = {}
    for q in ["spark merge", "spark OR merge OR token", "config query parse",
              "filter AND sort AND hash"]:
        t0 = time.monotonic()
        eng.search(q, 10).collect()
        lat[q] = round((time.monotonic() - t0) * 1000, 1)
    print(json.dumps({
        "n_docs": args.corpus_docs,
        "build_sec": round(build, 2),
        "docs_per_sec": round(args.corpus_docs / build, 1),
        "query_latency_ms": lat,
        "executors": spark.sparkContext.defaultParallelism,
    }))


def cmd_stream(args) -> None:
    from search_engine_core_spark.streaming.incremental import start_incremental_index

    spark = _spark()
    kopts = None
    if args.source == "kafka":
        if not (args.topic and args.bootstrap):
            raise SystemExit("--source kafka requires --topic and --bootstrap")
        kopts = {"topic": args.topic, "bootstrap_servers": args.bootstrap}
    elif not args.inbox:
        raise SystemExit("--source files requires --inbox")
    q = start_incremental_index(
        spark,
        args.inbox or "",
        args.index,
        args.checkpoint,
        trigger_available_now=not args.continuous,
        source=args.source,
        kafka_options=kopts,
    )
    q.awaitTermination()
    print(json.dumps({"source": args.source, "index": args.index, "status": "done"}))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("--corpus", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--buckets", type=int, default=8)
    b.set_defaults(fn=cmd_build)
    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--buckets", type=int, default=8)
    q.set_defaults(fn=cmd_query)
    s = sub.add_parser("suite")
    s.add_argument("--corpus-docs", type=int, default=2000)
    s.add_argument("--index", required=True)
    s.add_argument("--buckets", type=int, default=8)
    s.set_defaults(fn=cmd_suite)
    st = sub.add_parser("stream")
    st.add_argument("--index", required=True)
    st.add_argument("--checkpoint", required=True)
    st.add_argument("--source", choices=["files", "kafka"], default="files")
    st.add_argument("--inbox")
    st.add_argument("--topic")
    st.add_argument("--bootstrap")
    st.add_argument("--continuous", action="store_true")
    st.set_defaults(fn=cmd_stream)
    args = ap.parse_args()
    args.fn(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
