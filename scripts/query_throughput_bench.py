"""Query-THROUGHPUT scaling at two cluster sizes (the query-side half of
the north rule's "throughput and query latency reported per cluster
size").

Sequential query latency cannot scale with executors — each query is a
short chain of driver round-trips plus small jobs, so its floor is
scheduling, not compute (scaling_bench measures that leg honestly). The
metric that CAN scale is throughput under concurrency: a search service
runs many queries at once, and Spark's FAIR-capable scheduler overlaps
their stages across executors. This bench submits a fixed query mix from
T driver threads against the SAME pre-built index at 1x2 and 4x2
executors (local-cluster: real separate JVMs) and reports QPS + scaling
efficiency.

Usage: python scripts/query_throughput_bench.py [n_docs] [threads] [rounds]
       (defaults 100000 8 4; executors are 2 cores each, uniform plan)
Appends results to BENCH/BASELINE.md like scaling_bench.
"""

from __future__ import annotations

import datetime
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys, time
from concurrent.futures import ThreadPoolExecutor
sys.path.insert(0, {repo!r})
from search_engine_core_spark.engine import IndexSearchEngine
from search_engine_core_spark.session import get_spark

n_exec = {n_exec}
spark = get_spark("qps", cores=n_exec * 2, shuffle_partitions=16,
                  master=f"local-cluster[{{n_exec}},2,8192]")
eng = IndexSearchEngine(spark, {index!r}, n_buckets=8)
QUERIES = ["spark merge", "spark OR merge OR token", "config query parse",
           "filter AND sort AND hash", "lang:python spark", "return",
           "ident_1_1 OR spark", "table AND index"]
# warm: dictionary/norms residency + Python worker pools + parquet footers
for q in QUERIES:
    eng.search(q, 10).collect()

work = [q for _ in range({rounds}) for q in QUERIES]
t0 = time.monotonic()
with ThreadPoolExecutor({threads}) as pool:
    list(pool.map(lambda q: eng.search(q, 10).collect(), work))
wall = time.monotonic() - t0
print("RESULT " + json.dumps({{"n_executors": n_exec,
      "n_queries": len(work), "wall_sec": round(wall, 2),
      "qps": round(len(work) / wall, 2)}}))
"""


def run(n_exec: int, index: str, threads: int, rounds: int) -> dict:
    code = WORKER.format(repo=str(REPO), n_exec=n_exec, index=index,
                         threads=threads, rounds=rounds)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed (n_exec={n_exec}):\n{out.stdout[-1500:]}\n{out.stderr[-2500:]}")


def run_pods(n_pods: int, index: str, total_queries: int, threads: int) -> dict:
    """N independent (driver + 1x2 executors) PODS over the same read-only
    index, splitting a fixed query workload — how a search tier actually
    scales: query frontends are embarrassingly parallel across drivers;
    only the storage is shared. Strong scaling: total_queries fixed."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    per_pod_rounds = max(1, total_queries // (n_pods * 8))

    def one_pod(_):
        return run(1, index, threads, per_pod_rounds)

    t0 = time.monotonic()
    with ThreadPoolExecutor(n_pods) as pool:
        results = list(pool.map(one_pod, range(n_pods)))
    wall = time.monotonic() - t0
    done = sum(r["n_queries"] for r in results)
    # aggregate QPS = sum of per-pod measured QPS: the pods' timed query
    # phases overlap (launched together, identical work); summing their
    # own measurements excludes the per-process Spark startup, which is a
    # fixed cost a real pod pays once per deployment, not per workload
    return {"n_pods": n_pods, "n_queries": done,
            "wall_sec_incl_startup": round(wall, 2),
            "qps": round(sum(r["qps"] for r in results), 2)}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    index = f"/dev/shm/qps_idx_{n_docs}"
    if not Path(index, "stats").exists():
        code = (
            f"import sys; sys.path.insert(0, {str(REPO)!r})\n"
            "from search_engine_core_spark.corpus import synthesize_corpus\n"
            "from search_engine_core_spark.session import get_spark\n"
            "from search_engine_core_spark.sources.index_io import IndexBuilder\n"
            "spark = get_spark('gen', cores=32)\n"
            f"c = synthesize_corpus(spark, n_docs={n_docs}, tokens_per_doc=200)\n"
            f"IndexBuilder(spark, {index!r}, n_buckets=8, hot_df_threshold={max(1000, n_docs // 10)}, n_shards=8).build(c)\n"
            "spark.stop()\n"
        )
        subprocess.run([sys.executable, "-c", code], check=True,
                       capture_output=True, timeout=1800)

    # min-of-2 per config, same discipline as scaling_bench
    small = min((run(1, index, threads, rounds) for _ in range(2)),
                key=lambda r: r["wall_sec"])
    big = min((run(4, index, threads, rounds) for _ in range(2)),
              key=lambda r: r["wall_sec"])
    eff = (big["qps"] / small["qps"]) / 4.0
    # horizontal (pods) axis: 1 pod vs 4 pods, fixed total workload
    pods1 = run_pods(1, index, 32 * 4, threads=4)
    pods4 = run_pods(4, index, 32 * 4, threads=4)
    pods_eff = (pods4["qps"] / pods1["qps"]) / 4.0
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    block = f"""
## Query-throughput scaling {stamp} (same {n_docs}-doc index, {threads} driver threads x {rounds} rounds of an 8-query mix, local-cluster, 2 cores/executor)

| config | queries | QPS |
|---|---|---|
| 1 driver, 1 x 2 executors (N)  | {small['n_queries']} | {small['qps']} |
| 1 driver, 4 x 2 executors (4N) | {big['n_queries']} | {big['qps']} |
| 1 pod (driver + 1 x 2)          | {pods1['n_queries']} | {pods1['qps']} |
| 4 pods (driver + 1 x 2 each)    | {pods4['n_queries']} | {pods4['qps']} |

Executor-axis efficiency: **{eff:.2f}** = (QPS_4exec / QPS_1exec) / 4 —
bounded by the ONE shared Python driver (per-query parse/plan/collect
serialize on its GIL; executors go idle once the driver saturates).
Pod-axis efficiency: **{pods_eff:.2f}** = (QPS_4pods / QPS_1pod) / 4 —
how a search tier actually scales: query frontends are independent
processes over the same read-only index (shared storage, no shared
driver), so throughput adds across pods. Sequential per-query latency is
driver-scheduling-bound and cannot scale at all (scaling_bench's
query_4_sec column measures that leg honestly).
"""
    with open(REPO / "BENCH" / "BASELINE.md", "a") as f:
        f.write(block)
    print(json.dumps({"small": small, "big": big, "efficiency": round(eff, 3),
                      "pods1": pods1, "pods4": pods4,
                      "pods_efficiency": round(pods_eff, 3)}))


if __name__ == "__main__":
    main()
