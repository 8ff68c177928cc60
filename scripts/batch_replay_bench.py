"""Batched query-replay scaling at two cluster sizes (north-rule query
axis, third measurement: the shape that DOES scale on executors).

query_throughput_bench measured the honest ceiling of PER-QUERY
evaluation: the executor axis tops out (~0.60) because every query is
its own chain of driver round-trips and one Python driver's GIL
serializes parse/plan/collect. ``search_many`` (operators/batch_query)
removes that bound by construction — N queries become ONE DataFrame
plan (one union-term postings scan, one broadcast (query, term) join,
one map-side-combinable groupBy, one per-query window top-k), so the
driver submits a constant number of jobs regardless of N and the work
is executor-bound. This bench replays a fixed 128-query log through
search_many against the SAME pre-built index at 1x2 and 4x2 executors
(local-cluster: real separate JVMs, shuffle over the fetch protocol)
and reports QPS + scaling efficiency.

STRONG-SCALING CONTRACT: identical logical plan at both sizes (same
shuffle partition count, same index, same query log) — only resources
vary. Min-of-2 per config.

Usage: python scripts/batch_replay_bench.py [n_docs] [n_queries]
       (defaults 100000 512; executors are 2 cores each)
Appends results to BENCH/BASELINE.md like the other scaling harnesses.
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
sys.path.insert(0, {repo!r})
from search_engine_core_spark.engine import IndexSearchEngine
from search_engine_core_spark.session import get_spark

n_exec = {n_exec}
spark = get_spark("batch_replay", cores=n_exec * 2, shuffle_partitions=16,
                  master=f"local-cluster[{{n_exec}},2,8192]")
eng = IndexSearchEngine(spark, {index!r}, n_buckets=8)

# Deterministic replay log: distinct 2-term queries over the corpus's
# medium vocabulary (selective terms, positive idf), alternating AND/OR —
# all plain shapes, so the whole log takes the vectorized batch path.
# All ordered vocab pairs (30 x 29 = 870 distinct) are enumerated so the
# log size actually reaches n_queries.
from search_engine_core_spark.corpus import _MED
log = []
for i, a in enumerate(_MED):
    for j, b in enumerate(_MED):
        if a != b:
            log.append(f"{{a}} OR {{b}}" if (i + j) % 2 else f"{{a}} {{b}}")
log = log[: {n_queries}]
assert len(log) == {n_queries}, len(log)

# warm: parquet footers, dictionary, Python worker pools (untimed)
eng.search_many(log[:8], 10).collect()

# min-of-5 with the full draw disclosed: same-plan reps on this box vary
# up to 2x (executor JIT + GC + shared memory bus), so a min-of-2 draw is
# not adjudicable — the min is the capability number, the spread is the
# honesty number.
walls = []
for _ in range(5):
    t0 = time.monotonic()
    n_rows = len(eng.search_many(log, 10).collect())
    walls.append(round(time.monotonic() - t0, 2))
assert eng.last_batch_stats["planner"] == 0, eng.last_batch_stats
best = min(walls)
print("RESULT " + json.dumps({{"n_executors": n_exec, "n_queries": len(log),
      "wall_sec": best, "walls": walls,
      "qps": round(len(log) / best, 2), "result_rows": n_rows}}))
"""


def run(n_exec: int, index: str, n_queries: int) -> dict:
    code = WORKER.format(repo=str(REPO), n_exec=n_exec, index=index,
                         n_queries=n_queries)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker failed (n_exec={n_exec}):\n{out.stdout[-1500:]}\n{out.stderr[-2500:]}"
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    # shares the prebuilt read-only index with query_throughput_bench
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

    import shutil

    small = run(1, index, n_queries)
    for leftover in Path("/dev/shm/spark_local").glob("*"):
        shutil.rmtree(leftover, ignore_errors=True)
    big = run(4, index, n_queries)
    eff = (big["qps"] / small["qps"]) / 4.0
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%M UTC")
    block = f"""
## Batched-replay scaling {stamp} (same {n_docs}-doc index, one search_many plan over a {n_queries}-distinct-query log, local-cluster, 2 cores/executor, min-of-5)

| config | queries | wall sec (min) | all draws | QPS |
|---|---|---|---|---|
| 1 x 2 executors (N)  | {small['n_queries']} | {small['wall_sec']} | {small['walls']} | {small['qps']} |
| 4 x 2 executors (4N) | {big['n_queries']} | {big['wall_sec']} | {big['walls']} | {big['qps']} |

Executor-axis efficiency: **{eff:.2f}** = (QPS_4exec / QPS_1exec) / 4.
The batch plan turns a replay log into a constant number of driver jobs
(one pruned postings decode + one vectorized score/topk plan), so added
executors absorb the scan/join/groupBy/window work directly — compare
the SEQUENTIAL executor axis (~0.60), where each query pays its own
driver round-trips. Residual off-ceiling loss at this scale is the
per-batch fixed work (pruned-scan decode on few input splits, three
tiny broadcasts, final collect) over only ~10-20 s of parallel work —
it amortizes with batch size; the QPS column (vs ~1-2 QPS sequential
per-query on identical hardware) is the workload-level story.
"""
    with open(REPO / "BENCH" / "BASELINE.md", "a") as f:
        f.write(block)
    print(json.dumps({"small": small, "big": big,
                      "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
