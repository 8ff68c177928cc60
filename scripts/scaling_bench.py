"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8).

No real cluster exists in this sandbox, so N vs 4N executors is proxied by
Spark's ``local-cluster[n_executors, cores, mem]`` mode: REAL separate
executor JVMs (own BlockManager, shuffle served over the fetch protocol,
own Python worker pools) on one machine — 1 executor x 4 cores vs
4 executors x 4 cores. This removes the single-JVM shared-lock /
shared-GC artifacts that made plain local[N] anti-scale. The remaining
shared resource is the machine itself (memory bandwidth, one OS page
cache), measured as the hardware ceiling and reported alongside.

Each config runs the SAME pre-materialized corpus through the full index
build + a 4-query suite, in a fresh subprocess; min-of-2 per config
(noisy neighbors). Appends the table to BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_docs] [small_exec] [big_exec]
       (defaults 200000 1 4; executors are 4 cores each)
"""

from __future__ import annotations

import datetime
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
# SCALE_CPE: cores per executor (default 4). Lower values reduce the
# number of concurrent memory-bus streams at the big config — used to
# separate bus-bound from engine-bound efficiency loss (see BENCH).
import os as _os

CORES_PER_EXEC = int(_os.environ.get("SCALE_CPE", "4"))

WORKER = r"""
import json, sys, tempfile, time, shutil
sys.path.insert(0, {repo!r})
from search_engine_core_spark.engine import IndexSearchEngine
from search_engine_core_spark.session import get_spark
from search_engine_core_spark.sources.index_io import IndexBuilder

n_exec = {n_exec}
cores = n_exec * {cpe}
n_docs = {n_docs}
# STRONG-SCALING CONTRACT: the logical job must be IDENTICAL at both
# cluster sizes — same shuffle partition count, same shard fan-out — and
# only the resources vary. Partition/shard counts are sized for the BIG
# config ({shuffle_parts} partitions); the small config runs the same
# plan with fewer cores. (Round-1 runs let each config pick
# cores*2 partitions, which handed the 1-executor baseline a
# cheaper plan — fewer, larger tasks — and understated efficiency.)
# Speculation: observed once on a 4x4 leg — a single tail task wedged in
# JVM<->Python Arrow IPC (worker blocked in write(), JVM reader in select(),
# zero CPU for 25+ min). On a real cluster the same defense applies:
# re-launch stragglers; parquet's commit protocol keeps retries idempotent.
import os
# SCALE_CODEC: override shuffle/spill IO codec (e.g. zstd). On a
# memory-bandwidth-contended host, smaller shuffle bytes can buy back
# multi-executor efficiency at the cost of per-core CPU — measured, not
# assumed; applied identically to BOTH cluster sizes.
_extra = {{"spark.speculation": "true",
          "spark.speculation.multiplier": "4",
          "spark.speculation.quantile": "0.9"}}
if os.environ.get("SCALE_CODEC"):
    _extra["spark.io.compression.codec"] = os.environ["SCALE_CODEC"]
spark = get_spark("scaling", cores=cores, shuffle_partitions={shuffle_parts},
                  master=f"local-cluster[{{n_exec}},{cpe},12288]",
                  extra_conf=_extra)
idx = tempfile.mkdtemp(prefix="scale_idx_", dir="/dev/shm")
# corpus pre-materialized ONCE by the parent — identical input files for
# both cluster sizes; generation is harness work, never timed
corpus = spark.read.parquet({corpus_path!r})
t0 = time.monotonic()
import os
b = IndexBuilder(spark, idx + "/i", n_buckets=8, hot_df_threshold=max(1000, n_docs // 10),
                 n_shards={n_shards}, encode_partitions={n_shards} * 4,
                 map_side_tf=os.environ.get("SCALE_RAW_TF", "") != "1",
                 store_content=os.environ.get("SCALE_SLIM", "") != "1")
b.build(corpus)
build = time.monotonic() - t0
eng = IndexSearchEngine(spark, idx + "/i", n_buckets=8)
t0 = time.monotonic()
for q in ["spark merge", "spark OR merge OR token", "config query parse",
          "filter AND sort AND hash"]:
    eng.search(q, 10).collect()
qsec = time.monotonic() - t0
shutil.rmtree(idx, ignore_errors=True)
print("RESULT " + json.dumps({{"n_executors": n_exec, "cores": cores,
      "build_sec": build, "docs_per_sec": n_docs / build, "query_4_sec": qsec,
      "stages": {{k: round(v, 2) for k, v in b.stage_secs.items()}}}}))
"""


def _materialize_corpus(n_docs: int) -> str:
    """Generate the shared corpus parquet once, full local parallelism."""
    path = f"/dev/shm/scale_corpus_{n_docs}"
    if Path(path, "_SUCCESS").exists():
        return path
    code = (
        f"import sys; sys.path.insert(0, {str(REPO)!r})\n"
        "from search_engine_core_spark.corpus import synthesize_corpus\n"
        "from search_engine_core_spark.session import get_spark\n"
        "spark = get_spark('gen', cores=32)\n"
        # 256 files / 8 MB row groups: a splittable layout (an Iceberg
        # table at scale looks like this); coarse 32x53MB files collapsed
        # the tokenize stage to 14 input splits for 16 cores
        f"synthesize_corpus(spark, n_docs={n_docs}, tokens_per_doc=200)"
        ".repartition(256)"
        ".write.mode('overwrite').option('parquet.block.size', 8388608)"
        f".parquet({path!r})\n"
        "spark.stop()\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, capture_output=True, timeout=3600)
    return path


def run(n_exec: int, n_docs: int, corpus_path: str, big_cores: int) -> dict:
    code = WORKER.format(
        repo=str(REPO), n_exec=n_exec, n_docs=n_docs, cpe=CORES_PER_EXEC,
        corpus_path=corpus_path, shuffle_parts=big_cores * 2, n_shards=big_cores,
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    # scrub tmpfs residue (leaked executor local dirs / half-deleted
    # shuffle files): a prior run's dirty /dev/shm measurably slowed the
    # NEXT run's writes (observed 2x on the postings stage)
    import shutil as _sh

    for leftover in Path("/dev/shm/spark_local").glob("*"):
        _sh.rmtree(leftover, ignore_errors=True)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker failed (n_exec={n_exec}):\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}"
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    e_small = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    e_big = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    import os

    runs = int(os.environ.get("SCALE_RUNS", "2"))
    corpus_path = _materialize_corpus(n_docs)
    # min-of-N per config: the sandbox has noisy neighbors; best-case wall
    # time is the standard estimator under external interference
    big_cores = e_big * CORES_PER_EXEC
    small = min(
        (run(e_small, n_docs, corpus_path, big_cores) for _ in range(runs)),
        key=lambda r: r["build_sec"],
    )
    big = min(
        (run(e_big, n_docs, corpus_path, big_cores) for _ in range(runs)),
        key=lambda r: r["build_sec"],
    )
    eff = (small["build_sec"] / big["build_sec"]) / (e_big / e_small)
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    def _stages(r):
        return ", ".join(f"{k}={v:.1f}s" for k, v in r.get("stages", {}).items())

    block = f"""
## Scaling run {stamp} (n_docs={n_docs}, tokens/doc ~200, local-cluster mode, uniform plan: {big_cores * 2} shuffle partitions + {big_cores} shards at BOTH sizes)

| executors x cores | build sec | docs/sec | 4-query sec | per-stage |
|---|---|---|---|---|
| {e_small} x {CORES_PER_EXEC} (N)  | {small['build_sec']:.1f} | {small['docs_per_sec']:.0f} | {small['query_4_sec']:.1f} | {_stages(small)} |
| {e_big} x {CORES_PER_EXEC} (4N) | {big['build_sec']:.1f} | {big['docs_per_sec']:.0f} | {big['query_4_sec']:.1f} | {_stages(big)} |

Throughput scaling efficiency (build): **{eff:.2f}** =
(T_{e_small}exec / T_{e_big}exec) / ({e_big}/{e_small}).
Executors are separate JVMs (local-cluster mode) with their own block
managers and Python worker pools; they still share one machine's memory
bandwidth and OS page cache, which bounds the measurable ceiling.
"""
    out = REPO / "BENCH" / "BASELINE.md"
    out.parent.mkdir(exist_ok=True)
    existing = out.read_text() if out.exists() else "# BENCH/BASELINE — scaling evidence\n"
    out.write_text(existing + block)
    print(json.dumps({"small": small, "big": big, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
