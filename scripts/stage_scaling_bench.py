"""Two-cluster-size scaling evidence for the CURATION stages (the same
north-rule methodology as scaling_bench.py, applied per stage): the
CCNet perplexity gate (both scoring plans), BPE train and encode, and
the StarCoder-recipe code filter, each timed at N and 4N executors
(local-cluster mode — real separate JVMs) on one pre-materialized
corpus, min-of-2 per leg, uniform plan (shuffle partitions sized for
the big config at BOTH sizes), 2 cores/executor matching the headline
north-rule run (this host's memory bandwidth is flat to 8 concurrent
streams, so 4x2 = 8 cores is the honest big config).

EVERY (stage, size, rep) runs in its OWN subprocess with a fresh
SparkSession. The first version of this probe ran all stages
sequentially in one session and the numbers were garbage two ways:
(a) a later identical plan hit Spark's CacheManager (the gate's persist
is keyed on the logical plan, so rep 2 read rep 1's cache: 155 s -> 2 s),
and (b) cross-stage residue (the gate's 40M-row shuffle files on tmpfs +
its persisted scores) made bpe_encode read 25.8 s in-session vs 3-5 s
isolated — an apparent 0.12 anti-scaling efficiency that was pure
interference. Isolation is the measurement, not a nicety.

Usage: python scripts/stage_scaling_bench.py [n_docs] [small_exec] [big_exec]
       (defaults 200000 1 4; executors are 2 cores each, SCALE_CPE to override)
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CPE = int(os.environ.get("SCALE_CPE", "2"))

STAGES = {
    # CCNet gate, shipped bench plan: occurrence scoring vs broadcast LM
    "ccnet_gate_broadcast": """
t0 = time.monotonic()
n = perplexity_filter(docs, "content", keep_frac=2 / 3,
                      broadcast_lm=True).count()
out["sec"] = time.monotonic() - t0
out["invariant"] = n
""",
    # CCNet gate, collapsed default: the unbounded-LM any-scale shape
    "ccnet_gate_collapsed": """
t0 = time.monotonic()
n = perplexity_filter(docs, "content", keep_frac=2 / 3).count()
out["sec"] = time.monotonic() - t0
out["invariant"] = n
""",
    # BPE training: one distributed word-count pass + the driver-serial
    # Sennrich merge loop (a CHAIN by construction — each merge rewrites
    # the pair table the next merge ranks)
    "bpe_train": """
t0 = time.monotonic()
model = train_bpe(docs, "content", n_merges=200)
out["sec"] = time.monotonic() - t0
out["invariant"] = len(model.merges)
""",
    # BPE encode: whole-corpus subword count under a trained vocabulary,
    # one Arrow-batched pandas UDF (train cost excluded — model trained
    # before the clock starts)
    "bpe_encode": """
model = train_bpe(docs, "content", n_merges=200)
t0 = time.monotonic()
out["invariant"] = docs.select(
    F.sum(bpe_token_count(model, "content")).alias("n")
).collect()[0]["n"]
out["sec"] = time.monotonic() - t0
""",
    # StarCoder-recipe code filter: one map-side Arrow scan, no shuffle
    "code_filter": """
t0 = time.monotonic()
n = curate_code(docs, "content", "doc_id", "lang",
                code_opts={"min_comment_frac": None}).count()
out["sec"] = time.monotonic() - t0
out["invariant"] = n
""",
}

WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from search_engine_core_spark.session import get_spark
from search_engine_core_spark.corpus import with_doc_columns
from search_engine_core_spark.operators.lm import perplexity_filter
from search_engine_core_spark.operators.bpe import bpe_token_count, train_bpe
from search_engine_core_spark.operators.curation import curate_code

n_exec = {n_exec}
spark = get_spark("stage_scale", cores=n_exec * {cpe},
                  shuffle_partitions={shuffle_parts},
                  master=f"local-cluster[{{n_exec}},{cpe},12288]")
docs = with_doc_columns(
    spark.read.parquet({corpus_path!r})
).select("doc_id", "lang", "content")
out = {{}}
{stage_body}
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run(stage: str, n_exec: int, corpus_path: str, big_cores: int) -> dict:
    code = WORKER.format(
        repo=str(REPO), n_exec=n_exec, cpe=CPE,
        corpus_path=corpus_path, shuffle_parts=big_cores * 2,
        stage_body=STAGES[stage],
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600,
    )
    import shutil as _sh

    for leftover in Path("/dev/shm/spark_local").glob("*"):
        _sh.rmtree(leftover, ignore_errors=True)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker failed (stage={stage}, n_exec={n_exec}):\n"
        f"{out.stdout[-2000:]}\n{out.stderr[-3000:]}"
    )


def main() -> None:
    sys.path.insert(0, str(REPO / "scripts"))
    from scaling_bench import _materialize_corpus

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    e_small = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    e_big = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    runs = int(os.environ.get("SCALE_RUNS", "2"))
    corpus_path = _materialize_corpus(n_docs)
    big_cores = e_big * CPE
    ratio = e_big / e_small

    lines, effs = [], {}
    for stage in STAGES:
        smalls = [run(stage, e_small, corpus_path, big_cores)
                  for _ in range(runs)]
        bigs = [run(stage, e_big, corpus_path, big_cores)
                for _ in range(runs)]
        s = min(r["sec"] for r in smalls)
        b = min(r["sec"] for r in bigs)
        eff = (s / b) / ratio
        effs[stage] = round(eff, 3)
        # strong-scaling contract: identical logical results at both
        # sizes. BPE counts and code-filter kept counts are exact; the
        # gate's kept count may drift within approxQuantile's documented
        # 0.001 relative error under a different partition layout.
        inv_s, inv_b = smalls[0]["invariant"], bigs[0]["invariant"]
        if stage.startswith("ccnet"):
            assert abs(inv_s - inv_b) <= max(10, 0.002 * n_docs), (inv_s, inv_b)
        else:
            assert inv_s == inv_b, (stage, inv_s, inv_b)
        lines.append(
            f"| {stage} | {s:.1f} | {b:.1f} | {s / b:.2f}x | {eff:.2f} |"
        )
        print(json.dumps({"stage": stage, "small_min": round(s, 2),
                          "big_min": round(b, 2), "eff": effs[stage]}),
              flush=True)

    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%M UTC"
    )
    block = f"""
## Curation-stage scaling {stamp} (n_docs={n_docs}, local-cluster, {CPE} cores/executor, uniform plan: {big_cores * 2} shuffle partitions at BOTH sizes, min-of-{runs}, every (stage, size, rep) in its own subprocess — see stage_scaling_bench.py's docstring for why isolation is mandatory)

| stage | {e_small}x{CPE} (N) sec | {e_big}x{CPE} (4N) sec | speedup | efficiency |
|---|---|---|---|---|
{chr(10).join(lines)}

Per-stage Amdahl readout: `ccnet_gate_broadcast` (the shipped bench
plan — occurrence-level scoring against an explicitly broadcast LM,
sound whenever the LM is bounded, which is CCNet's own reference-corpus
shape) removes the collapse shuffle and scales accordingly;
`ccnet_gate_collapsed` (the unbounded-LM default) pays a 40M-row
shuffle whose bus traffic is the efficiency loss — the gap between the
two rows IS the measured cost of that shuffle at this host's bandwidth
ceiling. An occurrence-level SHUFFLE join (the third option) anti-scales
on hot-bigram skew and is deliberately not shipped (measured 109 -> 194 s
from 4 to 16 cores; operators/lm.py docstring). `bpe_train` is one
word-count pass + the driver-serial Sennrich merge chain; its efficiency
is bounded by that serial fraction and the honest number is reported,
not hidden in a suite wall. `bpe_encode` and `code_filter` are
shuffle-free map stages and should sit near 1.0; at 100 TB they scale
with input splits.
"""
    out = REPO / "BENCH" / "BASELINE.md"
    existing = out.read_text() if out.exists() else ""
    out.write_text(existing + block)
    print(json.dumps({"efficiency": effs}))


if __name__ == "__main__":
    main()
