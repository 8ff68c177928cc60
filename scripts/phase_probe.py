"""Phase-level strong-scaling probe: times each sub-phase of the postings
pipeline separately at a given cluster size, on the same pre-materialized
corpus as scaling_bench. Identifies WHERE scaling efficiency is lost:

  a. tokenize_tf  — map-side Arrow tokenize + per-doc tf (no shuffle)
  b. encode       — a + shuffle + sort + Arrow varbyte encode (count(), no write)
  c. full         — b + partitioned parquet write (the real postings stage)

Usage: python scripts/phase_probe.py <n_docs> <n_exec> [phase...]
Prints one RESULT json line. Run at 1 and 4 executors; compare per-phase.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CPE = 4
BIG_CORES = 16

WORKER = r"""
import json, sys, tempfile, time, shutil
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from search_engine_core_spark.session import get_spark
from search_engine_core_spark.functions.tokenizer import doc_tf_arrow
from search_engine_core_spark.operators.postings import build_postings

n_exec = {n_exec}
spark = get_spark("probe", cores=n_exec * {cpe}, shuffle_partitions={shuffle},
                  master=f"local-cluster[{{n_exec}},{cpe},12288]")
corpus = spark.read.parquet({corpus!r})
docs = corpus
if "doc_id" not in docs.columns:
    from search_engine_core_spark.corpus import with_doc_columns
    docs = with_doc_columns(corpus)

out = {{}}
phases = {phases!r}

def trip():
    return docs.select("doc_id", "content").mapInArrow(
        doc_tf_arrow, "doc_id long, term string, tf long")

hot = spark.createDataFrame([("the",), ("a",), ("is",), ("not",)], "term string")

if "tokenize_tf" in phases:
    t0 = time.monotonic(); n = trip().count(); out["tokenize_tf"] = time.monotonic() - t0
    out["n_triples"] = n
if "encode" in phases:
    t0 = time.monotonic()
    p = build_postings(trip().withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(8)).cast("int")),
                       hot, 10**9, {shards}, bucket_col=True, hot_is_term_set=True,
                       n_partitions={encode_parts})
    out["n_posting_rows"] = p.count()
    out["encode"] = time.monotonic() - t0
if "full" in phases:
    d = tempfile.mkdtemp(prefix="probe_", dir="/dev/shm")
    t0 = time.monotonic()
    p = build_postings(trip().withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(8)).cast("int")),
                       hot, 10**9, {shards}, bucket_col=True, hot_is_term_set=True,
                       n_partitions={encode_parts})
    (p.sortWithinPartitions("bucket").write.mode("overwrite").partitionBy("bucket")
      .option("partitionOverwriteMode", "dynamic").parquet(d + "/p"))
    out["full"] = time.monotonic() - t0
    shutil.rmtree(d, ignore_errors=True)

out["n_exec"] = n_exec
print("RESULT " + json.dumps({{k: (round(v, 2) if isinstance(v, float) else v) for k, v in out.items()}}))
"""


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_exec = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    phases = sys.argv[3:] or ["tokenize_tf", "encode", "full"]
    corpus = f"/dev/shm/scale_corpus_{n_docs}"
    if not Path(corpus, "_SUCCESS").exists():
        from scaling_bench import _materialize_corpus  # type: ignore

        sys.path.insert(0, str(REPO / "scripts"))
        corpus = _materialize_corpus(n_docs)
    code = WORKER.format(
        repo=str(REPO), n_exec=n_exec, cpe=CPE, corpus=corpus,
        shuffle=BIG_CORES * 2, shards=BIG_CORES, encode_parts=BIG_CORES * 4,
        phases=phases,
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            print(line)
            return
    print(out.stdout[-1500:], file=sys.stderr)
    print(out.stderr[-2500:], file=sys.stderr)
    sys.exit(1)


if __name__ == "__main__":
    main()
