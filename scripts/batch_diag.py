"""One-off diagnostic: phase timings for search_many at a given executor
count under local-cluster. Finds which phase anti-scales.

Usage: python scripts/batch_diag.py <n_exec> [n_queries]
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from search_engine_core_spark.engine import IndexSearchEngine
from search_engine_core_spark.session import get_spark

n_exec = {cores}
import os
os.makedirs("/tmp/eventlog", exist_ok=True)
spark = get_spark("batch_diag", cores={cores}, shuffle_partitions=16,
                  master={master!r},
                  extra_conf={{"spark.eventLog.enabled": "true",
                               "spark.eventLog.dir": "/tmp/eventlog"}})
t_open0 = time.monotonic()
eng = IndexSearchEngine(spark, "/dev/shm/qps_idx_100000", n_buckets=8)
t_open = time.monotonic() - t_open0

from search_engine_core_spark.corpus import _MED
log = []
for i, a in enumerate(_MED):
    for j, b in enumerate(_MED):
        if a != b:
            log.append(f"{{a}} OR {{b}}" if (i + j) % 2 else f"{{a}} {{b}}")
log = log[: {n_queries}]

# warm
eng.search_many(log[:8], 10).collect()

from search_engine_core_spark.operators.postings import decode_postings_df
from search_engine_core_spark.plans.planner import scoring_terms
from search_engine_core_spark.plans.query_parser import QueryParser
from search_engine_core_spark.operators.batch_query import search_many as sm

parser = QueryParser()
all_toks = sorted({{t for q in log for t in scoring_terms(parser.parse(q))}})

out = {{"n_exec": n_exec, "open": round(t_open, 2), "n_toks": len(all_toks)}}

t0 = time.monotonic()
trip = decode_postings_df(eng.reader.postings_for_terms(all_toks)).localCheckpoint(eager=True)
out["decode_ckpt"] = round(time.monotonic() - t0, 2)

t0 = time.monotonic()
out["trip_rows"] = trip.count()
out["trip_count"] = round(time.monotonic() - t0, 2)

res, stats = sm(spark, log, 10, trip, eng.reader.dfreq, eng.reader.docs,
                eng.stats, "bm25", None)
t0 = time.monotonic()
n = len(res.collect())
out["batch_exec"] = round(time.monotonic() - t0, 2)
out["result_rows"] = n
out["route"] = stats
print("RESULT " + json.dumps(out))
"""


def main() -> None:
    n_exec = int(sys.argv[1])
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    master = sys.argv[3] if len(sys.argv) > 3 else f"local-cluster[{n_exec},2,8192]"
    cores = n_exec * 2 if master.startswith("local-cluster") else n_exec
    code = WORKER.format(repo=str(REPO), cores=cores, master=master, n_queries=n_queries)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            print(line)
            return
    print(out.stdout[-1500:], file=sys.stderr)
    print(out.stderr[-3000:], file=sys.stderr)
    sys.exit(1)


if __name__ == "__main__":
    main()
