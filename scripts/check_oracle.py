"""Driver-style parity harness: run every queries() entry in Spark and its
oracle_sql() twin in DuckDB on the same sf dir; compare row sets exactly.

Usage: python scripts/check_oracle.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    out = set()
    for r in rows:
        key = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 4)
            key.append((c, v))
        out.add(tuple(key))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as entry
    from search_engine_core_spark.session import get_spark

    spark = get_spark("check_oracle", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, os_ = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [r.asDict() for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if name not in os_:
            print(f"weak  {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            res = con.execute(os_[name])
            d_cols = [d[0] for d in res.description]
            d_rows = [dict(zip(d_cols, row)) for row in res.fetchall()]
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        if sorted(s_cols) != sorted(d_cols):
            failures.append((name, f"schema: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"))
            print(f"FAIL  {name}: schema mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
            continue
        if len(s_rows) != len(d_rows):
            failures.append((name, f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}"))
            print(f"FAIL  {name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
            continue
        a, b = canon(s_rows, s_cols), canon(d_rows, d_cols)
        if a != b:
            diff_a = list(a - b)[:3]
            diff_b = list(b - a)[:3]
            failures.append((name, "values"))
            print(f"FAIL  {name}: value mismatch\n  spark-only: {diff_a}\n  duck-only:  {diff_b}")
            continue
        print(f"ok    {name}: {len(s_rows)} rows match")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
