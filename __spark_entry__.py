"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k on sf0.001; ``queries()`` /
``oracle_sql()`` expose one entry per implemented operator family from
SURVEY.md §2 (see search_engine_core_spark/entry_queries.py for the paired
implementations and the hash-identity conventions).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from search_engine_core_spark.entry_queries import build_oracle_sql, build_queries  # noqa: E402


def _ship_package(spark: SparkSession) -> None:
    """Make the package importable on executor Python workers no matter the
    driver's cwd (same mechanism as spark-submit --py-files)."""
    from search_engine_core_spark.session import _package_zip

    sc = spark.sparkContext
    if getattr(sc, "_secs_pkg_shipped", False):
        return
    try:
        sc.addPyFile(_package_zip())
    except Exception:
        pass  # already added in this context
    sc._secs_pkg_shipped = True


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship_package(spark)
    return build_queries()["q01_bm25_or_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    base = build_queries()
    wrapped = {}
    for name, fn in base.items():
        def make(f):
            def call(spark: SparkSession, sf_dir: str) -> DataFrame:
                _ship_package(spark)
                return f(spark, sf_dir)

            return call

        wrapped[name] = make(fn)
    return wrapped


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of ``queries()`` (same column names,
    same rounding, same deterministic ordering)."""
    return build_oracle_sql()
