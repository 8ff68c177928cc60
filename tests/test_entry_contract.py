"""Driver-contract lock: entry() smoke + a representative subset of
queries() vs oracle_sql() DuckDB twins at sf0.001 (the full sweep lives in
scripts/check_oracle.py; this keeps `pytest` alone sensitive to drift)."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SUBSET = [
    "q01_bm25_or_topk",
    "q04_bm25_mixed_precedence",
    "q05_bm25_phrase",
    "q11_term_df_top20",
    "q14_keywords_top3",
    "q15_word_token_counts",
    "q18_text_profile",
    "q22_minhash_signature",
    "q24_simhash",
    "q26_cosine_bruteforce_topk",
    "q29_antijoin_no_orders",
    "q32_upsert_merge",
    "q38_html_extract",
    "q39_robots_allowed",
    "q40_domain_health",
    "q42_ann_hyperplane_topk",
    "q43_ivf_topk",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _canon(rows, cols):
    out = set()
    for r in rows:
        key = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                v = "nan" if math.isnan(v) else round(v, 4)
            key.append((c, v))
        out.add(tuple(key))
    return out


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema.simpleString() == "struct<doc_id:bigint,score:double>"


def test_every_query_has_oracle_or_is_flagged():
    qs, os_ = entry.queries(), entry.oracle_sql()
    missing = set(qs) - set(os_)
    assert not missing, f"queries without oracle SQL: {missing}"


def test_query_set_fits_driver_validation_cap():
    """The correctness driver validates at most 50 queries() entries
    (CORRECTNESS_r03 held exactly the first 50 of 54, leaving q51-q54
    permanently unvalidated). The set was consolidated to exactly 50 in
    r4 — adding a 51st query silently drops one from validation, so
    growth must come with a merge or a displacement."""
    assert len(entry.queries()) <= 50


def test_oracle_dtypes_survive_pandas(duck):
    """The driver compares results via pandas, where DuckDB HUGEINT (the
    type of an un-cast integer ``sum()``) becomes float64 — ``3.0`` vs
    Spark's int64 ``3`` — so the value hash diverges while rows/schema
    stay green (the r3 q40 red row; ``fetchall()`` harnesses can't see
    it). DESCRIBE every oracle and ban pandas-lossy numeric output types."""
    lossy = ("HUGEINT", "UHUGEINT")
    for name, sql in entry.oracle_sql().items():
        desc = duck.execute(f"DESCRIBE {sql}").fetchall()
        bad = [(c, t) for c, t, *_ in desc if t in lossy or t.startswith("DECIMAL")]
        assert not bad, f"{name}: pandas-lossy oracle output types {bad}"


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_parity_subset(spark, duck, name):
    qs, os_ = entry.queries(), entry.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    s_rows = [r.asDict() for r in sdf.collect()]
    res = duck.execute(os_[name])
    d_cols = [d[0] for d in res.description]
    d_rows = [dict(zip(d_cols, row)) for row in res.fetchall()]
    assert sorted(sdf.columns) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert len(s_rows) > 0, f"{name} matched on empty result (weak)"
    assert _canon(s_rows, sdf.columns) == _canon(d_rows, d_cols)


def test_retrieval_rows_run_on_materialized_index(spark):
    """r5: the retrieval oracles (q01-q06, q34) answer from the
    compressed-postings index via IndexSearchEngine (r4 VERDICT top
    item — previously all 50 driver rows ran the in-memory twin). The
    entry itself hard-asserts the bucket-pruned postings scan and
    cross-checks block-max WAND rank identity; here we pin the routing."""
    from search_engine_core_spark import entry_queries as eq
    from search_engine_core_spark.engine import IndexSearchEngine

    rows = eq.build_queries()["q01_bm25_or_topk"](spark, SF_DIR).collect()
    assert len(rows) > 0
    eng = eq._INDEX_ENGINES.get(SF_DIR)
    assert isinstance(eng, IndexSearchEngine)
    # the driver index stores the positional sidecar: phrases (q05) are
    # adjacency-prefiltered from the index, not content-only
    assert eng.reader.has_positions()


def test_lsm_check_runs_on_tiered_cache(spark):
    """r5: q01/q03 additionally assert rank identity against
    ``DeltaSearchEngine`` over a per-sf TIERED cache (main over 5/8 of
    the corpus, TWO minor-compacted segments folded by merge_segments
    into one — stale bucket-0 versions + true bucket-1/2 docs — and a
    live delta with the true bucket-0 versions). Pin that the cache the
    driver row exercised really has all three tiers AND went through the
    merge — an accidental empty delta or segment would make the in-entry
    assert vacuous."""
    from search_engine_core_spark import entry_queries as eq
    from search_engine_core_spark.streaming.incremental import (
        DeltaSearchEngine,
        _segment_ids,
    )

    rows = eq.build_queries()["q03_bm25_implicit_and"](spark, SF_DIR).collect()
    assert len(rows) > 0
    eng = eq._LSM_ENGINES.get(SF_DIR)
    assert isinstance(eng, DeltaSearchEngine)
    # segs [0, 1] were merged into seg 1 (size-tiered middle layer) —
    # the driver row therefore validates the MERGED read path
    assert _segment_ids(eng.index_dir) == [1]
    assert not eng.delta.isEmpty()  # live level-0 with the true versions
    assert eng.seg_docs is not None
    # merge lineage row written by merge_segments
    from pyspark.sql import functions as SF

    log = eng.spark.read.parquet(f"{eng.index_dir}/_checkpoint")
    assert log.filter(SF.col("stage") == "merge_segments").count() >= 1
    # precedence probe: "stalemarker" exists ONLY in superseded segment
    # rows — any latest-wins leak would surface it as a hit
    assert eng.search("stalemarker xyzzyterm", 10).count() == 0
