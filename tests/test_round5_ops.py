"""Round-5 additions: segment-tiered LSM compaction (r4 VERDICT "What's
wrong" #1 / next-round #2) — minor compaction folds the live delta into
immutable compressed segments at delta-sized cost; queries union
[main ⊎ segments ⊎ delta] with doc-level latest-wins precedence; major
compaction folds everything back into main."""

from __future__ import annotations

import math
import shutil

import pytest
from pyspark.sql import functions as F

CS = "repo string, path string, commit string, lang string, content string"
QUERIES = [
    "spark merge",
    "spark OR merge OR token",
    "return",
    '"spark table"',
    "lang:python spark",
    "updatedphrase",
]


def _stream(spark, inbox, idx, ckpt):
    from search_engine_core_spark.streaming.incremental import start_incremental_index

    q = start_incremental_index(spark, f"{inbox}/b*", idx, ckpt)
    q.awaitTermination(120)


def _check(eng, want, label):
    for qq, exp in want.items():
        got = [(r["doc_id"], r["score"]) for r in eng.search(qq, 10).collect()]
        assert [d for d, _ in got] == [d for d, _ in exp], (label, qq, got, exp)
        for (_, gs), (_, ws) in zip(got, exp):
            assert math.isclose(gs, ws, rel_tol=1e-9), (label, qq, gs, ws)


def test_segment_tiered_lsm_rank_identity(spark, tmp_path, small_corpus):
    """THE r5 acceptance test: build main from part0; stream parts 1-3 as
    three delta generations with doc RE-CRAWLS that span tiers (a doc
    updated in gen1 re-updated in gen2, another updated in gen3's live
    delta); minor-compact gens 1-2 into immutable segments; require rank
    identity vs an in-memory engine over the latest-version corpus at
    EVERY stage — 2 segments + live delta, 3 segments + empty delta, and
    post-major-compaction (segments dir gone)."""
    from search_engine_core_spark.engine import IndexSearchEngine, SearchEngine
    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.streaming.incremental import (
        DeltaSearchEngine,
        _segment_ids,
        compact_deltas,
        minor_compact,
    )

    base = small_corpus.select("repo", "path", "commit", "lang", "content")
    h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(4))
    parts = [base.filter(h == i) for i in range(4)]
    idx = str(tmp_path / "idx")
    IndexBuilder(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4).build(
        parts[0]
    )

    # re-crawled versions: same natural key (same doc_id), new content
    def updated(src_df, n, tag):
        rows = src_df.limit(n).collect()
        return spark.createDataFrame(
            [
                (r["repo"], r["path"], r["commit"], r["lang"],
                 f"updatedphrase {tag} spark table merge " + r["content"][:40])
                for r in rows
            ],
            CS,
        )

    u1 = updated(parts[0], 3, "gen1")  # 3 main docs re-crawled in gen1
    u2 = updated(parts[0].limit(3), 2, "gen2")  # 2 of THOSE re-updated in gen2
    u3 = updated(parts[0].limit(1), 1, "gen3")  # 1 re-updated again in gen3

    inbox, ckpt = str(tmp_path / "inbox"), str(tmp_path / "ckpt")
    parts[1].unionByName(u1).write.parquet(f"{inbox}/b1")
    _stream(spark, inbox, idx, ckpt)
    assert minor_compact(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4) == 0

    parts[2].unionByName(u2).write.parquet(f"{inbox}/b2")
    _stream(spark, inbox, idx, ckpt)
    assert minor_compact(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4) == 1

    parts[3].unionByName(u3).write.parquet(f"{inbox}/b3")
    _stream(spark, inbox, idx, ckpt)  # gen3 stays live level-0

    # reference = latest version of every doc, precedence gen3 > gen2 >
    # gen1 > base built explicitly by successive anti-joins
    from search_engine_core_spark.corpus import with_doc_columns
    gens = [with_doc_columns(df) for df in (u3, u2, u1, base)]
    ref_docs = gens[0]
    for g in gens[1:]:
        ref_docs = ref_docs.unionByName(
            g.join(ref_docs.select("doc_id"), "doc_id", "left_anti")
        )
    ref = SearchEngine(ref_docs)
    want = {
        qq: [(r["doc_id"], r["score"]) for r in ref.search(qq, 10).collect()]
        for qq in QUERIES
    }

    _check(DeltaSearchEngine(spark, idx, n_buckets=4), want, "2seg+delta")

    assert minor_compact(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4) == 2
    assert _segment_ids(idx) == [0, 1, 2]
    _check(DeltaSearchEngine(spark, idx, n_buckets=4), want, "3seg+empty-delta")

    compact_deltas(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4)
    assert _segment_ids(idx) == []
    _check(IndexSearchEngine(spark, idx, n_buckets=4), want, "post-major")
    _check(DeltaSearchEngine(spark, idx, n_buckets=4), want, "post-major-lsm")
    ref.unpersist()
    shutil.rmtree(idx, ignore_errors=True)


def test_minor_compact_reads_no_main_postings(spark, tmp_path, small_corpus):
    """Minor compaction's cost must scale with the DELTA, not the index:
    poison the main postings dir after the build — minor_compact must
    still succeed (it never reads main), while major compaction would
    have to decode it."""
    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.streaming.incremental import minor_compact

    base = small_corpus.select("repo", "path", "commit", "lang", "content")
    h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(2))
    idx = str(tmp_path / "idx")
    IndexBuilder(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4).build(
        base.filter(h == 0)
    )
    inbox, ckpt = str(tmp_path / "inbox"), str(tmp_path / "ckpt")
    base.filter(h == 1).write.parquet(f"{inbox}/b1")
    _stream(spark, inbox, idx, ckpt)

    # corrupt main postings: every parquet file truncated to garbage
    import pathlib

    for f in pathlib.Path(f"{idx}/postings").rglob("*.parquet"):
        f.write_bytes(b"not parquet")
    assert minor_compact(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4) == 0


def test_minor_compact_slim_index_phrase_via_segment_positions(
    spark, tmp_path, small_corpus
):
    """Slim main index (no content) + positions sidecar: after a minor
    compaction the folded docs' phrases must still answer index-only —
    the segment carries its own positions tree, extracted at fold time."""
    from search_engine_core_spark.corpus import with_doc_columns
    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.streaming.incremental import (
        DeltaSearchEngine,
        minor_compact,
    )

    idx = str(tmp_path / "idx")
    IndexBuilder(
        spark, idx, n_buckets=4, n_shards=2, store_content=False, store_positions=True
    ).build(small_corpus)
    inbox, ckpt = str(tmp_path / "inbox"), str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("org/new", "src/p.py", "c9", "python", "zebra quantum flux appears here")],
        CS,
    ).write.parquet(f"{inbox}/b1")
    _stream(spark, inbox, idx, ckpt)
    assert minor_compact(spark, idx, n_buckets=4, hot_df_threshold=50, n_shards=2) == 0

    new_id = with_doc_columns(
        spark.createDataFrame([("org/new", "src/p.py", "c9", "python", "x")], CS)
    ).first()["doc_id"]
    deng = DeltaSearchEngine(spark, idx, n_buckets=4)
    assert "content" not in deng.docs.columns  # truly slim across tiers
    hits = deng.search('"zebra quantum flux"', 10).collect()
    assert [r["doc_id"] for r in hits] == [new_id]
