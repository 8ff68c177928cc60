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


def _check(eng, want, label, planner_too=False):
    """Rank+score identity of eng.search (which routes WAND-eligible
    shapes through the LSM block-max path) vs the expected list;
    ``planner_too`` additionally pins the general decode-everything path
    (``_search_planner``), which eligible queries no longer exercise."""
    from search_engine_core_spark.plans.planner import scoring_terms
    from search_engine_core_spark.plans.query_parser import QueryParser

    def rows_match(got, exp, qq):
        assert [d for d, _ in got] == [d for d, _ in exp], (label, qq, got, exp)
        for (_, gs), (_, ws) in zip(got, exp):
            assert math.isclose(gs, ws, rel_tol=1e-9), (label, qq, gs, ws)

    for qq, exp in want.items():
        got = [(r["doc_id"], r["score"]) for r in eng.search(qq, 10).collect()]
        rows_match(got, exp, qq)
        if planner_too:
            ast = QueryParser().parse(qq)
            via_planner = [
                (r["doc_id"], r["score"])
                for r in eng._search_planner(ast, scoring_terms(ast), 10, "bm25").collect()
            ]
            rows_match(via_planner, exp, qq + " [planner]")


def _pin_wand_routing(eng, queries, expected_routed):
    """Assert exactly ``expected_routed`` of ``queries`` take the LSM
    WAND fast path — rank identity must not be passing via a silent
    fallback to the general path."""
    from search_engine_core_spark.streaming.incremental import DeltaSearchEngine

    calls = []
    orig = DeltaSearchEngine._wand_topk
    try:
        DeltaSearchEngine._wand_topk = lambda self, t, k, m: (
            calls.append(tuple(t)),
            orig(self, t, k, m),
        )[1]
        for qq in queries:
            eng.search(qq, 10).collect()
    finally:
        DeltaSearchEngine._wand_topk = orig
    assert len(calls) == expected_routed, (calls, queries)


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

    # stage 1 also pins the general path (WAND-eligible queries route
    # away from it) and that the 4 eligible shapes actually take the
    # WAND-over-LSM path: "spark merge"/"return"/"updatedphrase" (AND,
    # updatedphrase existing ONLY in update tiers) + the token-OR
    eng1 = DeltaSearchEngine(spark, idx, n_buckets=4)
    _check(eng1, want, "2seg+delta", planner_too=True)
    _pin_wand_routing(eng1, QUERIES, expected_routed=4)

    assert minor_compact(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4) == 2
    assert _segment_ids(idx) == [0, 1, 2]
    _check(DeltaSearchEngine(spark, idx, n_buckets=4), want, "3seg+empty-delta")

    # structural pin: however many segments exist, a query runs exactly
    # TWO postings decodes on EITHER path — ONE all-segments scan (seg
    # carried, latest-wins via a single (doc_id, seg) semi-join, never a
    # per-segment decode ladder) plus, on the WAND route, the rarest
    # term's seed decode, or on the planner route, the main decode
    import search_engine_core_spark.operators.postings as _P
    from search_engine_core_spark.plans.planner import scoring_terms
    from search_engine_core_spark.plans.query_parser import QueryParser

    eng3 = DeltaSearchEngine(spark, idx, n_buckets=4)
    for run in ("wand", "planner"):
        calls, orig = [], _P.decode_postings_df
        try:
            _P.decode_postings_df = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
            if run == "wand":
                eng3.search("spark merge", 10).collect()
            else:
                ast3 = QueryParser().parse("spark merge")
                eng3._search_planner(ast3, scoring_terms(ast3), 10, "bm25").collect()
        finally:
            _P.decode_postings_df = orig
        assert len(calls) == 2, (run, calls)

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


def test_delta_engine_suggest_and_meta(spark, tmp_path, small_corpus):
    """S14 + P1/O6 on the LSM engine: a freshly streamed term suggests
    immediately (from the delta tier), keeps suggesting after minor
    compaction (from the segment postings' metadata columns), and
    search_with_meta serves the new doc's snippet from its delta
    content with highlighting."""
    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.streaming.incremental import (
        DeltaSearchEngine,
        minor_compact,
    )

    base = small_corpus.select("repo", "path", "commit", "lang", "content")
    idx = str(tmp_path / "idx")
    IndexBuilder(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4).build(base)
    inbox, ckpt = str(tmp_path / "inbox"), str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("org/new", "src/s.py", "c1", "python", "zebraqq quantum spark flux")], CS
    ).write.parquet(f"{inbox}/b1")
    _stream(spark, inbox, idx, ckpt)

    deng = DeltaSearchEngine(spark, idx, n_buckets=4)
    assert [r["term"] for r in deng.suggest("zebraq", 5).collect()] == ["zebraqq"]
    m = deng.search_with_meta("zebraqq", 5, highlight=True).collect()
    assert len(m) == 1 and "<b>zebraqq</b>" in m[0]["snippet"]
    # a main-index term still suggests, df dominated by the main tier
    assert deng.suggest("spark", 3).first()["term"] == "spark"

    assert minor_compact(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4) == 0
    deng2 = DeltaSearchEngine(spark, idx, n_buckets=4)
    assert [r["term"] for r in deng2.suggest("zebraq", 5).collect()] == ["zebraqq"]
    m2 = deng2.search_with_meta("zebraqq", 5, highlight=True).collect()
    assert len(m2) == 1 and "<b>zebraqq</b>" in m2[0]["snippet"]

    # search_wand API parity (r5): explicit WAND entry with tunable caps
    # matches search() ranks on the LSM view, including OR mode and a
    # survivor-cap squeeze that forces the guarded full-decode fallback
    for qq in ("zebraqq", "spark OR flux"):
        want_ids = [r["doc_id"] for r in deng2.search(qq, 5).collect()]
        got = [r["doc_id"] for r in deng2.search_wand(qq, 5).collect()]
        assert got == want_ids, (qq, got, want_ids)
        # seed_cap=0 deterministically forces the guarded full-decode
        # fallback — the one path where exclude_df + extra_trip compose
        # inside _topk_full_decode
        squeezed = [
            r["doc_id"] for r in deng2.search_wand(qq, 5, seed_cap=0).collect()
        ]
        assert squeezed == want_ids, (qq, squeezed, want_ids)


def test_lsm_random_lifecycle(spark, tmp_path, small_corpus):
    """Property test over the tiered design: a seeded RANDOM interleaving
    of {ingest micro-batch (new docs + re-crawls), minor_compact,
    merge_segments over a random contiguous run, major compact_deltas}
    must keep the LSM read path rank-identical to an in-memory engine
    over the latest-version corpus after EVERY step — not just the fixed
    3-segment scenario above. Catches precedence bugs that only appear in
    orderings the scenario test never visits (e.g. major compaction with
    a non-empty delta AND live segments, minor compaction of a re-crawl
    that supersedes a doc already in a segment, a merge whose run sits
    under newer unmerged segments)."""
    import random

    from search_engine_core_spark.engine import SearchEngine
    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.streaming.incremental import (
        DeltaSearchEngine,
        _segment_ids,
        compact_deltas,
        merge_segments,
        minor_compact,
    )

    rng = random.Random(0x55)
    queries = ["spark merge", "updatedphrase OR token", '"spark table"']
    kw = dict(n_buckets=4, hot_df_threshold=100, n_shards=4)

    base_rows = small_corpus.select(
        "repo", "path", "commit", "lang", "content"
    ).limit(60).collect()
    # latest-version truth: natural key -> (lang, content)
    current = {(r["repo"], r["path"], r["commit"]): (r["lang"], r["content"])
               for r in base_rows}
    idx = str(tmp_path / "idx")
    IndexBuilder(spark, idx, **kw).build(
        spark.createDataFrame(base_rows, CS)
    )
    inbox, ckpt = str(tmp_path / "inbox"), str(tmp_path / "ckpt")
    gen = 0

    def ingest():
        nonlocal gen
        gen += 1
        batch = []
        for key in rng.sample(sorted(current), rng.randint(1, 3)):  # re-crawls
            lang, old = current[key]
            content = f"updatedphrase gen{gen} spark table merge " + old[:40]
            current[key] = (lang, content)
            batch.append((*key, lang, content))
        for i in range(rng.randint(0, 2)):  # brand-new docs
            key = ("org/new", f"src/g{gen}_{i}.py", "c0")
            content = f"token zebra gen{gen} spark merge quantum"
            current[key] = ("python", content)
            batch.append((*key, "python", content))
        spark.createDataFrame(
            [(r[0], r[1], r[2], r[3], r[4]) for r in batch], CS
        ).write.parquet(f"{inbox}/b{gen}")
        _stream(spark, inbox, idx, ckpt)

    def merge_random_run():
        segs = _segment_ids(idx)
        if len(segs) < 2:
            return
        i = rng.randrange(len(segs) - 1)
        j = rng.randrange(i + 1, len(segs))
        merge_segments(spark, idx, segs[i:j + 1], **kw)

    ops = {"ingest": ingest,
           "minor": lambda: minor_compact(spark, idx, **kw),
           "merge": merge_random_run,
           "major": lambda: compact_deltas(spark, idx, **kw)}
    # every op at least once, then a random tail — seeded, so the exact
    # interleaving is reproducible
    plan = ["ingest", "minor", "ingest", "minor", "merge", "major"] + [
        rng.choice(["ingest", "ingest", "minor", "merge", "major"])
        for _ in range(6)
    ]
    for step, op in enumerate(plan):
        ops[op]()
        ref = SearchEngine(spark.createDataFrame(
            [(k[0], k[1], k[2], v[0], v[1]) for k, v in current.items()], CS
        ))
        want = {
            qq: [(r["doc_id"], r["score"]) for r in ref.search(qq, 10).collect()]
            for qq in queries
        }
        _check(DeltaSearchEngine(spark, idx, n_buckets=4), want,
               f"step{step}:{op}")
        ref.unpersist()
    assert gen >= 5  # the draw actually exercised multiple generations
    shutil.rmtree(idx, ignore_errors=True)


# --------------------- embedding-index lifecycle (r4 "What's missing" #2)
SF_EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb5(spark):
    return spark.read.parquet(SF_EMB)


def _rows(spark, index_dir):
    from search_engine_core_spark.sources.embedding_index import EmbeddingIndex

    return sorted(
        (r["vec_id"], tuple(r["embedding"]), r["bucket"], r["cell"])
        for r in EmbeddingIndex(spark, index_dir).vectors().collect()
    )


def test_embedding_build_single_scan_no_count(spark, tmp_path, emb5, monkeypatch):
    """r5 (#6): with an explicit layout the build scans the source ONCE —
    n_vecs rides the write's observe(); any count() during the build is a
    failure (the r4 verdict flagged the separate embeddings.count() job)."""
    import pyspark.sql.dataframe as D

    from search_engine_core_spark.sources.embedding_index import EmbeddingIndexBuilder

    d = str(tmp_path / "one_scan")
    b = EmbeddingIndexBuilder(
        spark, d, n_bits=6, n_centroids=8, partition_cells=False,
        centroid_ids=list(range(1, 9)),
    )

    def boom(self):
        raise AssertionError("DataFrame.count() ran during single-scan build")

    monkeypatch.setattr(D.DataFrame, "count", boom)
    b.build(emb5)
    monkeypatch.undo()
    import json

    meta = json.load(open(f"{d}/meta.json"))
    assert meta["n_vecs"] == emb5.count() == 500
    assert meta["partitioned_by"] == ["bucket"]


def test_embedding_build_crash_resume_identical(spark, tmp_path, emb5):
    """r5 (#3c): a build killed mid-way (fault injection after 2 of 4
    bucket slices) resumes from the per-slice lineage and ends
    row-identical to an uninterrupted build — meta (planes, centroids,
    n_vecs) included. meta.json commits FIRST so the resume reuses the
    exact layout."""
    import json

    from search_engine_core_spark.sources.embedding_index import (
        EmbeddingBuildAborted,
        EmbeddingIndexBuilder,
    )

    kw = dict(n_bits=6, n_centroids=8, partition_cells=False,
              centroid_ids=list(range(1, 9)))
    ref = str(tmp_path / "ref")
    EmbeddingIndexBuilder(spark, ref, **kw).build(emb5)

    d = str(tmp_path / "crash")
    with pytest.raises(EmbeddingBuildAborted):
        EmbeddingIndexBuilder(spark, d, commit_group=4, **kw).build(
            emb5, fail_after_slices=2
        )
    # resume: only pending slices re-run
    EmbeddingIndexBuilder(spark, d, commit_group=4, **kw).build(emb5)
    assert _rows(spark, d) == _rows(spark, ref)
    ma = json.load(open(f"{d}/meta.json"))
    mb = json.load(open(f"{ref}/meta.json"))
    for k in ("dim", "n_bits", "seed", "hyperplanes", "centroids", "n_vecs"):
        assert ma[k] == mb[k], k
    # lineage recorded completed slices
    ck = spark.read.parquet(f"{d}/_checkpoint")
    done = {r["partition_id"] for r in ck.filter(F.col("stage") == "vectors").collect()}
    assert done == {0, 1, 2, 3}


@pytest.mark.parametrize("nest_cells", [False, True])
def test_embedding_upsert_delete_parity_vs_fresh(spark, tmp_path, emb5, nest_cells):
    """r5 (#3a/b): build over the INITIAL corpus then upsert (10
    re-embedded vectors that change bucket + 10 brand-new ids) and
    delete 10 — the result must be row-identical to a FRESH build over
    the final corpus (same stored planes/centroids), queries included.
    Covers both layouts (bucket-only and nested bucket/cell dirs),
    including clearing partitions emptied by the rewrite."""
    from search_engine_core_spark.sources.embedding_index import (
        EmbeddingIndex,
        EmbeddingIndexBuilder,
    )

    kw = dict(n_bits=4, n_centroids=4, partition_cells=nest_cells,
              centroid_ids=[1, 2, 3, 4])
    flipped = emb5.filter(F.col("vec_id").between(20, 29)).select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
    )
    newrows = emb5.filter(F.col("vec_id").between(30, 39)).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    final = (
        emb5.filter(~F.col("vec_id").between(10, 29))
        .select("vec_id", "embedding")
        .unionByName(flipped)
        .unionByName(newrows)
    )

    ref = str(tmp_path / f"fresh_{nest_cells}")
    EmbeddingIndexBuilder(spark, ref, **kw).build(final)

    d = str(tmp_path / f"lifecycle_{nest_cells}")
    b = EmbeddingIndexBuilder(spark, d, **kw)
    b.build(emb5.select("vec_id", "embedding"))
    assert b.upsert(flipped.unionByName(newrows)) == 20
    assert b.delete(F.col("vec_id").between(10, 19)) == 10

    assert _rows(spark, d) == _rows(spark, ref)
    import json

    assert json.load(open(f"{d}/meta.json"))["n_vecs"] == 500
    qv = [float(x) for x in emb5.filter(F.col("vec_id") == 0).first()["embedding"]]
    a = EmbeddingIndex(spark, d).ann_topk(qv, 10, n_probe=4).collect()
    c = EmbeddingIndex(spark, ref).ann_topk(qv, 10, n_probe=4).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in a] == [
        (r["vec_id"], r["cos_sim"]) for r in c
    ]
    iv_a = EmbeddingIndex(spark, d).ivf_topk(qv, 10, n_probe=2).collect()
    iv_c = EmbeddingIndex(spark, ref).ivf_topk(qv, 10, n_probe=2).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in iv_a] == [
        (r["vec_id"], r["cos_sim"]) for r in iv_c
    ]


def test_embedding_upsert_rejects_duplicate_ids(spark, tmp_path, emb5):
    """A batch with two rows for one vec_id has no defined winner (no
    ordering column) — upsert must refuse rather than double-write and
    corrupt the n_vecs accounting."""
    from search_engine_core_spark.sources.embedding_index import EmbeddingIndexBuilder

    d = str(tmp_path / "dup")
    b = EmbeddingIndexBuilder(
        spark, d, n_bits=4, n_centroids=4, partition_cells=False,
        centroid_ids=[1, 2, 3, 4],
    )
    b.build(emb5.select("vec_id", "embedding"))
    dup = emb5.filter(F.col("vec_id") == 5).select("vec_id", "embedding")
    with pytest.raises(ValueError, match="duplicate vec_ids"):
        b.upsert(dup.unionByName(dup))
    import json

    assert json.load(open(f"{d}/meta.json"))["n_vecs"] == 500  # untouched


# --------------------- segment-to-segment merges (size-tiered middle layer)

def test_pick_merge_runs_size_tiers(monkeypatch):
    """Tier = floor(log_{ratio}(bytes)): similar-sized contiguous
    neighbors group; a big settled segment breaks the run and is never
    dragged into small merges (the write-amplification guarantee)."""
    from search_engine_core_spark.streaming import incremental as inc

    sizes = {0: 100, 1: 120, 2: 90, 3: 110, 4: 100_000, 5: 130, 6: 105, 7: 95}
    monkeypatch.setattr(inc, "segment_bytes", lambda d: sizes)
    assert inc.pick_merge_runs("x", min_merge=3) == [[0, 1, 2, 3], [5, 6, 7]]
    assert inc.pick_merge_runs("x", min_merge=4) == [[0, 1, 2, 3]]
    assert inc.pick_merge_runs("x", min_merge=5) == []
    # min_merge floors at 2: a 1-segment "run" would spin maybe_compact
    assert [4] not in inc.pick_merge_runs("x", min_merge=1)


def test_merge_segments_rank_identity_policy_and_guards(
    spark, tmp_path, small_corpus
):
    """The size-tiered middle layer end-to-end: 4 delta generations
    minor-compacted into segments [0..3], with re-crawls crossing tier
    boundaries BOTH ways — a doc updated in gens 1/2/3 (its latest lives
    INSIDE the merge run) and a seg-0 doc re-updated in gen4 (its latest
    lives in seg 3, OUTSIDE the run, and must retain precedence over the
    merged tier). merge_segments([0,1,2]) must keep ranks identical,
    satisfy the integrity validator including deep decode, never read
    main postings, and refuse non-contiguous runs; maybe_compact then
    folds the rest by policy."""
    from search_engine_core_spark.corpus import with_doc_columns
    from search_engine_core_spark.engine import SearchEngine
    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.sources.validate import is_clean, validate_index
    from search_engine_core_spark.streaming.incremental import (
        DeltaSearchEngine,
        _segment_ids,
        maybe_compact,
        merge_segments,
        minor_compact,
    )

    base = small_corpus.select("repo", "path", "commit", "lang", "content")
    h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(5))
    parts = [base.filter(h == i) for i in range(5)]
    idx = str(tmp_path / "idx")
    IndexBuilder(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4).build(
        parts[0]
    )

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

    u1 = updated(parts[0], 3, "gen1")           # -> seg 0
    u2 = updated(parts[0].limit(3), 2, "gen2")  # -> seg 1
    u3 = updated(parts[0].limit(2), 1, "gen3")  # -> seg 2 (in-run latest)
    u4 = updated(parts[1], 1, "gen4")           # -> seg 3 (outside the run;
    #                                               supersedes a seg-0 doc)

    inbox, ckpt = str(tmp_path / "inbox"), str(tmp_path / "ckpt")
    for i, (p, u) in enumerate(
        [(parts[1], u1), (parts[2], u2), (parts[3], u3), (parts[4], u4)], start=1
    ):
        p.unionByName(u).write.parquet(f"{inbox}/b{i}")
        _stream(spark, inbox, idx, ckpt)
        assert (
            minor_compact(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4)
            == i - 1
        )
    assert _segment_ids(idx) == [0, 1, 2, 3]

    gens = [with_doc_columns(df) for df in (u4, u3, u2, u1, base)]
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
    _check(DeltaSearchEngine(spark, idx, n_buckets=4), want, "4seg-premerge")

    # guards: gap in the run / unknown id
    with pytest.raises(ValueError, match="not contiguous"):
        merge_segments(spark, idx, [0, 2], n_buckets=4)
    with pytest.raises(ValueError, match="unknown segment ids"):
        merge_segments(spark, idx, [0, 99], n_buckets=4)

    # merge never reads main postings: succeed on a poisoned copy
    import pathlib

    poisoned = str(tmp_path / "poisoned")
    shutil.copytree(idx, poisoned)
    for f in pathlib.Path(f"{poisoned}/postings").rglob("*.parquet"):
        f.write_bytes(b"not parquet")
    assert merge_segments(spark, poisoned, [0, 1, 2], n_buckets=4,
                          hot_df_threshold=100, n_shards=4) == 2

    assert merge_segments(spark, idx, [0, 1, 2], n_buckets=4,
                          hot_df_threshold=100, n_shards=4) == 2
    assert _segment_ids(idx) == [2, 3]
    eng = DeltaSearchEngine(spark, idx, n_buckets=4)
    _check(eng, want, "merged-012", planner_too=True)
    _pin_wand_routing(eng, QUERIES, expected_routed=4)
    report = validate_index(spark, idx, 4, deep=True)
    assert is_clean(report), report

    # policy tick folds the remaining same-tier pair; ranks unchanged.
    # size_ratio=8: the r6 delta-sized encode width makes segments denser
    # (fewer, larger files — less parquet framing), so the 1.8x byte gap
    # between the merged seg 2 (~85 KB) and seg 3 (~47 KB) straddles a
    # ratio-4 tier boundary; ratio 8 keeps them one tier, preserving the
    # scenario this assertion exercises (a qualifying same-tier run)
    actions = maybe_compact(spark, idx, n_buckets=4, hot_df_threshold=100,
                            n_shards=4, min_merge=2, size_ratio=8)
    assert actions == {"minor": None, "merged": [3]}
    assert _segment_ids(idx) == [3]
    _check(DeltaSearchEngine(spark, idx, n_buckets=4), want, "policy-merged")
    assert is_clean(validate_index(spark, idx, 4, deep=True))
    ref.unpersist()


def test_merge_segments_carries_positions_slim_index(spark, tmp_path, small_corpus):
    """Slim main (no stored content) + positions sidecar: two segments
    each carrying their own positions tree merge into one, and BOTH
    folded docs' phrases still answer index-only afterwards."""
    from search_engine_core_spark.corpus import with_doc_columns
    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.streaming.incremental import (
        DeltaSearchEngine,
        _segment_ids,
        merge_segments,
        minor_compact,
    )

    idx = str(tmp_path / "idx")
    IndexBuilder(
        spark, idx, n_buckets=4, n_shards=2, store_content=False,
        store_positions=True,
    ).build(small_corpus)
    inbox, ckpt = str(tmp_path / "inbox"), str(tmp_path / "ckpt")
    docs = [
        ("org/new", "src/p.py", "c9", "python", "zebra quantum flux appears here"),
        ("org/new2", "src/q.py", "c9", "python", "violet meson cascade appears here"),
    ]
    for i, row in enumerate(docs, start=1):
        spark.createDataFrame([row], CS).write.parquet(f"{inbox}/b{i}")
        _stream(spark, inbox, idx, ckpt)
        assert minor_compact(spark, idx, n_buckets=4, hot_df_threshold=50,
                             n_shards=2) == i - 1

    assert merge_segments(spark, idx, [0, 1], n_buckets=4,
                          hot_df_threshold=50, n_shards=2) == 1
    assert _segment_ids(idx) == [1]
    import os

    assert os.path.isdir(f"{idx}/segments/positions/seg=1")
    deng = DeltaSearchEngine(spark, idx, n_buckets=4)
    assert "content" not in deng.docs.columns
    for row, phrase in zip(docs, ('"zebra quantum flux"', '"violet meson cascade"')):
        want_id = with_doc_columns(
            spark.createDataFrame([row[:4] + ("x",)], CS)
        ).first()["doc_id"]
        hits = deng.search(phrase, 10).collect()
        assert [r["doc_id"] for r in hits] == [want_id], phrase


def test_merge_crash_midswap_rolls_forward(spark, tmp_path, small_corpus):
    """Fault-injected crash INSIDE the merge swap (postings artifact
    already swapped, docs mid-staging): the inflight marker + the
    already-complete merged trees mean recovery always rolls FORWARD —
    recover_merge finishes the swap, ranks are identical to the
    pre-crash engine, and the validator flags the inflight state while
    it lasts."""
    import shutil as _sh

    from search_engine_core_spark.sources.validate import is_clean, validate_index
    from search_engine_core_spark.streaming.incremental import (
        DeltaSearchEngine,
        _segment_ids,
        merge_segments,
        minor_compact,
        recover_merge,
    )
    from search_engine_core_spark.sources.index_io import IndexBuilder

    base = small_corpus.select("repo", "path", "commit", "lang", "content")
    h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(3))
    idx = str(tmp_path / "idx")
    IndexBuilder(spark, idx, n_buckets=4, hot_df_threshold=100, n_shards=4).build(
        base.filter(h == 0)
    )
    inbox, ckpt = str(tmp_path / "inbox"), str(tmp_path / "ckpt")
    for i in (1, 2):
        base.filter(h == i).write.parquet(f"{inbox}/b{i}")
        _stream(spark, inbox, idx, ckpt)
        assert minor_compact(spark, idx, n_buckets=4, hot_df_threshold=100,
                             n_shards=4) == i - 1

    queries = ["spark merge", "return OR token"]
    pre = DeltaSearchEngine(spark, idx, n_buckets=4)
    want = {q: [(r["doc_id"], r["score"]) for r in pre.search(q, 10).collect()]
            for q in queries}

    # let the postings artifact's 3 moves (2 stage-outs + tmp rename)
    # through, then die on the docs artifact's first stage-out
    budget = {"left": 3}
    real_move = _sh.move

    def flaky(src, dst):
        if budget["left"] == 0:
            raise RuntimeError("injected crash")
        budget["left"] -= 1
        return real_move(src, dst)

    mp = pytest.MonkeyPatch()
    mp.setattr(_sh, "move", flaky)
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            merge_segments(spark, idx, [0, 1], n_buckets=4,
                           hot_df_threshold=100, n_shards=4)
    finally:
        mp.undo()

    import os

    assert os.path.exists(f"{idx}/segments/_merge_inflight.json")
    report = validate_index(spark, idx, 4)
    assert report["merge_inflight"] == 1

    assert recover_merge(idx) == 1
    assert _segment_ids(idx) == [1]
    eng = DeltaSearchEngine(spark, idx, n_buckets=4)
    for q in queries:
        got = [(r["doc_id"], r["score"]) for r in eng.search(q, 10).collect()]
        assert [d for d, _ in got] == [d for d, _ in want[q]], q
        for (_, gs), (_, ws) in zip(got, want[q]):
            assert math.isclose(gs, ws, rel_tol=1e-9), q
    report = validate_index(spark, idx, 4, deep=True)
    assert is_clean(report), report


def test_stream_auto_compaction_maintains_lsm_shape(spark, tmp_path, small_corpus):
    """auto_compact_every: the ingest stream maintains its own LSM shape —
    each micro-batch tick drains level-0 into a segment and the
    size-tiered policy (min_merge=2) keeps folding neighbors, so three
    generations settle into ONE segment with no manual maintenance calls;
    ranks stay identical to an in-memory engine over the full corpus."""
    from search_engine_core_spark.engine import SearchEngine
    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.streaming.incremental import (
        DeltaSearchEngine,
        _segment_ids,
        start_incremental_index,
    )

    base = small_corpus.select("repo", "path", "commit", "lang", "content")
    h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(4))
    idx = str(tmp_path / "idx")
    kw = dict(n_buckets=4, hot_df_threshold=100, n_shards=4)
    IndexBuilder(spark, idx, **kw).build(base.filter(h == 0))

    inbox, ckpt = str(tmp_path / "inbox"), str(tmp_path / "ckpt")
    for i in (1, 2, 3):
        base.filter(h == i).write.parquet(f"{inbox}/b{i}")
        q = start_incremental_index(
            spark, f"{inbox}/b*", idx, ckpt,
            auto_compact_every=1,
            # size_ratio=8 for the same reason as the policy tick in
            # test_merge_segments_rank_identity_policy_and_guards: the
            # delta-sized encode width makes segments denser, and the
            # merged seg 1 vs fresh seg 2 byte gap straddles a ratio-4
            # tier boundary — ratio 8 keeps the generations one tier so
            # the policy scenario (fold every neighbor) stays exercised
            compact_kwargs=dict(**kw, min_merge=2, size_ratio=8.0),
        )
        q.awaitTermination(120)

    import os

    assert not os.path.isdir(f"{idx}/delta")  # level-0 always drained
    assert _segment_ids(idx) == [2]  # 0,1 merged -> 1; 1,2 merged -> 2
    eng = DeltaSearchEngine(spark, idx, n_buckets=4)
    ref = SearchEngine(small_corpus)
    for qq in ("spark merge", "return OR token", '"spark table"'):
        got = [(r["doc_id"], r["score"]) for r in eng.search(qq, 10).collect()]
        exp = [(r["doc_id"], r["score"]) for r in ref.search(qq, 10).collect()]
        assert [d for d, _ in got] == [d for d, _ in exp], qq
        for (_, gs), (_, ws) in zip(got, exp):
            assert math.isclose(gs, ws, rel_tol=1e-9), qq
    ref.unpersist()


def test_compact_crash_midswap_rolls_forward(spark, tmp_path, small_corpus):
    """Fault-injected crash INSIDE compact_deltas' swap sequence (first
    artifact already swapped): the inflight marker means every tmp was
    fully built, so recover_compaction rolls FORWARD and the healed index
    is rank-identical to an uninterrupted compaction twin."""
    import os
    import shutil as _sh

    from search_engine_core_spark.engine import IndexSearchEngine
    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.sources.validate import is_clean, validate_index
    from search_engine_core_spark.streaming.incremental import (
        compact_deltas,
        minor_compact,
        recover_compaction,
    )

    base = small_corpus.select("repo", "path", "commit", "lang", "content")
    h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(2))
    kw = dict(n_buckets=4, hot_df_threshold=100, n_shards=4)

    def build_two(where):
        idx = str(tmp_path / where)
        IndexBuilder(spark, idx, **kw).build(base.filter(h == 0))
        inbox, ckpt = str(tmp_path / f"{where}_in"), str(tmp_path / f"{where}_ck")
        base.filter(h == 1).write.parquet(f"{inbox}/b1")
        _stream(spark, inbox, idx, ckpt)
        assert minor_compact(spark, idx, **kw) == 0
        return idx

    # twin A: clean compaction
    idx_a = build_two("a")
    compact_deltas(spark, idx_a, **kw)
    eng_a = IndexSearchEngine(spark, idx_a, n_buckets=4)
    queries = ["spark merge", "return OR token"]
    want = {q: [(r["doc_id"], r["score"]) for r in eng_a.search(q, 10).collect()]
            for q in queries}

    # twin B: crash after the first artifact swap
    idx_b = build_two("b")
    budget = {"left": 1}
    real_move = _sh.move

    def flaky(src, dst):
        if budget["left"] == 0:
            raise RuntimeError("injected crash")
        budget["left"] -= 1
        return real_move(src, dst)

    mp = pytest.MonkeyPatch()
    mp.setattr(_sh, "move", flaky)
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            compact_deltas(spark, idx_b, **kw)
    finally:
        mp.undo()
    assert os.path.exists(f"{idx_b}/_compact_inflight.json")
    assert recover_compaction(idx_b) is True
    assert not os.path.exists(f"{idx_b}/_compact_inflight.json")
    assert not os.path.isdir(f"{idx_b}/segments")
    eng_b = IndexSearchEngine(spark, idx_b, n_buckets=4)
    for q in queries:
        got = [(r["doc_id"], r["score"]) for r in eng_b.search(q, 10).collect()]
        assert [d for d, _ in got] == [d for d, _ in want[q]], q
        for (_, gs), (_, ws) in zip(got, want[q]):
            assert math.isclose(gs, ws, rel_tol=1e-9), q
    assert is_clean(validate_index(spark, idx_b, 4, deep=True))
    # no-marker recovery is a no-op that reports False
    assert recover_compaction(idx_b) is False


def test_minor_compact_folds_only_complete_batches(spark, tmp_path,
                                                   small_corpus):
    """A batch whose docs write hasn't landed (the mid-commit shape a
    live stream produces) must SURVIVE minor_compact in level-0 and fold
    on the next tick — the old rmtree silently destroyed it."""
    import glob
    import os

    from search_engine_core_spark.corpus import with_doc_columns
    from search_engine_core_spark.operators.stats import triples
    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.streaming.incremental import (
        DeltaSearchEngine,
        minor_compact,
    )

    base = small_corpus.select("repo", "path", "commit", "lang", "content")
    h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(3))
    idx = str(tmp_path / "idx")
    kw = dict(n_buckets=4, hot_df_threshold=100, n_shards=4)
    IndexBuilder(spark, idx, **kw).build(base.filter(h == 0))

    def write_batch(part, batch_id, docs_too=True):
        docs = with_doc_columns(part).withColumn("batch_id", F.lit(batch_id))
        triples(with_doc_columns(part)).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(f"{idx}/delta")
        if docs_too:
            docs.write.mode("append").parquet(f"{idx}/delta_docs")

    write_batch(base.filter(h == 1), 0, docs_too=True)
    write_batch(base.filter(h == 2), 1, docs_too=False)  # docs in flight
    assert minor_compact(spark, idx, **kw) == 0
    # batch 1's triples survived in level-0
    assert glob.glob(f"{idx}/delta/*.parquet")
    # docs write lands -> next tick folds it
    with_doc_columns(base.filter(h == 2)).withColumn(
        "batch_id", F.lit(1)
    ).write.mode("append").parquet(f"{idx}/delta_docs")
    assert minor_compact(spark, idx, **kw) == 1
    assert not os.path.isdir(f"{idx}/delta")
    eng = DeltaSearchEngine(spark, idx, n_buckets=4)
    n_docs = eng.stats.n_docs
    assert n_docs == base.count()  # nothing lost across the two folds


def test_minor_compact_refuses_docless_delta(spark, tmp_path, small_corpus):
    """A delta with no delta_docs cannot become a segment (no doclens ->
    unscorable); minor_compact raises and the engine refuses a hand-built
    docless segment instead of silently dropping its triples."""
    import os

    from search_engine_core_spark.corpus import with_doc_columns
    from search_engine_core_spark.operators.stats import triples
    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.streaming.incremental import (
        DeltaSearchEngine,
        minor_compact,
    )

    base = small_corpus.select("repo", "path", "commit", "lang", "content")
    h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(2))
    idx = str(tmp_path / "idx")
    kw = dict(n_buckets=4, hot_df_threshold=100, n_shards=4)
    IndexBuilder(spark, idx, **kw).build(base.filter(h == 0))
    triples(with_doc_columns(base.filter(h == 1))).withColumn(
        "batch_id", F.lit(0)
    ).write.mode("append").parquet(f"{idx}/delta")
    with pytest.raises(RuntimeError, match="no delta_docs"):
        minor_compact(spark, idx, **kw)
    # hand-built docless segment -> engine refuses loudly
    os.makedirs(f"{idx}/segments", exist_ok=True)
    shutil.copytree(f"{idx}/postings", f"{idx}/segments/postings/seg=0")
    with pytest.raises(RuntimeError, match="no docs tree"):
        DeltaSearchEngine(spark, idx, n_buckets=4)
