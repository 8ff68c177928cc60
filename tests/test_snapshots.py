"""Snapshot retention + time travel over the tiered LSM index
(streaming/snapshots.py): every minor-compact commit is restorable
bit-for-bit after retained merges; prune-tainted and unretained merges
refuse honestly; crash windows converge via the existing merge marker;
expiry and row-level deletes barrier restores. The restore itself is
metadata-only (hardlinks) and yields a NORMAL index dir — rank identity
is checked through a plain DeltaSearchEngine over the restored dir."""

from __future__ import annotations

import json
import math
import os
import shutil

import pytest
from pyspark.sql import functions as F

CS = "repo string, path string, commit string, lang string, content string"
SNAP_QUERIES = ["spark merge", "updatedphrase", "genone OR gentwo OR genthree"]


def _stream(spark, inbox, idx, ckpt):
    from search_engine_core_spark.streaming.incremental import (
        start_incremental_index,
    )

    q = start_incremental_index(spark, f"{inbox}/b*", idx, ckpt)
    q.awaitTermination(120)


def _results(spark, idx, n_buckets=4):
    from search_engine_core_spark.streaming.incremental import DeltaSearchEngine

    eng = DeltaSearchEngine(spark, idx, n_buckets=n_buckets)
    return {
        q: [(r["doc_id"], r["score"]) for r in eng.search(q, 10).collect()]
        for q in SNAP_QUERIES
    }


def _assert_same(got, want, label):
    for q in SNAP_QUERIES:
        assert [d for d, _ in got[q]] == [d for d, _ in want[q]], (label, q)
        for (_, gs), (_, ws) in zip(got[q], want[q]):
            assert math.isclose(gs, ws, rel_tol=1e-9), (label, q, gs, ws)


@pytest.fixture(scope="module")
def snap_base(spark, small_corpus, tmp_path_factory):
    """A 3-commit LSM index (segs 0/1/2, drained delta) plus the search
    results captured at EVERY commit — the ground truth each restore
    must reproduce. Built once; tests copy the directory."""
    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.streaming.incremental import minor_compact

    root = tmp_path_factory.mktemp("snapbase")
    idx = str(root / "idx")
    base = small_corpus.select("repo", "path", "commit", "lang", "content")
    h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(4))
    parts = [base.filter(h == i) for i in range(4)]
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

    gens = [
        parts[1].unionByName(updated(parts[0], 3, "genone")),
        parts[2].unionByName(updated(parts[0].limit(3), 2, "gentwo")),
        parts[3].unionByName(updated(parts[0].limit(1), 1, "genthree")),
    ]
    inbox, ckpt = str(root / "inbox"), str(root / "ckpt")
    wants = {}
    for i, g in enumerate(gens):
        g.write.parquet(f"{inbox}/b{i}")
        _stream(spark, inbox, idx, ckpt)
        assert minor_compact(spark, idx, n_buckets=4, hot_df_threshold=100,
                             n_shards=4) == i
        wants[i] = _results(spark, idx)
    return idx, wants


def _copy(snap_base, tmp_path):
    idx = str(tmp_path / "idx")
    shutil.copytree(snap_base[0], idx)
    return idx


def test_time_travel_after_retained_merge(spark, tmp_path, snap_base):
    """THE acceptance test: retained merge of all three segments, then
    every commit restores rank-identical to the results captured when it
    was live; snapshots() reports all three restorable; the restored dir
    is itself snapshot-listable and re-restorable; expiry flips the
    pre-merge commits to unrestorable while the merged one survives."""
    from search_engine_core_spark.streaming.incremental import (
        _segment_ids,
        merge_segments,
    )
    from search_engine_core_spark.streaming.snapshots import (
        expire_retired,
        restore_snapshot,
        snapshots,
    )

    _, wants = snap_base
    idx = _copy(snap_base, tmp_path)
    assert merge_segments(spark, idx, [0, 1, 2], n_buckets=4, retain=True) == 2
    assert _segment_ids(idx) == [2]
    assert os.path.isdir(f"{idx}/segments/_retired/gen=1/postings/seg=0")

    assert [s["restorable"] for s in snapshots(idx)] == [True, True, True]
    for s in (0, 1, 2):
        out = str(tmp_path / f"asof{s}")
        restore_snapshot(idx, s, out)
        _assert_same(_results(spark, out), wants[s], f"asof{s}")
    # snap 2's cover is the live merged tree: exactly one segment linked
    assert _segment_ids(str(tmp_path / "asof2")) == [2]
    # hardlinks, not copies: restored postings share inodes with the index
    f_out = next(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(f"{tmp_path}/asof2/segments/postings")
        for f in fs if f.endswith(".parquet")
    )
    assert os.stat(f_out).st_nlink >= 2

    # the restored dir carries its own manifest: re-restore from it
    re2 = str(tmp_path / "re2")
    restore_snapshot(str(tmp_path / "asof2"), 2, re2)
    _assert_same(_results(spark, re2), wants[2], "re-restore")

    # expiry reclaims the retired gen and flips 0/1 to unrestorable
    assert expire_retired(idx) == [1]
    assert not os.path.isdir(f"{idx}/segments/_retired/gen=1")
    assert [s["restorable"] for s in snapshots(idx)] == [False, False, True]
    with pytest.raises(RuntimeError, match="not restorable"):
        restore_snapshot(idx, 0, str(tmp_path / "gone"))


def test_missing_retired_tree_reports_unrestorable(spark, tmp_path,
                                                   snap_base):
    """Never trust the manifest over the fs: if a retired gen's trees
    vanish without an expire event (crash inside an old expire_retired,
    manual cleanup), the straddled commits must flip to unrestorable and
    restore must raise — NOT silently produce an index missing dirs."""
    from search_engine_core_spark.streaming.incremental import merge_segments
    from search_engine_core_spark.streaming.snapshots import (
        restore_snapshot,
        snapshots,
    )

    idx = _copy(snap_base, tmp_path)
    assert merge_segments(spark, idx, [0, 1, 2], n_buckets=4, retain=True) == 2
    shutil.rmtree(f"{idx}/segments/_retired/gen=1")  # no expire event
    assert [s["restorable"] for s in snapshots(idx)] == [False, False, True]
    with pytest.raises(RuntimeError, match="not restorable"):
        restore_snapshot(idx, 0, str(tmp_path / "gone"))
    # the merged commit still restores rank-identical
    out = str(tmp_path / "asof2")
    restore_snapshot(idx, 2, out)
    _assert_same(_results(spark, out), snap_base[1][2], "merged-after-loss")


def test_unretained_prune_taints_restore(spark, tmp_path, snap_base):
    """An unretained merge of [0,1] under seg 2 prunes doc versions that
    snapshot 1 still needs: restoring 0 or 1 must refuse (taint), while
    snapshot 2 — whose target supplies the pruning segments — restores
    rank-identical through the pruned merged tree."""
    from search_engine_core_spark.streaming.incremental import merge_segments
    from search_engine_core_spark.streaming.snapshots import (
        _load_events,
        restore_snapshot,
    )

    _, wants = snap_base
    idx = _copy(snap_base, tmp_path)
    assert merge_segments(spark, idx, [0, 1], n_buckets=4) == 1
    ev = [e for e in _load_events(idx) if e["type"] == "merge"][0]
    assert ev["retained"] is False and ev["pruned_against"] == [2]

    for s in (0, 1):
        with pytest.raises(RuntimeError, match="not restorable"):
            restore_snapshot(idx, s, str(tmp_path / f"no{s}"))
    out = str(tmp_path / "ok2")
    restore_snapshot(idx, 2, out)
    _assert_same(_results(spark, out), wants[2], "pruned-merge asof2")


def test_merge_crash_before_manifest_recovers(spark, tmp_path, snap_base,
                                              monkeypatch):
    """Crash in the window between the swap and the manifest append: the
    marker is still on disk, so recover_merge rolls the swap forward,
    appends the merge event idempotently and removes the marker — after
    which every snapshot restores normally."""
    import search_engine_core_spark.streaming.snapshots as snaps
    from search_engine_core_spark.streaming.incremental import (
        merge_segments,
        recover_merge,
    )

    _, wants = snap_base
    idx = _copy(snap_base, tmp_path)
    real = snaps.append_event

    def boom(d, ev):
        if ev["type"] == "merge":
            raise RuntimeError("crash before manifest commit")
        return real(d, ev)

    monkeypatch.setattr(snaps, "append_event", boom)
    with pytest.raises(RuntimeError, match="crash before manifest"):
        merge_segments(spark, idx, [0, 1, 2], n_buckets=4, retain=True)
    monkeypatch.setattr(snaps, "append_event", real)

    marker = f"{idx}/segments/_merge_inflight.json"
    assert os.path.exists(marker)
    assert recover_merge(idx) == 2
    assert not os.path.exists(marker)
    merges = [e for e in snaps._load_events(idx) if e["type"] == "merge"]
    assert len(merges) == 1 and merges[0]["retained"] is True
    # recovery is idempotent: a second call is a no-op
    assert recover_merge(idx) is None
    assert len([e for e in snaps._load_events(idx)
                if e["type"] == "merge"]) == 1
    out = str(tmp_path / "asof1")
    from search_engine_core_spark.streaming.snapshots import restore_snapshot

    restore_snapshot(idx, 1, out)
    _assert_same(_results(spark, out), wants[1], "post-recovery asof1")


def test_delete_is_a_restore_barrier(spark, tmp_path, snap_base):
    """A row-level delete rewrites main in place, so every older
    snapshot must refuse to restore (its main tree no longer exists) —
    detected from the index's own _checkpoint lineage, no extra state."""
    from search_engine_core_spark.sources.index_io import IndexBuilder
    from search_engine_core_spark.streaming.snapshots import restore_snapshot

    idx = _copy(snap_base, tmp_path)
    IndexBuilder(spark, idx, n_buckets=4, hot_df_threshold=100,
                 n_shards=4).delete(F.col("doc_id") < 2)
    with pytest.raises(RuntimeError, match="delete"):
        restore_snapshot(idx, 1, str(tmp_path / "blocked"))


def test_snapshot_listing_without_manifest_is_selfhealing(spark, tmp_path,
                                                          snap_base):
    """Pre-feature indexes (or a crash between the segment move and the
    commit append) have live segments with no manifest rows: they enter
    as self-covering commits, so trivial restores still work."""
    from search_engine_core_spark.streaming.snapshots import (
        restore_snapshot,
        snapshots,
    )

    _, wants = snap_base
    idx = _copy(snap_base, tmp_path)
    os.remove(f"{idx}/segments/snapshots.json")
    listing = snapshots(idx)
    assert [s["snap"] for s in listing] == [0, 1, 2]
    assert all(s["restorable"] for s in listing)
    out = str(tmp_path / "healed1")
    restore_snapshot(idx, 1, out)
    _assert_same(_results(spark, out), wants[1], "self-healed asof1")
