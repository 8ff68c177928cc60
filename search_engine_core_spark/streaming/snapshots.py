"""Snapshot retention + time travel over the tiered LSM index.

Iceberg's flagship metadata semantics, re-expressed on the local-FS
stand-in this repo uses at every write site: each ``minor_compact`` is a
COMMIT (snapshot id = the new segment id, monotone like an Iceberg
sequence number); a retained ``merge_segments`` moves the run's
immutable trees into ``segments/_retired/gen=G/`` instead of deleting
them and logs which commits each physical tree covers; and
:func:`restore_snapshot` materializes "the index as of commit S" into a
fresh directory by HARDLINKING a covering set of trees — a metadata-only
operation, exactly the cost shape of flipping an Iceberg snapshot
pointer (no data bytes move; at cluster scale the same call is a
``VERSION AS OF`` read of the index table).

Why this is first-class for a training-data pipeline: reproducibility.
"Train on the corpus as of run X" / "bisect which ingest batch regressed
eval" both need the index's state at an old commit to be reopenable
bit-for-bit, after arbitrary later ingest and compaction. The reference
has no analog — Redis/Mongo state is mutate-in-place
(``src/storage/RedisSearchStorage.cpp``), so this is a beyond-reference
lifecycle operator in the same spirit as the integrity validator.

Event model (``segments/snapshots.json``, append-only array; array order
IS event order, single-writer discipline as everywhere in this layout):

  {"type": "commit", "seg": S, "ts": ...}            one per minor_compact
  {"type": "merge",  "gen": G, "run": [...],         one per merge_segments
   "new_seg": N, "retained": bool, "ts": ...}
  {"type": "expire", "gens": [...], "ts": ...}       one per expire_retired

Crash safety rides the existing merge marker protocol: the marker is
written before the swap and carries ``retain_gen``; ``recover_merge``
rolls the swap forward AND appends the merge event idempotently (keyed
on gen), so every interruption point converges. Major compaction
(:func:`~search_engine_core_spark.streaming.incremental.compact_deltas`)
removes ``segments/`` wholesale — history deliberately restarts at a
major, the same contract as Iceberg's ``expireSnapshots`` after a
rewrite. Row-level :meth:`IndexBuilder.delete` rewrites main in place;
restore detects it from the index's own ``_checkpoint`` lineage (a
``delete`` row newer than the target commit) and refuses rather than
resurrect deleted rows.

Coverage resolution replays the event log: a live or retired physical
tree covers the set of commits folded into it (merges union their run's
coverages). ``restore_snapshot(S)`` picks the unique disjoint set of
trees covering exactly {commits <= S} — preferring merged trees (fewer
dirs) and falling back to retired originals when a merge straddles S.
Runs are contiguous by construction (merge_segments enforces it), so
the greedy max-first walk below is exact, never heuristic.
"""

from __future__ import annotations

import json
import os
import shutil
import time


def _manifest_path(index_dir: str) -> str:
    return f"{index_dir}/segments/snapshots.json"


def _load_events(index_dir: str) -> list[dict]:
    path = _manifest_path(index_dir)
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return json.load(fh)


def append_event(index_dir: str, event: dict) -> None:
    """Append one event to the manifest (read, append, write-aside,
    rename — the same commit discipline as every other write site).
    Merge events are idempotent on ``gen`` so crash-recovery replays
    cannot double-log."""
    events = _load_events(index_dir)
    if event["type"] == "merge" and any(
        e["type"] == "merge" and e["gen"] == event["gen"] for e in events
    ):
        return
    events.append(event)
    path = _manifest_path(index_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(events, fh)
    os.replace(tmp, path)


def next_gen(index_dir: str) -> int:
    """Next retirement-generation id = 1 + max over BOTH the event log
    and the ``_retired`` dirs (a crash between dir moves and the event
    append must not reuse a gen)."""
    gens = [e["gen"] for e in _load_events(index_dir) if e["type"] == "merge"]
    root = f"{index_dir}/segments/_retired"
    if os.path.isdir(root):
        gens += [
            int(d.split("=", 1)[1]) for d in os.listdir(root) if d.startswith("gen=")
        ]
    # restore_snapshot writes synthetic merge events with NEGATIVE gens;
    # counting them here would hand the first real merge gen 0, breaking
    # the documented 1-based convention (r5 ADVICE)
    gens = [g for g in gens if g > 0]
    return (max(gens) + 1) if gens else 1


def _replay(index_dir: str):
    """Replay the event log against the filesystem. Returns
    ``(commits, live, retired, expired)`` where ``commits`` maps commit
    id -> ts (None when only the fs knows it), ``live`` maps live seg id
    -> ``(coverage, need)`` frozensets, ``retired`` is a list of
    ``(gen, seg, coverage, need)`` and ``expired`` the expired gen set.

    ``need`` tracks prune taint: a merge that ran with
    ``prune_superseded`` dropped doc versions shadowed by the segments
    in its ``pruned_against`` list, so the merged tree is faithful ONLY
    for snapshots that also include those later segments — the taint
    unions through subsequent merges exactly like coverage does.

    Self-healing: live segments with no commit event (pre-feature
    indexes, or a crash between the segment move and the event append)
    enter as self-covering commits, so a manifest is never required for
    the trivial restore shapes."""
    from search_engine_core_spark.streaming.incremental import _segment_ids

    empty = frozenset()
    commits: dict[int, float | None] = {}
    live: dict[int, tuple[frozenset, frozenset]] = {}
    retired: list[tuple[int, int, frozenset, frozenset]] = []
    expired: set[int] = set()
    for ev in _load_events(index_dir):
        if ev["type"] == "commit":
            commits[ev["seg"]] = ev["ts"]
            live[ev["seg"]] = (frozenset([ev["seg"]]), empty)
        elif ev["type"] == "merge":
            run = [int(s) for s in ev["run"]]
            members = [live.get(s, (frozenset([s]), empty)) for s in run]
            cov = frozenset().union(*(m[0] for m in members))
            need = frozenset().union(*(m[1] for m in members)) | frozenset(
                int(x) for x in ev.get("pruned_against", [])
            )
            if ev.get("retained"):
                for s in run:
                    c, n = live.get(s, (frozenset([s]), empty))
                    retired.append((ev["gen"], s, c, n))
            for s in run:
                live.pop(s, None)
            live[int(ev["new_seg"])] = (cov, need)
        elif ev["type"] == "expire":
            expired.update(int(g) for g in ev["gens"])
    # reconcile with the fs: segments the log never saw self-cover
    fs_segs = set(_segment_ids(index_dir))
    for s in fs_segs:
        if s not in live:
            live[s] = (frozenset([s]), empty)
        for c in live[s][0]:
            commits.setdefault(c, None)
    # a live entry whose dir is gone (log ahead of fs — shouldn't happen
    # under single-writer, but never trust a manifest over the fs)
    live = {s: cn for s, cn in live.items() if s in fs_segs}
    return commits, live, retired, expired


def snapshots(index_dir: str) -> list[dict]:
    """List every commit with its ts and whether it is restorable right
    now (covering trees all present and no later main rewrite)."""
    commits, _, _, _ = _replay(index_dir)
    out = []
    for s in sorted(commits):
        try:
            resolve_cover(index_dir, s)
            ok = True
        except (KeyError, FileNotFoundError, RuntimeError):
            ok = False
        out.append({"snap": s, "ts": commits[s], "restorable": ok})
    return out


def resolve_cover(index_dir: str, snap: int) -> list[tuple[str, int, frozenset, frozenset]]:
    """The covering set of physical trees for commit ``snap`` as
    ``(location, seg, coverage, need)`` tuples, location = ``"live"`` or
    ``"gen=<G>"``. Raises KeyError for an unknown commit, RuntimeError
    when a needed tree was merged without retention, prune-tainted, or
    expired, and checks the delete barrier from the index's own
    lineage."""
    commits, live, retired, expired = _replay(index_dir)
    if snap not in commits:
        raise KeyError(
            f"unknown snapshot {snap}: commits on record are {sorted(commits)}"
        )
    _check_delete_barrier(index_dir, commits[snap])
    target = frozenset(c for c in commits if c <= snap)
    # candidates whose coverage fits in the target AND whose prune taint
    # is satisfied by it (the docs a pruned merge dropped are supplied
    # by later trees only when those trees are in the snapshot too)
    cands: list[tuple[frozenset, frozenset, str, int]] = [
        (cov, need, "live", s)
        for s, (cov, need) in live.items()
        if cov <= target and need <= target
    ] + [
        (cov, need, f"gen={g}", s)
        for g, s, cov, need in retired
        if g not in expired and cov <= target and need <= target
        # never trust the manifest over the fs (a crash inside an old
        # expire_retired, or manual cleanup, can drop trees the log
        # still lists): a retired tree must actually be on disk
        and os.path.isdir(
            f"{index_dir}/segments/_retired/gen={g}/postings/seg={s}"
        )
    ]
    remaining = set(target)
    chosen: list[tuple[str, int, frozenset, frozenset]] = []
    while remaining:
        m = max(remaining)
        # the tree holding commit m with the largest in-target coverage;
        # live preferred on ties (fewer, newer dirs)
        best = None
        for cov, need, loc, s in cands:
            if m in cov and cov <= frozenset(remaining):
                key = (len(cov), loc == "live")
                if best is None or key > best[0]:
                    best = (key, cov, need, loc, s)
        if best is None:
            raise RuntimeError(
                f"snapshot {snap} is not restorable: commit {m} was folded "
                "into a later segment by a merge without retain=True (or "
                "prune-tainted against segments outside the snapshot, or "
                "its retired generation was expired) — pass retain=True to "
                "merge_segments / maybe_compact to keep history restorable"
            )
        _, cov, need, loc, s = best
        chosen.append((loc, s, cov, need))
        remaining -= cov
    return chosen


def _check_delete_barrier(index_dir: str, commit_ts: float | None) -> None:
    """Row-level deletes rewrite main in place, so any snapshot older
    than the newest ``delete`` lineage row cannot be reconstructed (its
    main tree is gone). Lineage is read with pyarrow — restore stays a
    pure metadata operation, no Spark jobs."""
    ckpt = f"{index_dir}/_checkpoint"
    if not os.path.isdir(ckpt):
        return
    try:
        import pyarrow.dataset as ds

        tbl = ds.dataset(ckpt, format="parquet").to_table(
            columns=["stage", "updated_at"]
        )
    except Exception:
        return  # unreadable lineage never blocks a restore
    import datetime as _dt

    stages = tbl["stage"].to_pylist()
    times = tbl["updated_at"].to_pylist()
    # Spark writes lineage timestamps under a UTC session; pyarrow hands
    # naive datetimes back — interpret them as UTC explicitly, never via
    # the host's local timezone (naive .timestamp() would skew the
    # barrier by the host's UTC offset against the time.time() commit ts)
    dels = [
        (t.replace(tzinfo=_dt.timezone.utc) if t.tzinfo is None else t)
        .timestamp()
        for s, t in zip(stages, times)
        if s == "delete" and t
    ]
    if not dels:
        return
    barrier = max(dels)
    if commit_ts is None:
        # fs-derived commit (pre-manifest index or a crash before the
        # commit event append): its age is unknowable, so with any
        # delete on record the contract is refuse, never resurrect
        raise RuntimeError(
            "index has row-level delete lineage and this commit's "
            "timestamp is unknown (filesystem-derived, no manifest "
            "event) — refusing to restore rather than risk pairing a "
            "post-delete main tree with pre-delete segments"
        )
    if barrier > commit_ts:
        raise RuntimeError(
            "index main tree was rewritten by a row-level delete after this "
            "snapshot's commit — the snapshot is unrestorable (time travel "
            "covers the segment history; deletes and major compactions are "
            "history barriers, as documented)"
        )


def _link_tree(src: str, dst: str) -> None:
    """Recreate ``src`` at ``dst`` with hardlinks per file (copy
    fallback across devices) — metadata-only on one filesystem."""
    for dirpath, _dirnames, files in os.walk(src):
        rel = os.path.relpath(dirpath, src)
        out = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(out, exist_ok=True)
        for f in files:
            s, d = os.path.join(dirpath, f), os.path.join(out, f)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


def restore_snapshot(index_dir: str, snap: int, out_dir: str) -> str:
    """Materialize "the index as of commit ``snap``" at ``out_dir`` and
    return it. Main artifacts (docs/stats/dfreq/postings/positions/
    lineage) hardlink as-is — they are immutable between majors and
    deletes, both of which barrier the restore — plus the covering
    segment trees under their ORIGINAL seg ids (coverages are disjoint,
    so latest-wins precedence is preserved verbatim). The live delta is
    level-0, uncommitted by definition, and never part of a snapshot.
    The result is a normal index directory: open it with
    :class:`~search_engine_core_spark.streaming.incremental.DeltaSearchEngine`
    (or IndexSearchEngine when ``snap`` predates all segments), validate
    it with ``sources.validate`` — nothing downstream knows it is a
    snapshot."""
    cover = resolve_cover(index_dir, snap)
    if os.path.exists(out_dir) and os.listdir(out_dir):
        raise FileExistsError(f"restore target {out_dir} is not empty")
    os.makedirs(out_dir, exist_ok=True)
    for artifact in ("docs", "stats", "dfreq", "postings", "positions",
                     "_checkpoint"):
        src = f"{index_dir}/{artifact}"
        if os.path.isdir(src):
            _link_tree(src, f"{out_dir}/{artifact}")
    for artifact in ("postings", "docs", "positions"):
        for loc, s, _cov, _need in cover:
            src = (
                f"{index_dir}/segments/{artifact}/seg={s}"
                if loc == "live"
                else f"{index_dir}/segments/_retired/{loc}/{artifact}/seg={s}"
            )
            if os.path.isdir(src):
                _link_tree(src, f"{out_dir}/segments/{artifact}/seg={s}")
    # the restored dir gets its own event log: commit rows for the
    # target set plus synthetic merge rows reconstructing each linked
    # multi-commit tree, so the restored dir is itself snapshot-listable
    # and further restorable without the parent's manifest
    commits, _, _, _ = _replay(index_dir)
    events: list[dict] = [
        {"type": "commit", "seg": c, "ts": commits[c]}
        for c in sorted(c for c in commits if c <= snap)
    ]
    for i, (_loc, s, cov, need) in enumerate(
        sorted(cover, key=lambda t: t[1])
    ):
        if len(cov) > 1:
            events.append(
                {"type": "merge", "gen": -(i + 1), "run": sorted(cov),
                 "new_seg": s, "retained": False,
                 "pruned_against": sorted(need), "ts": commits.get(snap)}
            )
    os.makedirs(f"{out_dir}/segments", exist_ok=True)
    with open(_manifest_path(out_dir), "w") as fh:
        json.dump(events, fh)
    return out_dir


def expire_retired(index_dir: str, gens: list[int] | None = None) -> list[int]:
    """Drop retired generations (default: all) — Iceberg's
    ``expireSnapshots``: storage is reclaimed, and every snapshot whose
    cover needed those trees flips to unrestorable (``snapshots()``
    reports it). Returns the gens actually removed."""
    root = f"{index_dir}/segments/_retired"
    present = (
        [int(d.split("=", 1)[1]) for d in os.listdir(root) if d.startswith("gen=")]
        if os.path.isdir(root)
        else []
    )
    doomed = sorted(present if gens is None else [g for g in gens if g in present])
    # log BEFORE deleting: a crash between the two leaves dirs on disk
    # but already marked expired (restores refuse, storage re-reclaimed
    # by a re-run) — the reverse order would leave the manifest claiming
    # restorability over half-deleted trees, which restore_snapshot's
    # per-dir guards would then silently skip
    if doomed:
        append_event(
            index_dir, {"type": "expire", "gens": doomed, "ts": time.time()}
        )
    for g in doomed:
        shutil.rmtree(f"{root}/gen={g}", ignore_errors=True)
    return doomed
