"""The segmented-vectorized chunk encoder must be byte-identical to the
straightforward per-group reference encoder (_encode_one)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from search_engine_core_spark.operators.postings import (
    _encode_chunk_arrow,
    _encode_one,
)


def _mk_table(groups: list[tuple[str, int, list[int], list[int]]], with_bucket=False):
    terms, shards, ids, tfs, buckets = [], [], [], [], []
    for term, shard, doc_ids, tf in groups:
        order = np.argsort(doc_ids)
        for i in order:
            terms.append(term)
            shards.append(shard)
            ids.append(doc_ids[i])
            tfs.append(tf[i])
            buckets.append(hash(term) % 4)
    cols = {
        "term": pa.array(terms),
        "shard": pa.array(np.array(shards, dtype=np.int32)),
        "doc_id": pa.array(np.array(ids, dtype=np.int64)),
        "tf": pa.array(np.array(tfs, dtype=np.int64)),
    }
    if with_bucket:
        cols["bucket"] = pa.array(np.array(buckets, dtype=np.int32))
    return pa.table(cols)


def _groups_for_test():
    rng = np.random.default_rng(7)
    groups = []
    for gi in range(50):
        size = int(rng.integers(1, 400))  # spans 1-4 blocks
        doc_ids = rng.choice(2**62, size=size, replace=False).astype(np.int64)
        doc_ids[rng.random(size) < 0.3] *= -1  # negative ids too
        doc_ids = np.unique(doc_ids)
        tf = rng.integers(1, 300, size=doc_ids.size).tolist()
        groups.append((f"t{gi:03d}", int(rng.integers(0, 3)), doc_ids.tolist(), tf))
    return groups


def test_vectorized_matches_reference():
    groups = _groups_for_test()
    tbl = _mk_table(groups)
    batch = _encode_chunk_arrow(tbl, with_bucket=False)
    got = {(r["term"], r["shard"]): r for r in batch.to_pylist()}
    # reference: per-group simple encoder
    for term, shard, doc_ids, tf in groups:
        order = np.argsort(np.array(doc_ids))
        ids_sorted = np.array(doc_ids, dtype=np.int64)[order]
        tf_sorted = np.array(tf, dtype=np.uint64)[order]
        want = _encode_one(ids_sorted, tf_sorted)
        g = got[(term, shard)]
        assert g["df"] == want["df"]
        assert g["max_tf"] == want["max_tf"]
        assert g["block_first"] == want["block_first"]
        assert g["block_last"] == want["block_last"]
        assert g["block_n"] == want["block_n"]
        assert g["block_gap_off"] == want["block_gap_off"]
        assert g["block_tf_off"] == want["block_tf_off"]
        assert g["block_max_tf"] == want["block_max_tf"]
        assert bytes(g["doc_gaps"]) == want["doc_gaps"]
        assert bytes(g["tfs"]) == want["tfs"]


def test_vectorized_single_row_group():
    tbl = _mk_table([("solo", 0, [42], [7])])
    batch = _encode_chunk_arrow(tbl, with_bucket=False)
    row = batch.to_pylist()[0]
    assert row["df"] == 1 and row["block_first"] == [42] and row["block_n"] == [1]
