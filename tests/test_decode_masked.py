"""decode_masked_batch (the segmented-vectorized block-mask decoder, r2
VERDICT item 8) must agree value-for-value with the reference single-row
decoder ``decode_postings_row`` under full and random partial masks —
pure numpy/pandas, no Spark session needed."""

from __future__ import annotations

import numpy as np
import pandas as pd

from search_engine_core_spark.operators.postings import (
    _encode_one,
    decode_masked_batch,
    decode_postings_row,
)


def _batch(rng, n_rows=7):
    rows = []
    for term_i in range(n_rows):
        n = int(rng.integers(1, 700))
        vals = rng.integers(-(10**12), 10**12, size=n * 3, dtype=np.int64)
        ids = np.sort(np.unique(vals)[:n])
        tfs = rng.integers(1, 50, size=ids.size).astype(np.uint64)
        row = _encode_one(ids, tfs)
        row["term"] = f"t{term_i}"
        row["shard"] = 0
        rows.append(row)
    # singleton block: zero gap bytes exercises the empty-range paths
    r1 = _encode_one(np.array([42], dtype=np.int64), np.array([3], dtype=np.uint64))
    r1["term"] = "single"
    r1["shard"] = 0
    rows.append(r1)
    return pd.DataFrame(rows)


def test_full_mask_equals_row_decoder():
    rng = np.random.default_rng(0)
    pdf = _batch(rng)
    ids_v, tfs_v, val_row = decode_masked_batch(
        pdf, lambda bf, bl, bm, rob: np.ones(bf.size, bool)
    )
    exp_ids, exp_tfs, exp_row = [], [], []
    for i, row in enumerate(pdf.to_dict("records")):
        a, b = decode_postings_row(row)
        exp_ids.append(a)
        exp_tfs.append(b)
        exp_row.append(np.repeat(i, a.size))
    assert np.array_equal(ids_v, np.concatenate(exp_ids))
    assert np.array_equal(tfs_v, np.concatenate(exp_tfs))
    assert np.array_equal(val_row, np.concatenate(exp_row))


def test_random_partial_masks_equal_row_decoder():
    rng = np.random.default_rng(1)
    pdf = _batch(rng)
    for _ in range(8):
        holder = {}

        def mfn(bf, bl, bm, rob):
            m = rng.random(bf.size) < 0.4
            holder["m"] = m
            return m

        out = decode_masked_batch(pdf, mfn)
        m = holder["m"]
        off, eids, etfs = 0, [], []
        for row in pdf.to_dict("records"):
            nb = len(row["block_n"])
            sub = m[off : off + nb]
            off += nb
            if sub.any():
                a, b = decode_postings_row(row, block_mask=sub)
                eids.append(a)
                etfs.append(b)
        if out is None:
            assert not eids
            continue
        ids_v, tfs_v, _ = out
        assert np.array_equal(ids_v, np.concatenate(eids))
        assert np.array_equal(tfs_v, np.concatenate(etfs))


def test_empty_and_none_masks():
    rng = np.random.default_rng(2)
    pdf = _batch(rng, n_rows=2)
    assert decode_masked_batch(pdf, lambda bf, bl, bm, rob: np.zeros(bf.size, bool)) is None
    assert decode_masked_batch(pdf.iloc[0:0], lambda *a: None) is None
