"""Varbyte codec: roundtrip goldens + property tests (hypothesis)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_core_spark.functions.varbyte import (
    encode_doc_gaps,
    unbias,
    vb_decode,
    vb_encode,
)


def test_empty():
    assert vb_encode(np.empty(0, np.uint64)) == b""
    assert vb_decode(b"").size == 0


def test_small_values_one_byte_each():
    v = np.array([0, 1, 127], dtype=np.uint64)
    enc = vb_encode(v)
    assert len(enc) == 3
    assert (vb_decode(enc) == v).all()


def test_boundaries():
    v = np.array([127, 128, 16383, 16384, 2**63, 2**64 - 1], dtype=np.uint64)
    assert (vb_decode(vb_encode(v)) == v).all()


def test_slice_decode():
    v = np.arange(1000, dtype=np.uint64) * 1000
    enc = vb_encode(v)
    # decode a middle slice given its byte offset
    prefix = vb_encode(v[:100])
    out = vb_decode(enc, offset=len(prefix), count=50)
    assert (out == v[100:150]).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_roundtrip_property(xs):
    v = np.array(xs, dtype=np.uint64)
    assert (vb_decode(vb_encode(v)) == v).all()


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=300)
)
def test_doc_gap_roundtrip(ids):
    sorted_ids = np.array(sorted(set(ids)), dtype=np.int64)
    u, gaps = encode_doc_gaps(sorted_ids)
    dec = vb_decode(vb_encode(gaps))
    recon = unbias(np.cumsum(dec, dtype=np.uint64))
    assert (recon == sorted_ids).all()
