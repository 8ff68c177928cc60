"""Property-based tests (hypothesis): the encoding and tokenization
invariants that everything else stands on. These complement the golden
tests — goldens pin known cases, properties sweep the input space."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_core_spark.functions.tokenizer import tokenize_py
from search_engine_core_spark.functions.varbyte import vb_decode, vb_encode
from search_engine_core_spark.functions.xxhash import spark_xxhash64_str


@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=200))
@settings(max_examples=200, deadline=None, derandomize=True)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    enc = vb_encode(arr)
    dec = vb_decode(enc, count=len(vals))
    assert dec.dtype == np.uint64
    assert np.array_equal(dec, arr)


@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None, derandomize=True)
def test_varbyte_concatenation_splits_cleanly(vals):
    """Encoding values independently and concatenating equals encoding the
    whole list — the property the blocked postings layout relies on when
    slicing per-block byte ranges out of one stream."""
    arr = np.array(vals, dtype=np.uint64)
    whole = vb_encode(arr)
    parts = b"".join(bytes(vb_encode(arr[i : i + 1])) for i in range(len(vals)))
    assert bytes(whole) == parts


@given(st.text(max_size=300))
@settings(max_examples=300, deadline=None, derandomize=True)
def test_tokenizer_canonical_properties(s):
    toks = tokenize_py(s)
    for t in toks:
        assert len(t) >= 2
        assert t == t.lower()
        assert all(c.isascii() and (c.isdigit() or "a" <= c <= "z") for c in t)
    # idempotent under re-tokenization of its own output
    assert tokenize_py(" ".join(toks)) == toks


@given(st.text(max_size=64))
@settings(max_examples=150, deadline=None, derandomize=True)
def test_xxhash_twin_is_deterministic_64bit(s):
    h1, h2 = spark_xxhash64_str(s), spark_xxhash64_str(s)
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)
