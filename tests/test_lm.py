"""CCNet perplexity operator: pure-Python parity, backoff on held-out
text, bucket semantics (exact vs approx), the filter's two threshold
modes, and the curation-pipeline integration (curate ≡ report.filter,
funnel attribution)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from search_engine_core_spark.operators import lm
from search_engine_core_spark.operators.curation import (
    curate,
    curation_funnel,
    curation_report,
)

ROWS = [
    (1, "aa bb aa cc"),
    (2, "bb aa"),
    (3, "zz"),  # one token -> no bigrams -> NULL ppl
    (4, "aa bb aa bb"),
]


def _py_lm(texts, k=0.5):
    toks = {i: t.split() for i, t in texts}
    uni = Counter(w for ts in toks.values() for w in ts)
    big = Counter(
        (ts[i], ts[i + 1]) for ts in toks.values() for i in range(len(ts) - 1)
    )
    v = len(uni)

    def lp(w1, w2):
        return math.log((big.get((w1, w2), 0) + k) / (uni.get(w1, 0) + k * v))

    def ppl(text):
        ts = text.split()
        bs = [(ts[i], ts[i + 1]) for i in range(len(ts) - 1)]
        if not bs:
            return None
        return math.exp(-sum(lp(*b) for b in bs) / len(bs))

    return ppl


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_perplexity_matches_pure_python(docs):
    got = {r["doc_id"]: r["ppl"] for r in lm.doc_perplexity(docs).collect()}
    ppl = _py_lm(ROWS)
    assert set(got) == {1, 2, 3, 4}
    for i, t in ROWS:
        exp = ppl(t)
        if exp is None:
            assert got[i] is None
        else:
            assert math.isclose(got[i], exp, rel_tol=1e-9), (i, got[i], exp)


def test_heldout_backoff(spark, docs):
    """Unseen bigrams and unseen contexts must score through the
    smoothed floor, matching the documented formula exactly."""
    held = spark.createDataFrame(
        [(10, "aa zz"), (11, "qq ww")],  # zz after aa: unseen bigram,
        "doc_id long, text string",     # qq: unseen context entirely
    )
    got = {
        r["doc_id"]: r["ppl"]
        for r in lm.doc_perplexity(held, train_docs=docs).collect()
    }
    toks = {i: t.split() for i, t in ROWS}
    uni = Counter(w for ts in toks.values() for w in ts)
    v, k = len(uni), 0.5
    exp10 = math.exp(-math.log(k / (uni["aa"] + k * v)))
    exp11 = math.exp(-math.log(k / (0 + k * v)))  # == v
    assert math.isclose(got[10], exp10, rel_tol=1e-9)
    assert math.isclose(got[11], exp11, rel_tol=1e-9)


def test_broadcast_lm_plan_parity(spark, docs):
    """broadcast_lm=True (occurrence-level scoring against an explicitly
    broadcast LM) must produce the same perplexities as the default
    collapsed plan — identical up to float summation order — on BOTH the
    self-trained and reference-corpus paths, and its physical plan must
    actually broadcast (no shuffle join on the skew-prone occurrence
    stream)."""
    base = {r["doc_id"]: r["ppl"] for r in lm.doc_perplexity(docs).collect()}
    fast_df = lm.doc_perplexity(docs, broadcast_lm=True)
    fast = {r["doc_id"]: r["ppl"] for r in fast_df.collect()}
    assert set(base) == set(fast)
    for i, b in base.items():
        if b is None:
            assert fast[i] is None
        else:
            assert math.isclose(fast[i], b, rel_tol=1e-9), (i, fast[i], b)
    plan = fast_df._sc._jvm.PythonSQLUtils.explainString(
        fast_df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    held = docs.sparkSession.createDataFrame(
        [(10, "aa zz"), (11, "qq ww")], "doc_id long, text string"
    )
    ref_base = {
        r["doc_id"]: r["ppl"]
        for r in lm.doc_perplexity(held, train_docs=docs).collect()
    }
    ref_fast = {
        r["doc_id"]: r["ppl"]
        for r in lm.doc_perplexity(held, train_docs=docs,
                                   broadcast_lm=True).collect()
    }
    for i, b in ref_base.items():
        assert math.isclose(ref_fast[i], b, rel_tol=1e-9), (i, ref_fast[i], b)


def test_buckets_exact_and_approx_agree(docs):
    ppl = lm.doc_perplexity(docs)
    exact = {r["doc_id"]: r["bucket"] for r in lm.perplexity_buckets(ppl, exact=True).collect()}
    approx = {r["doc_id"]: r["bucket"] for r in lm.perplexity_buckets(ppl).collect()}
    assert exact == approx
    # head = lowest perplexity (doc 2), tail = highest (doc 1), NULL ppl
    # -> NULL bucket (doc 3)
    assert exact[2] == "head" and exact[4] == "middle" and exact[1] == "tail"
    assert exact[3] is None
    with pytest.raises(ValueError, match="labels"):
        lm.perplexity_buckets(ppl, n_buckets=3, labels=("a", "b"))


def test_perplexity_filter_modes(docs):
    ppl = {r["doc_id"]: r["ppl"] for r in lm.doc_perplexity(docs).collect()}
    cut = ppl[4]  # keep docs 2 and 4 (ppl <= ppl[4]) plus the NULL doc 3
    kept = sorted(
        r["doc_id"] for r in lm.perplexity_filter(docs, max_ppl=cut).collect()
    )
    assert kept == [2, 3, 4]
    kept_frac = sorted(
        r["doc_id"]
        for r in lm.perplexity_filter(docs, keep_frac=0.67, approx=False).collect()
    )
    assert kept_frac == [2, 3, 4]
    with pytest.raises(ValueError, match="exactly one"):
        lm.perplexity_filter(docs)
    with pytest.raises(ValueError, match="exactly one"):
        lm.perplexity_filter(docs, max_ppl=1.0, keep_frac=0.5)
    with pytest.raises(ValueError, match="keep_frac"):
        lm.perplexity_filter(docs, keep_frac=1.5)


def test_all_null_ppl_gate_and_buckets(spark):
    """Every doc under two tokens → every ppl NULL: approxQuantile
    returns [] and both the keep_frac gate (approx=True) and the approx
    bucket path must degrade like their exact twins — everything passes
    / NULL buckets — instead of IndexError."""
    short = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "x")], "doc_id long, text string"
    )
    kept = sorted(
        r["doc_id"] for r in lm.perplexity_filter(short, keep_frac=0.5).collect()
    )
    assert kept == [1, 2, 3]
    got = lm.perplexity_buckets(lm.doc_perplexity(short)).collect()
    assert all(r["bucket"] is None for r in got) and len(got) == 3


C4_OPTS = {"min_sentences": 3}
GOPHER_OPTS = {"min_words": 12, "min_required_stopwords": 1}


@pytest.fixture(scope="module")
def ppl_corpus(spark):
    """Eight grammar-shaped docs sharing a small vocabulary (their
    bigrams recur corpus-wide → low perplexity) plus four gibberish
    docs built the same sentence shape — they clear C4 and Gopher (caps,
    terminal punctuation, stopwords, sane word lengths) but every
    content bigram is a singleton, so the corpus-trained LM puts them in
    the tail. Sentences are distinct per doc so span dedup never
    rewrites."""
    import random

    nouns = ["fox", "dog", "bird", "cat", "fish", "mouse", "horse", "sheep"]
    verbs = ["jumps", "runs", "sleeps", "eats", "walks", "sings", "waits", "reads"]
    rows = []
    for i in range(8):
        sents = [
            f"The {nouns[(i + j) % 8]} {verbs[(i + 2 * j) % 8]} over the "
            f"{nouns[(i + j + 1) % 8]} and the {nouns[(i + j + 2) % 8]} "
            f"{verbs[(i + j + 3) % 8]} near the {nouns[j]}."
            for j in range(4)
        ]
        rows.append((i, " ".join(sents)))
    rng = random.Random(7)

    def rnd():
        return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(6))

    for i in range(8, 12):
        sents = [
            f"The {rnd()} {rnd()} over the {rnd()} and the {rnd()} "
            f"{rnd()} near the {rnd()}."
            for _ in range(4)
        ]
        rows.append((i, " ".join(sents)))
    return rows


def test_curate_ppl_stage_matches_report(spark, ppl_corpus):
    df = spark.createDataFrame(ppl_corpus, "doc_id long, text string")
    opts = {"keep_frac": 0.7}
    kw = dict(c4_opts=dict(C4_OPTS), gopher_opts=dict(GOPHER_OPTS), ppl_opts=opts)
    kept = curate(df, **kw)
    rep = curation_report(df, **kw)
    kept_ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    rep_ids = sorted(
        r["doc_id"] for r in rep.filter("kept").select("doc_id").collect()
    )
    assert kept_ids == rep_ids
    # the tail IS the gibberish: keep_frac 0.7 over 8 low + 4 high lands
    # the cut between the populations, so exactly the gibberish drops
    dropped = {
        r["doc_id"]
        for r in rep.filter(F.col("ppl_pass") == F.lit(False)).collect()
    }
    assert dropped == {8, 9, 10, 11}
    assert kept_ids == list(range(8))
    fun = curation_funnel(rep).first()
    assert fun["n_ppl_dropped"] == 4
    assert fun["n_kept"] == 8


def test_funnel_has_no_ppl_column_without_stage(spark, ppl_corpus):
    df = spark.createDataFrame(ppl_corpus[:4], "doc_id long, text string")
    fun = curation_funnel(
        curation_report(df, c4_opts=dict(C4_OPTS), gopher_opts=dict(GOPHER_OPTS))
    )
    assert "n_ppl_dropped" not in fun.columns
