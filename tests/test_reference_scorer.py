"""Reference-parity scorer: semantic assertions ported from
/root/reference/tests/scoring/test_search_scorer.cpp, plus Spark==Python
twin identity on the 4-doc corpus (FIXTURES.md §3)."""

from __future__ import annotations

import math

import pytest

from search_engine_core_spark.functions.reference_scorer import (
    ReferenceStats,
    ScoringConfig,
    score_results,
    score_results_py,
)
from search_engine_core_spark.functions.tokenizer import tokenize_py

DOCS = [
    {
        "url": "doc1",
        "title": "Introduction to Machine Learning",
        "content": "Machine learning is a subset of artificial intelligence that focuses on algorithms.",
        "description": "A comprehensive guide to ML",
        "domain": "example.com",
        "score": 1.0,
    },
    {
        "url": "doc2",
        "title": "Python Programming Tutorial",
        "content": "Python is a versatile programming language used for machine learning and data science.",
        "description": "Learn Python from scratch",
        "domain": "github.com",
        "score": 0.9,
    },
    {
        "url": "doc3",
        "title": "Deep Learning with Neural Networks",
        "content": "Deep learning uses artificial neural networks to model complex patterns in data.",
        "description": "Advanced ML techniques",
        "domain": "stackoverflow.com",
        "score": 0.8,
    },
    {
        "url": "doc4",
        "title": "Data Science Fundamentals",
        "content": "Data science combines statistics, programming, and domain knowledge.",
        "description": "Essential data science concepts",
        "domain": "medium.com",
        "score": 0.7,
    },
]


def by_url(rows):
    return {r["url"]: r for r in rows}


# ---- config defaults (test_search_scorer.cpp:49-80) ----
def test_config_defaults():
    c = ScoringConfig.default()
    assert (c.title_w, c.content_w, c.description_w, c.keywords_w) == (5.0, 1.0, 3.0, 4.0)
    assert (c.exact_match_boost, c.title_match_boost) == (2.0, 1.5)
    assert (c.k1, c.b) == (1.2, 0.75)
    th = ScoringConfig.title_heavy()
    assert (th.title_w, th.content_w, th.title_match_boost) == (10.0, 0.5, 2.0)
    ch = ScoringConfig.content_heavy()
    assert (ch.title_w, ch.content_w) == (3.0, 2.0)
    ba = ScoringConfig.balanced()
    assert (ba.title_w, ba.keywords_w, ba.exact_match_boost) == (3.0, 2.5, 1.5)


# ---- BM25 semantics (test_search_scorer.cpp:84-126) ----
def test_single_term_title_beats_content():
    # raw, un-normalized field scores: disable minmax to compare raw totals
    cfg = ScoringConfig(normalize=False)
    s = by_url(score_results_py(DOCS, "machine", cfg))
    assert "doc1" in s and "doc2" in s
    assert s["doc1"]["score"] > s["doc2"]["score"]
    assert s["doc1"]["title_score"] > 0
    assert s["doc1"]["matched_terms"] >= 1


def test_multi_term_doc1_top():
    ranked = score_results_py(DOCS, "machine learning", top_k=2)
    assert ranked[0]["url"] == "doc1"
    assert ranked[0]["matched_terms"] >= 2
    assert ranked[0]["coverage"] > 0.5


def test_exact_phrase_score():
    s = by_url(score_results_py(DOCS, '"machine learning"'))
    assert s["doc1"]["exact_score"] > 0


def test_title_weight_dominance():
    # test_search_scorer.cpp:209-226: title_w=100, content_w=1
    cfg = ScoringConfig(title_w=100.0, content_w=1.0)
    ranked = score_results_py(DOCS, "python", cfg, top_k=2)
    assert ranked[0]["url"] == "doc2"
    assert ranked[0]["title_score"] > ranked[0]["content_score"] * 50


def test_domain_authority_boost():
    s = by_url(score_results_py(DOCS, "python"))
    assert s["doc2"]["boost"] > 0  # github.com


def test_normalized_range():
    rows = score_results_py(DOCS, "learning data")
    scores = [r["score"] for r in rows]
    assert min(scores) >= 0.0 and max(scores) <= 1.0


def test_topk_sorted_desc():
    rows = score_results_py(DOCS, "machine learning data", top_k=2)
    assert len(rows) <= 2
    for a, b in zip(rows, rows[1:]):
        assert a["score"] >= b["score"]


# ---- utility goldens (test_search_scorer.cpp:276-302) ----
def test_term_extraction_golden():
    terms = tokenize_py("Machine Learning is AWESOME!")
    assert terms == ["machine", "learning", "is", "awesome"]


def test_tf_golden():
    from collections import Counter

    freqs = Counter(tokenize_py("the quick brown fox jumps over the lazy dog"))
    assert freqs["the"] == 2 and freqs["quick"] == 1 and freqs["fox"] == 1


def test_jaccard_golden():
    a = ["machine", "learning", "algorithm"]
    b = ["machine", "learning", "data"]
    sa, sb = set(a), set(b)
    assert abs(len(sa & sb) / len(sa | sb) - 0.5) < 0.01


# ---- corpus-stats update (SearchScorer.cpp:225-255) ----
def test_stats_from_docs():
    st = ReferenceStats.from_docs(DOCS)
    assert st.n_docs == 4
    assert st.dfreq["learning"] == 3  # doc1, doc2, doc3
    assert st.avgdl == pytest.approx(
        sum(len(d["content"]) + len(d["title"]) + len(d["description"]) for d in DOCS) / 4
    )


# ---- Spark twin identity ----
@pytest.mark.parametrize(
    "query,cfg,stats",
    [
        ("machine", None, None),
        ("machine learning", None, None),
        ('"machine learning" python', None, None),
        ("python", ScoringConfig.title_heavy(), None),
        ("learning data science", ScoringConfig(normalize=False), None),
        ("machine learning", None, "fit"),
    ],
)
def test_spark_matches_python(spark, query, cfg, stats):
    st = ReferenceStats.from_docs(DOCS) if stats == "fit" else None
    sdf = spark.createDataFrame(
        DOCS, "url string, title string, content string, description string, domain string, score double"
    )
    got = [r.asDict() for r in score_results(sdf, query, cfg, st).collect()]
    want = score_results_py(DOCS, query, cfg, st)
    assert [g["url"] for g in got] == [w["url"] for w in want]
    for g, w in zip(got, want):
        assert math.isclose(g["score"], w["score"], rel_tol=1e-9), (query, g, w)
        assert g["matched_terms"] == w["matched_terms"]
        assert math.isclose(g["exact_score"], w["exact_score"], rel_tol=1e-9)
