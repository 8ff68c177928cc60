"""Gopher quality/repetition rules vs a pure-Python twin.

The twin recomputes every metric with the same definitions on raw
strings (the Spark side runs on xxhash64(ngram) structs — collision-free
on this test data, see the module docstring). Top-n-gram coverage is
compared as a VALUE (count x length of the best gram), which is
tie-insensitive: two grams tied on (count, coverage) yield the same
coverage whichever one is picked.
"""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from search_engine_core_spark.functions import gopher as G

# ---------------------------------------------------------------------------
# Pure-Python twin
# ---------------------------------------------------------------------------


def _words(t: str) -> list[str]:
    return t.split()


def _lines(t: str, para: bool = False) -> list[str]:
    parts = re.split(r"\n\s*\n" if para else r"\n+", t.strip())
    return [p.strip() for p in parts if p.strip()]


def _substr_count(t: str, sub: str) -> int:
    return (len(t) - len(t.replace(sub, ""))) // len(sub)


def _safe(num, den) -> float:
    return float(num) / float(den) if den > 0 else 0.0


def twin_quality(t: str | None) -> dict:
    t = t or ""
    ws = _words(t)
    ls = _lines(t)
    n_bullet = sum(1 for l in ls if any(l.startswith(b) for b in G.GOPHER_BULLETS))
    n_ell_end = sum(1 for l in ls if l.endswith("...") or l.endswith("…"))
    n_alpha = sum(1 for w in ws if re.search("[A-Za-z]", w))
    lc = [w.lower() for w in ws]
    n_stop = sum(1 for s in G.GOPHER_REQUIRED_STOPWORDS if s in lc)
    return {
        "n_words": len(ws),
        "mean_word_len": _safe(sum(len(w) for w in ws), len(ws)),
        "hash_word_ratio": _safe(_substr_count(t, "#"), len(ws)),
        "ellipsis_word_ratio": _safe(
            _substr_count(t, "...") + _substr_count(t, "…"), len(ws)
        ),
        "bullet_line_frac": _safe(n_bullet, len(ls)),
        "ellipsis_line_frac": _safe(n_ell_end, len(ls)),
        "alpha_word_frac": _safe(n_alpha, len(ws)),
        "n_required_stopwords": n_stop,
    }


def _dup_stats(elems: list[str]) -> tuple[int, int, int]:
    c = Counter(elems)
    dn = sum(k - 1 for k in c.values() if k > 1)
    dc = sum((k - 1) * len(e) for e, k in c.items() if k > 1)
    return len(elems), dn, dc


def _ngrams(ws: list[str], n: int) -> list[str]:
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


def twin_repetition(t: str | None) -> dict:
    t = t or ""
    total = len(t)
    ws = _words(t)
    ln, ldup, lchars = _dup_stats(_lines(t))
    pn, pdup, pchars = _dup_stats(_lines(t, para=True))
    out = {
        "dup_line_frac": _safe(ldup, ln),
        "dup_line_char_frac": _safe(lchars, total),
        "dup_para_frac": _safe(pdup, pn),
        "dup_para_char_frac": _safe(pchars, total),
    }
    for n in (2, 3, 4):
        c = Counter(_ngrams(ws, n))
        best = 0
        if c:
            top = max(c.values())
            best = max((k * len(g) for g, k in c.items() if k == top), default=0)
        out[f"top_{n}gram_char_frac"] = _safe(best, total)
    for n in range(5, 11):
        c = Counter(_ngrams(ws, n))
        rep = sum((k - 1) * len(g) for g, k in c.items() if k > 1)
        out[f"dup_{n}gram_char_frac"] = _safe(rep, total)
    return out


# ---------------------------------------------------------------------------
# Fixtures: handcrafted edges + seeded fuzz
# ---------------------------------------------------------------------------

GOOD_DOC = (
    "The crawler walks the frontier and ranks pages with care. "
    "Each page must have words that be common to the corpus, and that "
    "keeps the filter happy with plenty of variety in every line.\n"
    "A second paragraph talks about postings, scoring, and merges so the "
    "word count clears fifty with room to spare for the bounds check."
)

HANDCRAFTED = [
    None,
    "",
    "   \n\n  ",
    "one-liner",
    GOOD_DOC,
    "• bullet one\n• bullet two\n• bullet three\nplain line",
    "trailing dots...\nmore dots…\nclean line\nanother...",
    "### hash #heavy# doc # with many # marks",
    "repeat me\nrepeat me\nrepeat me\nunique line",
    "para a\n\npara a\n\npara b",
    "spam spam spam spam spam spam spam spam spam spam",
    "the quick brown fox jumps over the quick brown fox again and again",
    "tiny doc",
    "12345 67890 !!! $$$ %%%",
    "a b c d e f g h i j a b c d e f g h i j a b c d e f g h i j",
]


def _fuzz_docs(n_docs: int = 30, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    vocab = ["the", "and", "fox", "data", "spark", "index", "crawl", "of",
             "to", "be", "rank#", "dots...", "•item", "x"]
    docs = []
    for _ in range(n_docs):
        toks = [rng.choice(vocab) for _ in range(rng.randint(0, 120))]
        # inject repeats and newlines
        text_parts = []
        for i, w in enumerate(toks):
            text_parts.append(w)
            if rng.random() < 0.15:
                text_parts.append("\n" if rng.random() < 0.7 else "\n\n")
        docs.append(" ".join(text_parts))
    return docs


ALL_DOCS = HANDCRAFTED + _fuzz_docs()


@pytest.fixture(scope="module")
def gopher_df(spark):
    rows = [(i, t) for i, t in enumerate(ALL_DOCS)]
    return spark.createDataFrame(rows, "doc_id int, text string")


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_quality_signals_match_twin(gopher_df):
    got = {
        r["doc_id"]: r["s"].asDict()
        for r in gopher_df.select(
            "doc_id", G.gopher_quality_signals("text").alias("s")
        ).collect()
    }
    for i, t in enumerate(ALL_DOCS):
        want = twin_quality(t)
        for k, v in want.items():
            assert got[i][k] == pytest.approx(v, abs=1e-12), (i, k, t)


@pytest.mark.parametrize("impl", ["expr", "pandas"])
def test_repetition_signals_match_twin(gopher_df, impl):
    got = {
        r["doc_id"]: r["s"].asDict()
        for r in gopher_df.select(
            "doc_id", G.gopher_repetition_signals("text", impl=impl).alias("s")
        ).collect()
    }
    for i, t in enumerate(ALL_DOCS):
        want = twin_repetition(t)
        for k, v in want.items():
            assert got[i][k] == pytest.approx(v, abs=1e-12), (impl, i, k, t)


def test_pass_flags_and_filter(gopher_df):
    rows = {
        r["doc_id"]: (r["q"], r["rep"])
        for r in gopher_df.select(
            "doc_id",
            G.gopher_quality_pass("text").alias("q"),
            G.gopher_repetition_pass("text").alias("rep"),
        ).collect()
    }
    good_id = HANDCRAFTED.index(GOOD_DOC)
    assert rows[good_id] == (True, True)
    # spam doc: fails repetition (top-1-word... top-2gram "spam spam" covers
    # nearly all chars) and fails quality (word count < 50)
    spam_id = HANDCRAFTED.index("spam spam spam spam spam spam spam spam spam spam")
    assert rows[spam_id][0] is False
    assert rows[spam_id][1] is False
    # empty / None / whitespace docs never pass quality
    for i in (0, 1, 2):
        assert rows[i][0] is False

    kept = G.gopher_filter(gopher_df, "text").select("doc_id").collect()
    kept_ids = {r["doc_id"] for r in kept}
    assert kept_ids == {i for i, (q, rep) in rows.items() if q and rep}
    assert good_id in kept_ids
    # both impls keep exactly the same documents
    kept_expr = {
        r["doc_id"]
        for r in G.gopher_filter(gopher_df, "text", impl="expr").select("doc_id").collect()
    }
    assert kept_expr == kept_ids

    # threshold routing + unknown kwarg rejection
    loose = G.gopher_filter(gopher_df, "text", min_words=1, repetition=False)
    assert loose.count() > len(kept_ids)
    with pytest.raises(TypeError, match="unknown thresholds"):
        G.gopher_filter(gopher_df, "text", not_a_threshold=1)
    with pytest.raises(ValueError, match="unknown impl"):
        gopher_df.select(G.gopher_repetition_signals("text", impl="nope")).collect()
    # thresholds for n-gram sizes the signals never compute fail fast
    # with a clear message, not an unresolved-field AnalysisException
    with pytest.raises(ValueError, match="uncomputed n-gram sizes"):
        G.gopher_repetition_pass("text", dup_ngram_thresholds={11: 0.1})
    with pytest.raises(ValueError, match="uncomputed n-gram sizes"):
        G.gopher_repetition_pass("text", top_ngram_thresholds={5: 0.15})
    # a partial dict is the enforced set: only the given n are checked
    partial = gopher_df.select(
        G.gopher_repetition_pass("text", top_ngram_thresholds={2: 1.0},
                                 dup_ngram_thresholds={}).alias("p")
    ).collect()
    assert all(r["p"] is not None for r in partial)


def test_no_shuffle_no_python(gopher_df):
    """impl="expr": one map-side stage, no Exchange, no Python eval."""
    plan = (
        G.gopher_filter(gopher_df, "text", impl="expr")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # no UDF fallback crept in


def test_pandas_impl_one_arrow_eval_no_shuffle(gopher_df):
    """impl="pandas" (default): still shuffle-free, and the 13 struct-field
    references in the pass condition collapse to ONE ArrowEvalPython (the
    identical PythonUDF expressions are deduplicated at extraction) — the
    whole repetition side costs a single Arrow batch round-trip."""
    plan = (
        G.gopher_filter(gopher_df, "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1, plan
