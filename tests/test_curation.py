"""Curation pipeline composition: curate / curation_report / curation_funnel.

The rule math (C4, span dedup, Gopher, PII) is twin-tested in
test_c4_pii.py / test_gopher.py; what this file pins is the COMPOSITION:
the report's per-rule attribution must replay the sequential pipeline
exactly (same survivors, same texts), and the funnel must count what the
stages actually did.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_core_spark.functions.c4 import c4_filter
from search_engine_core_spark.functions.gopher import gopher_filter
from search_engine_core_spark.functions.pii import redact_pii
from search_engine_core_spark.operators.curation import (
    curate,
    curation_funnel,
    curation_report,
)
from search_engine_core_spark.operators.spans import dedup_three_sentence_spans

# A tiny corpus where every stage earns its keep. Sentences carry the
# required stopwords and >=3-char mean word length so survivors clear the
# (loosened) Gopher gates.
SHARED = (
    "The frontier drains politely and the queue stays warm. "
    "The robots rules gate the fetch and the delay holds. "
    "The scores rank the results and the pages come back."
)
DOCS = {
    # 0: survives everything
    0: SHARED + " The extra tail sentence keeps the doc around afterwards.",
    # 1: duplicated span -> loses it to doc 0, remainder still passes
    # (long enough that no single 4-gram covers >16% of the chars)
    1: SHARED + " The second copy also carries the closing sentence here. "
    "The trailing words keep the count high and the filter content. "
    "The merge path folds the delta rows and the segments stay small. "
    "The query side reads the union and the ranks hold steady.",
    # 2: C4 reject (no terminal punctuation anywhere)
    2: "heading alpha\nheading beta\nheading gamma",
    # 3: passes C4 and quality, fails repetition: the same phrase inside
    # DISTINCT sentences (so span dedup leaves it untouched)
    3: "The spam phrase repeats badly in the first line. "
    "The spam phrase repeats badly in the second line. "
    "The spam phrase repeats badly in the third line. "
    "The spam phrase repeats badly in the fourth line.",
    # 4: passes C4 and Gopher, carries PII to redact
    4: "The contact address sits right here and the mail flows. "
    "Write alice@example.com for the details and the rest. "
    "The server lives at 10.1.2.3 and the uptime holds steady. "
    "The audit logs the counts and the redaction keeps the tokens. "
    "The final line closes the page and the test ends.",
    # 5: passes C4, fails Gopher quality (word count below the floor)
    5: "The doc ends. The end came. The rest left.",
}
C4_OPTS = {"min_sentences": 3}
GOPHER_OPTS = {"min_words": 12, "min_required_stopwords": 1}


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(list(DOCS.items()), "doc_id int, text string")


@pytest.fixture(scope="module")
def report_rows(corpus):
    rep = curation_report(
        corpus, "text", "doc_id", c4_opts=C4_OPTS, gopher_opts=GOPHER_OPTS
    )
    return {r["doc_id"]: r for r in rep.collect()}


def _sequential(corpus):
    """The stage-by-stage pipeline curate() promises to equal."""
    c4 = c4_filter(corpus, "text", **C4_OPTS)
    deduped = dedup_three_sentence_spans(c4, "text", "doc_id")
    kept = gopher_filter(deduped, "text", **GOPHER_OPTS)
    return c4, deduped, kept.withColumn("text", redact_pii("text"))


def test_curate_equals_sequential(corpus):
    got = {r["doc_id"]: r["text"] for r in curate(
        corpus, "text", "doc_id", c4_opts=C4_OPTS, gopher_opts=GOPHER_OPTS
    ).collect()}
    want = {r["doc_id"]: r["text"] for r in _sequential(corpus)[2].collect()}
    assert got == want
    assert set(got) == {0, 1, 4}


def test_report_replays_pipeline(corpus, report_rows):
    """report.filter(kept) carries exactly curate()'s rows and texts."""
    got = {i: r["text_redacted"] for i, r in report_rows.items() if r["kept"]}
    want = {r["doc_id"]: r["text"] for r in curate(
        corpus, "text", "doc_id", c4_opts=C4_OPTS, gopher_opts=GOPHER_OPTS
    ).collect()}
    assert got == want


def test_report_attribution(report_rows):
    r = report_rows
    assert {i for i in r if r[i]["c4_pass"]} == {0, 1, 3, 4, 5}
    # doc 1 lost the shared span to doc 0 (global min id wins)
    assert r[1]["span_changed"] and not r[0]["span_changed"]
    assert "frontier" not in r[1]["text_deduped"]
    assert "frontier" in r[0]["text_deduped"]
    # each reject is attributed to the rule that killed it
    assert not r[3]["span_changed"]  # distinct sentences: no span losses
    assert r[3]["gopher_repetition_pass"] is False and r[3]["gopher_quality_pass"] is True
    assert r[5]["gopher_quality_pass"] is False
    # C4 rejects are never scored downstream (NULL, not False)
    assert r[2]["gopher_quality_pass"] is None
    assert r[2]["gopher_repetition_pass"] is None
    assert r[2]["pii"] is None and r[2]["text_redacted"] is None
    # PII counted pre-redaction, redacted in the kept text
    assert r[4]["pii"]["n_email"] == 1 and r[4]["pii"]["n_ipv4"] == 1
    assert "<EMAIL>" in r[4]["text_redacted"] and "<IP>" in r[4]["text_redacted"]


def test_funnel_counts(corpus):
    rep = curation_report(
        corpus, "text", "doc_id", c4_opts=C4_OPTS, gopher_opts=GOPHER_OPTS
    )
    row = curation_funnel(rep).collect()[0].asDict()
    c4, deduped, final = _sequential(corpus)
    changed = (
        deduped.alias("d")
        .join(c4.alias("c"), "doc_id")
        .filter(F.col("d.text") != F.col("c.text"))
        .count()
    )
    assert row["n_in"] == len(DOCS)
    assert row["n_c4"] == c4.count()
    assert row["n_span_changed"] == changed == 1
    assert row["n_kept"] == final.count() == 3
    assert row["n_gopher_quality"] == 4   # docs 0, 1, 3, 4
    # doc 5 also fails repetition: in a 42-char doc any single 4-gram
    # covers >16% of the chars — short docs trip the top-n-gram rules
    assert row["n_gopher_repetition"] == 3  # docs 0, 1, 4
    assert row["kept_n_email"] == 1 and row["kept_n_ipv4"] == 1
    assert row["kept_n_phone"] == 0


def test_unknown_gopher_option_rejected(corpus):
    with pytest.raises(TypeError, match="unknown thresholds"):
        curate(corpus, gopher_opts={"not_a_rule": 1})
    with pytest.raises(TypeError, match="unknown options"):
        curate(corpus, near_dup={"not_an_lsh_knob": 1})


# near-identical pair: sentences 2 and 5 each differ by one word, so NO
# three-sentence span is shared (span dedup leaves both intact) while
# 3-shingle Jaccard stays high enough for MinHash-LSH to pair them.
def _near_dup_docs():
    sents = [
        "The engine walks the frontier and the ranks follow the scores.",
        "The postings fold into the segments and the merges stay small.",
        "The {W} rides along the deltas and the reads keep the order.",
        "The queries fan over the buckets and the answers come back sorted.",
        "The lineage pins the builds and the resumes skip the done work.",
        "The {X} closes the loop and the metrics land in the funnel.",
    ]
    mk = lambda w, x: " ".join(s.format(W=w, X=x) for s in sents)
    return {
        6: mk("checkpoint", "report"),
        7: mk("snapshot", "summary"),
    }


NEAR_DUP_OPTS = {"n_perm": 8, "n_bands": 8}


@pytest.fixture(scope="module")
def near_corpus(spark):
    docs = dict(DOCS)
    docs.update(_near_dup_docs())
    return spark.createDataFrame(list(docs.items()), "doc_id int, text string")


def test_near_dup_stage(near_corpus):
    kept = {
        r["doc_id"]
        for r in curate(
            near_corpus, "text", "doc_id",
            c4_opts=C4_OPTS, gopher_opts=GOPHER_OPTS, near_dup=NEAR_DUP_OPTS,
        ).collect()
    }
    # the near-dup pair collapses to its min id; everything else as before
    assert kept == {0, 1, 4, 6}

    rep = curation_report(
        near_corpus, "text", "doc_id",
        c4_opts=C4_OPTS, gopher_opts=GOPHER_OPTS, near_dup=NEAR_DUP_OPTS,
    )
    rows = {r["doc_id"]: r for r in rep.collect()}
    # report parity with curate under the near-dup stage
    assert {i for i, r in rows.items() if r["kept"]} == kept
    # attribution: 7 dropped BY the near-dup stage (gates all green)
    assert rows[7]["gopher_quality_pass"] and rows[7]["gopher_repetition_pass"]
    assert rows[7]["near_dup_pass"] is False and rows[6]["near_dup_pass"] is True
    # neither lost a span to the other (no shared three-sentence span)
    assert not rows[6]["span_changed"] and not rows[7]["span_changed"]
    # upstream rejects get NULL near-dup verdicts, not False
    assert rows[2]["near_dup_pass"] is None

    row = curation_funnel(rep).collect()[0].asDict()
    assert row["n_near_dup_dropped"] == 1
    assert row["n_kept"] == 4


# docs sharing ONE identical 23-token sentence (window=20 tiles it) but
# no three-sentence span — only the token-window stage can remove it
def _token_window_docs():
    shared = (
        "The shared boilerplate sentence carries the exact same twenty "
        "eight tokens and the run repeats across the pair of documents in full here."
    )
    a = (
        "The first page opens with the crawl and the queue fills early. "
        "The fetcher paces the hosts and the budget holds through the day. "
        + shared
        + " The index folds the pages and the segments land in order. "
        "The final line wraps the page and the tests stay green."
    )
    b = (
        "The second page starts with the parse and the links spill out. "
        "The ranker weighs the fields and the scores settle down fast. "
        + shared
        + " The merger walks the deltas and the compaction stays small. "
        "The closing words finish the doc and the suite stays calm."
    )
    return {8: a, 9: b}


def test_token_window_stage(spark):
    docs = dict(DOCS)
    docs.update(_token_window_docs())
    df = spark.createDataFrame(list(docs.items()), "doc_id int, text string")
    kept_rows = {
        r["doc_id"]: r["text"]
        for r in curate(
            df, "text", "doc_id",
            c4_opts=C4_OPTS, gopher_opts=GOPHER_OPTS, token_windows=20,
        ).collect()
    }
    # both token-window docs survive the gates; only the higher id lost
    # the shared run (kept at its global min-(id, idx) occurrence)
    assert {8, 9} <= set(kept_rows)
    assert "boilerplate" in kept_rows[8]
    assert "boilerplate" not in kept_rows[9]

    rep = curation_report(
        df, "text", "doc_id",
        c4_opts=C4_OPTS, gopher_opts=GOPHER_OPTS, token_windows=20,
    )
    rows = {r["doc_id"]: r for r in rep.collect()}
    # report parity with curate
    assert {i: r["text_redacted"] for i, r in rows.items() if r["kept"]} == kept_rows
    # attribution: token stage (not span stage) rewrote doc 9
    assert rows[9]["token_windows_changed"] and not rows[9]["span_changed"]
    assert not rows[8]["token_windows_changed"]
    # the span-stage doc (1) is attributed to spans, not token windows
    assert rows[1]["span_changed"] and not rows[1]["token_windows_changed"]

    row = curation_funnel(rep).collect()[0].asDict()
    assert row["n_token_windows_changed"] == 1
    assert row["n_span_changed"] == 1


def test_near_dup_requires_numeric_id(spark):
    """String ids fail FAST with guidance (schema check, before any job):
    the component resolver casts ids to long, so without the guard the
    whole gate pipeline would run and then die mid-job (ANSI) or
    silently keep every duplicate (non-ANSI NULL casts)."""
    df = spark.createDataFrame(
        [("u1", "One two. Three four. Five six.")], "doc_id string, text string"
    )
    with pytest.raises(TypeError, match="integral id"):
        curate(df, near_dup={})
    with pytest.raises(TypeError, match="integral id"):
        curation_report(df, near_dup={})


def test_funnel_near_dup_zero_not_null(spark):
    """An all-reject batch folds n_near_dup_dropped to 0 like every
    other counter, not NULL (the near_dup_pass column is all-NULL)."""
    df = spark.createDataFrame(
        [(1, "no terminal punctuation here"), (2, "another heading")],
        "doc_id int, text string",
    )
    rep = curation_report(df, c4_opts=C4_OPTS, gopher_opts=GOPHER_OPTS,
                          near_dup=NEAR_DUP_OPTS)
    row = curation_funnel(rep).collect()[0].asDict()
    assert row["n_kept"] == 0
    assert row["n_near_dup_dropped"] == 0


def test_funnel_has_no_near_dup_column_without_stage(corpus):
    rep = curation_report(corpus, c4_opts=C4_OPTS, gopher_opts=GOPHER_OPTS)
    row = curation_funnel(rep).collect()[0].asDict()
    assert "n_near_dup_dropped" not in row
    assert "near_dup_pass" not in rep.columns
