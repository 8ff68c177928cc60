"""C4 cleaning + span dedup + PII redaction vs pure-Python twins.

Twins recompute every rule with Python ``re`` on raw strings using the
documented definitions (identical regexes where the module promises
Java/Python-portable patterns; independent reimplementation of the
line/sentence/span logic)."""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from search_engine_core_spark.functions import c4 as C4
from search_engine_core_spark.functions import pii as PII
from search_engine_core_spark.operators.spans import (
    dedup_three_sentence_spans,
    dedup_token_windows,
)

# ---------------------------------------------------------------------------
# Pure-Python twins
# ---------------------------------------------------------------------------

_SENT_RE = re.compile(r'(?<=[.!?"”])\s+')


def twin_sentences(t: str | None) -> list[str]:
    parts = _SENT_RE.split((t or "").strip())
    return [p.strip() for p in parts if p.strip()]


def twin_line_pass(line: str, min_words: int = 3) -> bool:
    return (
        any(line.endswith(p) for p in C4.C4_TERMINAL_PUNCT)
        and len(line.split()) >= min_words
        and not re.search(r"(?i)\bjavascript\b", line)
    )


def twin_clean_lines(t: str | None, min_words: int = 3) -> str:
    lines = [l.strip() for l in re.split(r"\n+", t or "") if l.strip()]
    return "\n".join(l for l in lines if twin_line_pass(l, min_words))


def twin_doc_pass(t: str | None, min_sentences: int = 5, badwords=None) -> bool:
    t = t or ""
    words = C4.C4_DEFAULT_BADWORDS if badwords is None else badwords
    if words and re.search(
        r"(?i)(?<!\w)(?:" + "|".join(re.escape(w) for w in sorted(words)) + r")(?!\w)", t
    ):
        return False
    return (
        len(twin_sentences(t)) >= min_sentences
        and not re.search(r"(?i)lorem ipsum", t)
        and "{" not in t
    )


def twin_span_dedup(docs: dict[int, str], joiner: str = " ") -> dict[int, str]:
    """min-(id, idx) winner per normalized 3-sentence span; losers drop
    their 3 sentences (minus any sentence inside a winner — winner
    protection, mirroring the operator); affected docs rebuilt with `joiner`. Python \\W is
    Unicode-aware, matching the Spark side's (?U) flag; empty keys
    (all-punctuation spans) are exempt from dedup."""
    norm = lambda s: re.sub(r"[\W_]", "", s.lower())
    occurrences: dict[str, list[tuple[int, int]]] = {}
    sent_map = {i: twin_sentences(t) for i, t in docs.items()}
    for i, sents in sent_map.items():
        for j in range(len(sents) - 2):
            key = norm(" ".join(sents[j : j + 3]))
            if key:
                occurrences.setdefault(key, []).append((i, j))
    removed: dict[int, set[int]] = {}
    protected: dict[int, set[int]] = {}
    for occ in occurrences.values():
        if len(occ) < 2:
            continue
        keep = min(occ)
        protected.setdefault(keep[0], set()).update(
            (keep[1], keep[1] + 1, keep[1] + 2)
        )
        for i, j in occ:
            if (i, j) != keep:
                removed.setdefault(i, set()).update((j, j + 1, j + 2))
    for i in removed:
        removed[i] -= protected.get(i, set())
    out = {}
    for i, t in docs.items():
        if i not in removed:
            out[i] = t
        else:
            out[i] = joiner.join(
                s for j, s in enumerate(sent_map[i]) if j not in removed[i]
            )
    return out


def twin_redact(t: str | None, kinds=("email", "ipv4", "phone")) -> str:
    out = t or ""
    for k in kinds:
        pat, token = PII.PII_PATTERNS[k]
        out = re.sub(pat, token, out)
    return out


def twin_counts(t: str | None, kinds=("email", "ipv4", "phone")) -> dict:
    return {f"n_{k}": len(re.findall(PII.PII_PATTERNS[k][0], t or "")) for k in kinds}


# ---------------------------------------------------------------------------
# Fixtures
# ---------------------------------------------------------------------------

C4_DOCS = [
    None,
    "",
    "Too short.",
    # survives everything: 5 sentences, terminal punct, >=3 words
    "The engine builds an index. It ranks every page well. Queries "
    "return in order. The tests stay green. Scaling holds up too.",
    # javascript line dropped, rest survives
    "Please enable javascript now.\nThe engine builds an index. It ranks "
    "pages. Queries come back fast. The tests stay green. Scaling holds.",
    # no terminal punctuation -> all lines dropped
    "heading one\nheading two\nheading three",
    # lorem ipsum page
    "Lorem ipsum dolor sit amet. One more sentence here. And another one. "
    "Then a fourth sentence. Finally the fifth sentence.",
    # curly brace page
    "A code sample follows. It has braces { inside. More text here. "
    "Another sentence too. And one more to close.",
    # badword page
    "This page says shit once. It has five sentences though. Here is three. "
    "Here is four. Here is five.",
    'Quoted line ends well."\nOnly two words.\nShort one?\nThis line has '
    "enough words!\nNo terminal punct here\nAnd this final line is fine.",
]

PII_DOCS = [
    None,
    "",
    "Mail me at alice.smith+work@example.co.uk or bob@test.io today.",
    "Server at 192.168.1.254 and 8.8.8.8; version 10.1.2.300 is not an IP.",
    "Call +1 (415) 555-2671 or 212-555-0188; order 123456789 stays.",
    "Mixed: eve@ex.org, 127.0.0.1, (650) 555-1234, and 999.999.999.999.",
    # left-anchor regressions: a phone-shaped TAIL of a longer digit run
    # must not match (the lookbehind blocks mid-run starts)
    "order id 812345 678-9012 end",
    "version 4.415 555.1234 tag",
    "total 1234567-890-1234 sum",
    # right-anchor regressions: a phone-shaped PREFIX of a longer
    # separated id must not match either (the lookahead blocks it)
    "ref 555-123-4567-8901 end",
    "serial 555-123-4567.2 tag",
]


@pytest.fixture(scope="module")
def c4_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(C4_DOCS)], "doc_id int, text string"
    )


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(PII_DOCS)], "doc_id int, text string"
    )


# ---------------------------------------------------------------------------
# C4 line/doc rules
# ---------------------------------------------------------------------------


def test_c4_clean_lines_matches_twin(c4_df):
    got = {
        r["doc_id"]: r["c"]
        for r in c4_df.select("doc_id", C4.c4_clean_lines("text").alias("c")).collect()
    }
    for i, t in enumerate(C4_DOCS):
        assert got[i] == twin_clean_lines(t), (i, t)


def test_c4_doc_pass_matches_twin(c4_df):
    cleaned = c4_df.withColumn("text", C4.c4_clean_lines("text"))
    got = {
        r["doc_id"]: r["p"]
        for r in cleaned.select("doc_id", C4.c4_doc_pass("text").alias("p")).collect()
    }
    for i, t in enumerate(C4_DOCS):
        assert got[i] == twin_doc_pass(twin_clean_lines(t)), (i, t)
    # the clean survivor list is exactly what c4_filter returns
    kept = {r["doc_id"] for r in C4.c4_filter(c4_df, "text").select("doc_id").collect()}
    assert kept == {
        i for i, t in enumerate(C4_DOCS) if twin_doc_pass(twin_clean_lines(t))
    }
    assert 3 in kept and 4 in kept
    assert {5, 6, 7, 8} & kept == set()


def test_c4_sentence_split_matches_twin(c4_df):
    got = {
        r["doc_id"]: r["s"]
        for r in c4_df.select("doc_id", C4.sentence_split("text").alias("s")).collect()
    }
    for i, t in enumerate(C4_DOCS):
        assert got[i] == twin_sentences(t), (i, t)


def test_c4_filter_is_map_side(c4_df):
    plan = C4.c4_filter(c4_df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# Three-sentence-span dedup
# ---------------------------------------------------------------------------

SHARED = "The frontier drains politely. Robots rules gate every fetch. Scores rank the results."


def _span_corpus() -> dict[int, str]:
    rng = random.Random(11)
    vocab = ["index", "crawl", "rank", "merge", "shard", "probe", "score"]
    sent = lambda: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 6))).capitalize() + "."
    docs = {}
    for i in range(12):
        sents = [sent() for _ in range(rng.randint(0, 7))]
        if i in (2, 5, 9):  # plant the duplicated span at varying offsets
            pos = min(len(sents), i % 3)
            sents[pos:pos] = twin_sentences(SHARED)
        docs[i] = " ".join(sents)
    # an exact-duplicate pair of docs (every span duplicated)
    docs[12] = docs[13] = "One common page. It repeats fully. Same text twice. Extra tail sentence."
    return docs


def test_span_dedup_matches_twin(spark):
    docs = _span_corpus()
    df = spark.createDataFrame(list(docs.items()), "doc_id int, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_three_sentence_spans(df, "text", "doc_id").collect()
    }
    want = twin_span_dedup(docs)
    assert got == want
    # the planted span survives in exactly one doc
    norm = lambda s: re.sub(r"[\W_]", "", s.lower())
    hits = [i for i, t in got.items() if norm(SHARED) in norm(t)]
    assert hits == [2]
    # untouched docs are byte-identical (no whitespace renormalization)
    for i, t in docs.items():
        if i not in (5, 9, 13):
            assert got[i] == t, i


def twin_window_dedup(docs: dict[int, str], window: int, joiner: str = " ") -> dict[int, str]:
    """Exact-token analog of twin_span_dedup: min-(id, idx) winner per
    window-token run; losers drop their tokens minus winner-protected
    units."""
    occurrences: dict[str, list[tuple[int, int]]] = {}
    tok_map = {i: (t or "").split() for i, t in docs.items()}
    for i, toks in tok_map.items():
        for j in range(len(toks) - window + 1):
            occurrences.setdefault(" ".join(toks[j : j + window]), []).append((i, j))
    removed: dict[int, set[int]] = {}
    protected: dict[int, set[int]] = {}
    for occ in occurrences.values():
        if len(occ) < 2:
            continue
        keep = min(occ)
        protected.setdefault(keep[0], set()).update(
            range(keep[1], keep[1] + window)
        )
        for i, j in occ:
            if (i, j) != keep:
                removed.setdefault(i, set()).update(range(j, j + window))
    for i in removed:
        removed[i] -= protected.get(i, set())
    out = {}
    for i, t in docs.items():
        if i not in removed:
            out[i] = t
        else:
            out[i] = joiner.join(
                tok for j, tok in enumerate(tok_map[i]) if j not in removed[i]
            )
    return out


def _token_corpus(window: int) -> dict[int, str]:
    rng = random.Random(29)
    vocab = [f"w{k}" for k in range(40)]
    block = " ".join(rng.choice(vocab) for _ in range(window + 10))  # > window
    docs = {}
    for i in range(10):
        toks = [rng.choice(vocab) for _ in range(rng.randint(0, 120))]
        docs[i] = " ".join(toks)
    # plant the shared block mid-doc in 3 and 7 (and at offset 0 in 9)
    docs[3] = docs[3][: len(docs[3]) // 2] + " " + block + " " + docs[3][len(docs[3]) // 2 :]
    docs[7] = block + " tail tokens here"
    docs[9] = docs[9] + " " + block
    # an exact-duplicate pair longer than the window
    dup = " ".join(rng.choice(vocab) for _ in range(window + 5))
    docs[10] = dup
    docs[11] = dup
    # short docs (< window tokens) are never touched
    docs[12] = "tiny doc under the window"
    return docs


def test_span_dedup_non_latin_and_punct_spans(spark):
    """Regression: normalization must keep non-Latin identity (Unicode
    \\W, not [^a-z0-9]) and all-punctuation spans must be exempt — with
    the old ASCII normalization every span below keyed to '' and all
    but one doc was gutted."""
    docs = {
        1: "Первое предложение тут. Второе идёт следом. Третье закрывает абзац. Хвостовая фраза остаётся.",
        2: "Совсем другой текст начинается. Продолжение не совпадает вовсе. Третья фраза своя. Конец тоже другой.",
        3: "第一句在这里。 第二句跟着。 第三句收尾。",  # distinct CJK
        4: "!!! ??? ... !!! ??? ... !!! ??? ...",  # pure punctuation
        # a real cross-doc duplicate, to prove dedup still fires
        5: "Первое предложение тут. Второе идёт следом. Третье закрывает абзац. Другой хвост здесь живёт.",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id int, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_three_sentence_spans(df, "text", "doc_id").collect()
    }
    assert got == twin_span_dedup(docs)
    # distinct non-Latin docs untouched
    for i in (1, 2, 3, 4):
        assert got[i] == docs[i], i
    # the duplicated Cyrillic span was removed from the higher id
    assert "Первое предложение" not in got[5]
    assert "Другой хвост" in got[5]


def test_c4_badwords_with_regex_metachars(c4_df, spark):
    """Regression: badword lists carry regex metachars ('c++', 'a.s.s');
    they must be escaped, not interpolated raw (PatternSyntaxException /
    any-char matches)."""
    df = spark.createDataFrame(
        [
            (0, "The c++ compiler builds fast. It links well. It ships today. "
                "The tests pass. The docs exist."),
            (1, "The cXX compiler builds fast. It links well. It ships today. "
                "The tests pass. The docs exist."),
        ],
        "doc_id int, text string",
    )
    kept = {
        r["doc_id"]
        for r in C4.c4_filter(df, "text", badwords=["c++", "a.s.s"]).collect()
    }
    # lookaround anchoring makes punctuated entries enforceable: the
    # 'c++' page is dropped (a \b after '+' could never match), the
    # clean page survives
    assert kept == {1}
    # 'a.s.s' must NOT match 'apsqs' etc. via bare dots
    df2 = spark.createDataFrame(
        [(0, "The aXsXs word sits here. More text follows. And more. "
             "Then a fourth. Then the fifth.")],
        "doc_id int, text string",
    )
    assert C4.c4_filter(df2, "text", badwords=["a.s.s"]).count() == 1


def test_token_window_dedup_matches_twin(spark):
    window = 20
    docs = _token_corpus(window)
    df = spark.createDataFrame(list(docs.items()), "doc_id int, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_token_windows(df, "text", "doc_id", window=window).collect()
    }
    want = twin_window_dedup(docs, window)
    assert got == want
    # doc 7 (block at offset 0) and doc 9 lose the shared block to doc 3's
    # copy (the global min-(id, idx) occurrence)
    assert len(got[7].split()) < len(docs[7].split())
    assert len(got[9].split()) < len(docs[9].split())
    assert got[3] == docs[3]  # min-(id, idx) winner untouched
    # exact-duplicate pair: the higher id is gutted
    assert got[10] == docs[10] and got[11] == ""
    # sub-window docs byte-identical
    assert got[12] == docs[12]


def test_winner_protection_under_chained_overlap(spark):
    """Docs 'x y' / 'x y z' / 'y z' at window 2: removing doc B's losing
    'x y' must NOT destroy its winning 'y z' — every duplicated span is
    kept exactly once even when a loser overlaps another span's winner
    (the unprotected form left 'y z' surviving nowhere)."""
    docs = {1: "x y", 2: "x y z", 3: "y z"}
    df = spark.createDataFrame(list(docs.items()), "doc_id int, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_token_windows(df, "text", "doc_id", window=2).collect()
    }
    assert got == {1: "x y", 2: "y z", 3: ""}
    assert got == twin_window_dedup(docs, 2)


def test_token_window_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with pytest.raises(ValueError, match="window must be"):
        dedup_token_windows(df, window=1)


def test_span_dedup_noop_corpus(spark):
    docs = {1: "Alpha one. Beta two. Gamma three. Delta four.", 2: "Only two. Sentences here."}
    df = spark.createDataFrame(list(docs.items()), "doc_id int, text string")
    got = {r["doc_id"]: r["text"] for r in dedup_three_sentence_spans(df, "text", "doc_id").collect()}
    assert got == docs


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_pii_counts_match_twin(pii_df):
    got = {
        r["doc_id"]: r["c"].asDict()
        for r in pii_df.select("doc_id", PII.pii_counts("text").alias("c")).collect()
    }
    for i, t in enumerate(PII_DOCS):
        assert got[i] == twin_counts(t), (i, t)
    assert got[2]["n_email"] == 2
    assert got[3]["n_ipv4"] == 2  # 10.1.2.300 rejected by octet range
    assert got[4]["n_phone"] == 2
    for i in (6, 7, 8, 9, 10):
        assert got[i]["n_phone"] == 0, (i, PII_DOCS[i])


def test_pii_redaction_matches_twin(pii_df):
    got = {
        r["doc_id"]: r["t"]
        for r in pii_df.select("doc_id", PII.redact_pii("text").alias("t")).collect()
    }
    for i, t in enumerate(PII_DOCS):
        assert got[i] == twin_redact(t), (i, t)
    assert "<EMAIL>" in got[2] and "@" not in got[2]
    assert "999.999.999.999" in got[5]  # not a valid IPv4, untouched
    assert "order 123456789 stays" in got[4]


def test_pii_df_counts_reflect_original(pii_df):
    out = PII.redact_pii_df(pii_df, "text", with_counts=True)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2]["pii_counts"]["n_email"] == 2
    assert "<EMAIL>" in rows[2]["text"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
