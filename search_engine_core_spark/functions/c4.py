"""C4 line/document cleaning rules (Raffel et al. 2020, JMLR 21(140),
§2.2 — the public "Colossal Clean Crawled Corpus" heuristics, as also
reimplemented in TensorFlow-Datasets ``c4_utils`` and HuggingFace
DataTrove's ``C4QualityFilter``).

Complements :mod:`functions.gopher` (doc-level quality gates): C4 is the
line-level REWRITE step — it edits documents, not just drops them. The
reference engine's own cleaning is boilerplate stripping at HTML-parse
time (``src/crawler/ContentParser.cpp``, already ``functions/html.py``);
these rules are the corpus-curation layer the brief adds on top.

Paper rules implemented (same defaults):

* keep a line only if it ends in terminal punctuation (``. ! ? "``),
* keep a line only if it has >= 3 words,
* drop any line containing the word "javascript" (case-insensitive),
* drop the whole page if, after cleaning, it has < 5 sentences,
* drop the page on any bad word (word-boundary match, caller-supplied
  list — the paper's LDNOOBW list is public; a tiny default stands in),
* drop the page if it contains "lorem ipsum" or a curly brace ``{``.

Scale shape: everything here is a pure per-document Catalyst column
expression (split / filter / exists / concat_ws) — no shuffle, no UDF,
map-side inside the parquet scan stage, same as the Gopher filters. The
corpus-LEVEL C4 step (discard all but one occurrence of any
three-sentence span) needs a shuffle by construction and lives in
``operators/spans.py``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_core_spark.functions.textprims import split_lines
from search_engine_core_spark.functions.textprims import strip_ws as _strip
from search_engine_core_spark.functions.textprims import text_or_empty as _text
from search_engine_core_spark.functions.textprims import ws_words

__all__ = [
    "C4_DEFAULT_BADWORDS",
    "C4_TERMINAL_PUNCT",
    "c4_clean_lines",
    "c4_doc_pass",
    "c4_filter",
    "sentence_split",
]

# Paper: period, exclamation mark, question mark, end quotation mark.
C4_TERMINAL_PUNCT = ['.', '!', '?', '"', '”']

# Stand-in for the paper's LDNOOBW list (public on GitHub but ~400
# entries; callers pass the full list). Word-boundary matched.
C4_DEFAULT_BADWORDS = ["fuck", "shit", "cunt", "nigger", "faggot"]

_JAVASCRIPT_RE = r"(?i)\bjavascript\b"
_LOREM_RE = r"(?i)lorem ipsum"
# Sentence boundary for counting/spans: terminal punct then whitespace.
_SENT_SPLIT_RE = r'(?<=[.!?"”])\s+'


def _line_pass(line: Column, min_words: int) -> Column:
    """One line survives C4: terminal punctuation, >= min_words words,
    no 'javascript'."""
    ends_ok = F.lit(False)
    for p in C4_TERMINAL_PUNCT:
        ends_ok = ends_ok | F.endswith(line, F.lit(p))
    n_words = F.size(ws_words(line))
    return (
        ends_ok
        & (n_words >= F.lit(min_words))
        & ~line.rlike(_JAVASCRIPT_RE)
    )


def c4_clean_lines(
    text: Column | str, min_words_per_line: int = 3, joiner: str = "\n"
) -> Column:
    """The document text rebuilt from only its C4-surviving lines
    (stripped, joined by ``joiner``). Lines split on newline runs."""
    # shared textprims splitter (strip-then-split ≡ the old inline
    # split-then-strip: boundary empties drop either way), so a
    # whitespace-semantics fix lands once in textprims
    kept = F.filter(
        split_lines(_text(text)),
        lambda l: _line_pass(l, min_words_per_line),
    )
    return F.array_join(kept, joiner)


def sentence_split(text: Column | str) -> Column:
    """array<string> of sentences — split after terminal punctuation +
    whitespace, stripped, empties dropped. The counting/span unit used
    by :func:`c4_doc_pass` and ``operators/spans.py`` (the paper does
    not pin a sentence splitter; TFDS c4_utils uses NLTK — this regex
    boundary is the deterministic, dependency-free stand-in and is
    documented as such)."""
    parts = F.split(_strip(_text(text)), _SENT_SPLIT_RE)
    stripped = F.transform(parts, lambda p: _strip(p))
    return F.filter(stripped, lambda p: F.length(p) > 0)


def c4_doc_pass(
    text: Column | str,
    min_sentences: int = 5,
    badwords: list[str] | None = None,
) -> Column:
    """Boolean: the (already line-cleaned) document survives the C4
    page-level rules."""
    t = _text(text)
    words = list(C4_DEFAULT_BADWORDS if badwords is None else badwords)
    bad = F.lit(False)
    if words:
        # escape each word: LDNOOBW-style lists carry regex metachars
        # ("c++", "a.s.s") that would otherwise break the Java pattern
        # or match any character; re.escape output is Java-compatible
        # (backslash-escaped ASCII punctuation). Anchor with (?<!\w)/
        # (?!\w) rather than \b: a \b after a trailing non-word char
        # ("c++", "a$$") demands a following WORD char, so such entries
        # could never match — the lookarounds are \b-equivalent for
        # plain words and actually enforceable for punctuated ones.
        alternation = "|".join(re.escape(w) for w in sorted(words))
        bad = t.rlike(r"(?i)(?<!\w)(?:" + alternation + r")(?!\w)")
    return (
        (F.size(sentence_split(t)) >= F.lit(min_sentences))
        & ~bad
        & ~t.rlike(_LOREM_RE)
        & ~t.contains("{")
    )


def c4_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    badwords: list[str] | None = None,
) -> DataFrame:
    """Line-clean ``text_col`` in place, then keep only pages passing
    the C4 document rules — one map-side stage, no shuffle. The
    corpus-level three-sentence-span dedup is a separate, genuinely
    distributed step: ``operators.spans.dedup_three_sentence_spans``.

    Plan shape (r6): the cleaned text and the page verdict are computed
    ONCE per row behind an ``explode(array(struct))`` barrier. The naive
    ``withColumn(clean).filter(doc_pass)`` let predicate pushdown inline
    the line-cleaner into every reference of the filter condition — five
    evaluation sites per row, and the whole tree is interpreted (no
    subexpression elimination under higher-order functions). A Generate
    node blocks that pushdown; measured 9.1 s -> 1.2 s on the 50k-doc
    bench corpus with row-identical output (guide §4.4's duplicated-
    evaluation trap, Catalyst-expression variant)."""
    from search_engine_core_spark.functions.textprims import bind_once

    cols = df.columns
    other = [c for c in cols if c != text_col]
    cleaned_and_pass = bind_once(
        c4_clean_lines(text_col, min_words_per_line=min_words_per_line),
        lambda t: F.struct(
            t.alias("t"),
            c4_doc_pass(t, min_sentences=min_sentences, badwords=badwords).alias("p"),
        ),
    )
    g = df.select(*other, F.explode(F.array(cleaned_and_pass)).alias("_c4"))
    return g.filter(F.col("_c4.p")).select(
        *[F.col("_c4.t").alias(text_col) if c == text_col else F.col(c) for c in cols]
    )
