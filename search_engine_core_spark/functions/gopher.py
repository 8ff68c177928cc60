"""Gopher-rule document quality + repetition filters.

The standard web-corpus filtering rules from Rae et al. 2021, "Scaling
Language Models: Methods, Analysis & Insights from Training Gopher"
(arXiv:2112.11446, Appendix A — the MassiveWeb quality/repetition
heuristics), as publicly reimplemented in HuggingFace DataTrove and
NVIDIA NeMo Curator. Like ``operators/sampling.py`` and
``operators/components.py`` this is training-data-pipeline surface the
brief adds beyond reference parity (the reference's own quality signal is
the single min(1, chars/10k) score, ``src/storage/ContentStorage.cpp:
200-204`` — already ``text_quality.content_quality``).

Scale shape: every metric is computable as a PURE per-document Catalyst
column expression (split / array_sort / array_distinct / transform /
aggregate) — no shuffle ever, map-side inside the parquet scan stage.
BUT the repetition metrics lean on higher-order array aggregates with
struct accumulators, which Catalyst does NOT whole-stage-codegen: they
run on the interpreted expression evaluator, measured at ~8 ms/doc-core
on ~50-word docs (131.2 s for 500k docs on 32 cores). The same metrics
as an Arrow-batched pandas UDF measure 6.6 s on the identical input —
**20x faster** — so ``impl="pandas"`` is the default for the repetition
side; ``impl="expr"`` keeps the all-JVM shuffle-free twin (identical
output, pinned in tests) for plans that must stay Python-free. The
QUALITY metrics have no aggregate-heavy shape (6.7 s expr at 500k) and
stay pure-expression. Both impls are one map stage — the choice is a
constant factor, not a scale shape. The expr path's n-gram statistics
never materialize a per-document n-gram *string array* into the
aggregation state: each n-gram collapses to a ``struct(xxhash64, length)``
immediately, so the per-row working set is 12 bytes per n-gram instead
of a near-copy of the document per n (hash collisions would only
*under*-count duplicate chars by one n-gram's length; at 64 bits the
per-document collision odds are negligible and the behavior is
documented here rather than silent; the pandas impl compares raw
strings — collision-free).

Documented deviations from the paper/DataTrove (both are driven by
determinism — a distributed engine cannot depend on Python dict
insertion order):

* top-n-gram selection (n=2..4): the paper takes "the most
  frequently-occurring n-gram"; ``Counter.most_common`` breaks count
  ties by first-seen position, which is order-dependent. Here ties on
  count break by larger character coverage (count x length), then by
  smaller hash — a pure function of the document text.
* duplicate-n-gram character fraction (n=5..10): DataTrove counts
  non-overlapping repeats via a sequential skip scan; this implementation
  counts every occurrence beyond the first (overlap-permissive), an
  upper bound of the skip-scan number. Thresholds keep the paper's
  values; callers comparing against DataTrove output should expect this
  fraction to read slightly higher on pathologically self-repeating
  docs.
* line/paragraph duplicate fractions use DataTrove's
  occurrences-beyond-first counting exactly (elements and characters).
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "GOPHER_REQUIRED_STOPWORDS",
    "GOPHER_BULLETS",
    "gopher_quality_signals",
    "gopher_quality_pass",
    "gopher_repetition_signals",
    "gopher_repetition_pass",
    "gopher_filter",
    "split_gopher_thresholds",
]

# Appendix A: "contains at least two of the following English words"
GOPHER_REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# Bullet glyphs checked at line starts (DataTrove's set plus ASCII list
# markers).
GOPHER_BULLETS = ["•", "‣", "◦", "·", "-", "*"]

_TOP_NGRAM_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
_DUP_NGRAM_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


from search_engine_core_spark.functions.textprims import (  # noqa: E402
    split_lines as _lines,
)
from search_engine_core_spark.functions.textprims import (  # noqa: E402
    text_or_empty as _text,
)
from search_engine_core_spark.functions.textprims import (  # noqa: E402
    ws_words as _words,
)
from search_engine_core_spark.functions.textprims import (  # noqa: E402
    bind_once as _bind_once,
)


def _safe_ratio(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
        F.lit(0.0)
    )


def _substr_count(text: Column, sub: str) -> Column:
    """Occurrences of a literal substring, expression-side."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(sub), F.lit(""))))
        / F.lit(len(sub))
    ).cast("long")


# ---------------------------------------------------------------------------
# Quality rules (Appendix A "quality filtering")
# ---------------------------------------------------------------------------


def _quality_signals_of(p: Column) -> Column:
    """Signals struct from a bound (t, w, l) payload — every reference
    to the word/line arrays is an attribute read, never a re-split."""
    t, words, lines = p["t"], p["w"], p["l"]
    n_words = F.size(words)
    total_word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_lines = F.size(lines)

    # NB: higher-order F.filter dispatches on the lambda's arity, so the
    # predicate must take exactly one parameter (no default-arg closures).
    def _starts_with_bullet(l: Column) -> Column:
        cond = F.lit(False)
        for b in GOPHER_BULLETS:
            cond = cond | F.startswith(l, F.lit(b))
        return cond

    n_bullet = F.size(F.filter(lines, _starts_with_bullet))
    n_ellipsis_end = F.size(
        F.filter(lines, lambda l: F.endswith(l, F.lit("...")) | F.endswith(l, F.lit("…")))
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))

    def _stop_count(wlc: Column) -> Column:
        n_stop = None
        for s in GOPHER_REQUIRED_STOPWORDS:
            hit = F.array_contains(wlc, s).cast("int")
            n_stop = hit if n_stop is None else n_stop + hit
        return n_stop

    # bind the lowercased copy once: referenced inline, the 8 stopword
    # membership probes would each re-lowercase the whole word array
    n_stop = _bind_once(F.transform(words, lambda w: F.lower(w)), _stop_count)

    n_ellipsis = _substr_count(t, "...") + _substr_count(t, "…")
    return F.struct(
        n_words.alias("n_words"),
        _safe_ratio(total_word_chars, n_words).alias("mean_word_len"),
        _safe_ratio(_substr_count(t, "#"), n_words).alias("hash_word_ratio"),
        _safe_ratio(n_ellipsis, n_words).alias("ellipsis_word_ratio"),
        _safe_ratio(n_bullet, n_lines).alias("bullet_line_frac"),
        _safe_ratio(n_ellipsis_end, n_lines).alias("ellipsis_line_frac"),
        _safe_ratio(n_alpha, n_words).alias("alpha_word_frac"),
        n_stop.alias("n_required_stopwords"),
    )


def gopher_quality_signals(text: Column | str) -> Column:
    """struct of the raw Appendix-A quality metrics for one document:
    ``n_words``, ``mean_word_len``, ``hash_word_ratio``,
    ``ellipsis_word_ratio``, ``bullet_line_frac``, ``ellipsis_line_frac``,
    ``alpha_word_frac``, ``n_required_stopwords``.

    The word and line arrays are computed ONCE via ``bind_once``
    (r6): these higher-order trees run interpreted with no
    subexpression elimination, so inline references re-split the
    document at every metric (guide §4.4's duplicated-evaluation
    trap)."""
    t = _text(text)
    payload = F.struct(t.alias("t"), _words(t).alias("w"), _lines(t).alias("l"))
    return _bind_once(payload, _quality_signals_of)


def gopher_quality_pass(
    text: Column | str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_stopwords: int = 2,
) -> Column:
    """Boolean: the document survives every Appendix-A quality rule at
    the paper's thresholds (all overridable). The signals struct is
    bound once (r6) — referenced inline, the eight threshold checks
    would each re-evaluate the full signals tree (interpreted
    higher-order expressions get no subexpression elimination)."""
    return _bind_once(
        gopher_quality_signals(text),
        lambda s: (
            s["n_words"].between(min_words, max_words)
            & s["mean_word_len"].between(min_mean_word_len, max_mean_word_len)
            & (s["hash_word_ratio"] <= max_symbol_word_ratio)
            & (s["ellipsis_word_ratio"] <= max_symbol_word_ratio)
            & (s["bullet_line_frac"] <= max_bullet_line_frac)
            & (s["ellipsis_line_frac"] <= max_ellipsis_line_frac)
            & (s["alpha_word_frac"] >= min_alpha_word_frac)
            & (s["n_required_stopwords"] >= min_required_stopwords)
        ),
    )


# ---------------------------------------------------------------------------
# Repetition rules (Appendix A "repetition removal")
# ---------------------------------------------------------------------------


def _hl_pairs(elems: Column) -> Column:
    """array<struct(h,l)> — each element collapsed to (xxhash64, length).
    All duplicate accounting below runs on this 12-byte shape, never on
    the strings themselves (see module docstring)."""
    return F.transform(
        elems, lambda e: F.struct(F.xxhash64(e).alias("h"), F.length(e).alias("l"))
    )


def _dup_chars_scan(sorted_pairs: Column) -> Column:
    """Sum of lengths of every beyond-first occurrence in a SORTED (h,l)
    array — one accumulator pass carrying the previous hash. (An earlier
    version indexed the sorted array with ``element_at(s, i)`` inside a
    transform; Catalyst inlines ``s`` at every reference, so each element
    re-sorted the array — quadratic per doc and measured at ~0.4 s/doc
    on 300-word docs. The single-pass aggregate is O(n).)"""
    zero = F.struct(
        F.lit(None).cast("bigint").alias("prev"), F.lit(0).cast("long").alias("tot")
    )

    def merge(acc, x):
        hit = F.when(x["h"] == acc["prev"], x["l"].cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        return F.struct(x["h"].alias("prev"), (acc["tot"] + hit).alias("tot"))

    return F.aggregate(sorted_pairs, zero, merge, lambda acc: acc["tot"])


def _dup_stats(elems: Column) -> tuple[Column, Column, Column]:
    """(n, dup_n, dup_chars) with DataTrove counting: an element's 2nd,
    3rd, ... occurrences are the duplicates; dup_chars sums their
    lengths. Sort-adjacency idiom: after array_sort, every beyond-first
    occurrence equals its predecessor — O(n log n) per doc, no shuffle."""
    pairs = _hl_pairs(elems)
    n = F.size(pairs)
    dup_n = n - F.size(F.array_distinct(F.transform(pairs, lambda p: p["h"])))
    dup_chars = _dup_chars_scan(F.array_sort(pairs))
    return n, dup_n, dup_chars


def _ngram_pairs(words: Column, n: int) -> Column:
    """(hash, char-length) structs of the space-joined word n-grams."""
    cnt = F.size(words) - F.lit(n - 1)
    grams = F.when(cnt >= 1, F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )).otherwise(F.array().cast("array<string>"))
    return _hl_pairs(grams)


def _top_ngram_chars(words: Column, n: int) -> Column:
    """Character coverage (count x length) of the most frequent n-gram —
    a single aggregate scan over the hash-sorted n-gram structs tracking
    the best run; ties on count break by coverage then smaller hash
    (deterministic, see module docstring)."""
    s = F.array_sort(_ngram_pairs(words, n))
    zero = F.struct(
        F.lit(None).cast("long").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best_cnt"),
        F.lit(0).cast("long").alias("best_chars"),
    )

    def merge(acc, x):
        run = F.when(x["h"] == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        cand = run * x["l"].cast("long")
        better = (run > acc["best_cnt"]) | (
            (run == acc["best_cnt"]) & (cand > acc["best_chars"])
        )
        return F.struct(
            x["h"].alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best_cnt"]).alias("best_cnt"),
            F.when(better, cand).otherwise(acc["best_chars"]).alias("best_chars"),
        )

    return F.aggregate(s, zero, merge, lambda acc: acc["best_chars"])


def _dup_ngram_chars(words: Column, n: int) -> Column:
    """Characters in n-gram occurrences beyond the first (overlap-
    permissive — documented upper bound of DataTrove's skip scan)."""
    return _dup_chars_scan(F.array_sort(_ngram_pairs(words, n)))


# Output field order shared by both impls (parity tests compare structs).
_REP_FIELDS = (
    ["dup_line_frac", "dup_line_char_frac", "dup_para_frac", "dup_para_char_frac"]
    + [f"top_{n}gram_char_frac" for n in _TOP_NGRAM_THRESHOLDS]
    + [f"dup_{n}gram_char_frac" for n in _DUP_NGRAM_THRESHOLDS]
)
_REP_SCHEMA = T.StructType([T.StructField(f, T.DoubleType()) for f in _REP_FIELDS])


def _repetition_row(t: str | None) -> dict:
    """One document's repetition metrics in pure Python — the batch body
    of the pandas impl (Counter over word-tuple n-grams; a tuple equals
    another iff the space-joined grams are equal, since words carry no
    whitespace). Caveat vs the expr impl: Python ``str.split``/``strip``
    treat Unicode whitespace as separators where Java ``\\s`` is
    ASCII-only — identical on ASCII-whitespace corpora (pinned in
    tests), divergent only on exotic whitespace."""
    t = t or ""
    total = len(t)

    def safe(a: int, b: int) -> float:
        return float(a) / float(b) if b > 0 else 0.0

    def dup(elems: list[str]) -> tuple[int, int, int]:
        c = Counter(elems)
        return (
            len(elems),
            sum(k - 1 for k in c.values() if k > 1),
            sum((k - 1) * len(e) for e, k in c.items() if k > 1),
        )

    st = t.strip()
    lines = [p.strip() for p in re.split(r"\n+", st) if p.strip()]
    paras = [p.strip() for p in re.split(r"\n\s*\n", st) if p.strip()]
    ln, ldup, lch = dup(lines)
    pn, pdup, pch = dup(paras)
    out = {
        "dup_line_frac": safe(ldup, ln),
        "dup_line_char_frac": safe(lch, total),
        "dup_para_frac": safe(pdup, pn),
        "dup_para_char_frac": safe(pch, total),
    }
    ws = t.split()
    for n in _TOP_NGRAM_THRESHOLDS:
        c = Counter(tuple(ws[i : i + n]) for i in range(len(ws) - n + 1))
        best = 0
        if c:
            top = max(c.values())
            # chars of a gram = word lengths + (n-1) joiner spaces
            best = max(
                (k * (sum(map(len, g)) + n - 1) for g, k in c.items() if k == top),
                default=0,
            )
        out[f"top_{n}gram_char_frac"] = safe(best, total)
    for n in _DUP_NGRAM_THRESHOLDS:
        c = Counter(tuple(ws[i : i + n]) for i in range(len(ws) - n + 1))
        rep = sum((k - 1) * (sum(map(len, g)) + n - 1) for g, k in c.items() if k > 1)
        out[f"dup_{n}gram_char_frac"] = safe(rep, total)
    return out


def _repetition_signals_pandas(text: Column | str) -> Column:
    """Arrow-batched twin of the expr impl — 20x faster measured (see
    module docstring); the UDF is built per call so module import never
    needs an active session (Spark 4.x pandas_udf gotcha)."""

    @F.pandas_udf(_REP_SCHEMA)
    def rep(s: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [_repetition_row(v) for v in s], columns=_REP_FIELDS
        )

    return rep(_text(text))


def gopher_repetition_signals(text: Column | str, impl: str = "pandas") -> Column:
    """struct of the raw repetition metrics: ``dup_line_frac``,
    ``dup_line_char_frac``, ``dup_para_frac``, ``dup_para_char_frac``,
    ``top_{2,3,4}gram_char_frac``, ``dup_{5..10}gram_char_frac``.
    Character fractions are over ``length(text)`` (DataTrove).

    ``impl="pandas"`` (default): Arrow-batched UDF, one map stage,
    measured 20x the expr path (module docstring). ``impl="expr"``:
    pure Catalyst expressions, zero Python — same output, pinned in
    ``tests/test_gopher.py``."""
    if impl == "pandas":
        return _repetition_signals_pandas(text)
    if impl != "expr":
        raise ValueError(f"gopher_repetition_signals: unknown impl {impl!r}")
    t0 = _text(text)
    # bind the text + word/line/paragraph splits once (r6): the metric
    # expressions below reference them many times, and inline references
    # re-split per use (interpreted higher-order trees, guide §4.4)
    payload = F.struct(
        t0.alias("t"),
        _words(t0).alias("w"),
        _lines(t0).alias("l"),
        _lines(t0, para=True).alias("pp"),
    )

    def _signals_of(p: Column) -> Column:
        t, words = p["t"], p["w"]
        total = F.length(t)

        ln, ldup, lchars = _dup_stats(p["l"])
        pn, pdup, pchars = _dup_stats(p["pp"])
        fields = [
            _safe_ratio(ldup, ln).alias("dup_line_frac"),
            _safe_ratio(lchars, total).alias("dup_line_char_frac"),
            _safe_ratio(pdup, pn).alias("dup_para_frac"),
            _safe_ratio(pchars, total).alias("dup_para_char_frac"),
        ]
        for n in _TOP_NGRAM_THRESHOLDS:
            fields.append(
                _safe_ratio(_top_ngram_chars(words, n), total).alias(
                    f"top_{n}gram_char_frac"
                )
            )
        for n in _DUP_NGRAM_THRESHOLDS:
            fields.append(
                _safe_ratio(_dup_ngram_chars(words, n), total).alias(
                    f"dup_{n}gram_char_frac"
                )
            )
        return F.struct(*fields)

    return _bind_once(payload, _signals_of)


def gopher_repetition_pass(
    text: Column | str,
    max_dup_line_frac: float = 0.30,
    max_dup_para_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_dup_para_char_frac: float = 0.20,
    top_ngram_thresholds: dict[int, float] | None = None,
    dup_ngram_thresholds: dict[int, float] | None = None,
    impl: str = "pandas",
) -> Column:
    """Boolean: the document survives every repetition rule at the
    paper's thresholds (all overridable). With ``impl="pandas"`` the 13
    field references share ONE ArrowEvalPython evaluation (identical
    PythonUDF expressions are deduplicated at extraction —
    plan-asserted in tests), so the pass costs the same as the struct.

    A threshold dict you pass IS the enforced rule set for its group: a
    partial dict checks only those n (omitting a paper rule is the
    caller's explicit choice); keys outside the computed signal ranges
    (top: 2-4, dup: 5-10) are rejected — the signals struct has no
    field to check them against."""
    tops = _TOP_NGRAM_THRESHOLDS if top_ngram_thresholds is None else top_ngram_thresholds
    dups = _DUP_NGRAM_THRESHOLDS if dup_ngram_thresholds is None else dup_ngram_thresholds
    bad_tops = set(tops) - set(_TOP_NGRAM_THRESHOLDS)
    bad_dups = set(dups) - set(_DUP_NGRAM_THRESHOLDS)
    if bad_tops or bad_dups:
        raise ValueError(
            "gopher_repetition_pass: thresholds for uncomputed n-gram sizes "
            f"(top: {sorted(bad_tops)}, dup: {sorted(bad_dups)}); signals cover "
            f"top {sorted(_TOP_NGRAM_THRESHOLDS)} and dup {sorted(_DUP_NGRAM_THRESHOLDS)}"
        )
    def _cond_of(s: Column) -> Column:
        cond = (
            (s["dup_line_frac"] <= max_dup_line_frac)
            & (s["dup_para_frac"] <= max_dup_para_frac)
            & (s["dup_line_char_frac"] <= max_dup_line_char_frac)
            & (s["dup_para_char_frac"] <= max_dup_para_char_frac)
        )
        for n, th in tops.items():
            cond = cond & (s[f"top_{n}gram_char_frac"] <= th)
        for n, th in dups.items():
            cond = cond & (s[f"dup_{n}gram_char_frac"] <= th)
        return cond

    s = gopher_repetition_signals(text, impl=impl)
    if impl == "expr":
        # bind once: the 13 field references would each re-evaluate the
        # whole interpreted signals tree. The pandas impl must NOT be
        # bound (Python UDFs cannot be extracted out of lambda bodies);
        # its field references already share one ArrowEvalPython via
        # identical-UDF deduplication (plan-asserted in tests).
        return _bind_once(s, _cond_of)
    return _cond_of(s)


def split_gopher_thresholds(thresholds: dict) -> tuple[dict, dict]:
    """Route a mixed threshold dict to (quality kwargs, repetition
    kwargs) by parameter name, rejecting unknowns — the single routing
    used by :func:`gopher_filter` and ``operators.curation``."""
    import inspect

    q_names = set(inspect.signature(gopher_quality_pass).parameters) - {"text"}
    r_names = set(inspect.signature(gopher_repetition_pass).parameters) - {"text", "impl"}
    unknown = set(thresholds) - q_names - r_names
    if unknown:
        raise TypeError(f"gopher thresholds: unknown thresholds {sorted(unknown)}")
    return (
        {k: v for k, v in thresholds.items() if k in q_names},
        {k: v for k, v in thresholds.items() if k in r_names},
    )


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    quality: bool = True,
    repetition: bool = True,
    impl: str = "pandas",
    **thresholds,
) -> DataFrame:
    """The corpus minus every document failing the selected Gopher rule
    groups — one map-side filter, no shuffle. Threshold kwargs are
    routed to :func:`gopher_quality_pass` / :func:`gopher_repetition_pass`
    by parameter name. ``impl`` picks the repetition-side evaluator
    (``"pandas"`` Arrow-batched default, 20x measured; ``"expr"`` for a
    Python-free plan — quality is always pure-expression)."""
    q_kw, r_kw = split_gopher_thresholds(thresholds)
    cond = F.lit(True)
    if quality:
        cond = cond & gopher_quality_pass(text_col, **q_kw)
    if repetition:
        cond = cond & gopher_repetition_pass(text_col, impl=impl, **r_kw)
    return df.filter(cond)
