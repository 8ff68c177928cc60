"""Shared column-expression text primitives for the curation modules.

One definition of null-safe text, whitespace strip, whitespace words,
and line/paragraph splitting, so the twin-tested modules (c4, gopher,
pii, spans) cannot drift from each other — a null/whitespace-handling
fix lands once, here (Java ``\\s`` is ASCII-only where Python's
``str.split``/``strip`` are Unicode-aware; that documented divergence
of the pandas twins lives at THIS boundary).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "text_or_empty",
    "strip_ws",
    "ws_words",
    "split_lines",
    "bind_once",
]


def bind_once(expr: Column, fn) -> Column:
    """Evaluate ``expr`` exactly once and feed the value to ``fn``.

    Catalyst inlines non-attribute subtrees at every reference, and
    expression trees containing higher-order functions fall back to the
    INTERPRETED evaluator, which performs no subexpression elimination —
    so N references to a split/regex-bearing expression cost N full
    evaluations (measured 5x on the C4 filter, ~20x per-element inside
    transform lambdas). Binding the expression through a one-element
    higher-order ``transform`` makes it a lambda variable: evaluated
    once, every reference a cheap attribute read. ``fn`` receives the bound
    Column and returns any Column; works inside projections AND filter
    conditions (where a plain projection barrier would be pushed
    through and re-inlined)."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def text_or_empty(text: Column | str) -> Column:
    """The column, nulls coalesced to empty string."""
    c = F.col(text) if isinstance(text, str) else text
    return F.coalesce(c, F.lit(""))


def strip_ws(c: Column) -> Column:
    """Full-whitespace strip (Python ``str.strip()`` semantics) —
    ``F.trim`` only removes ASCII spaces, not newlines/tabs."""
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def ws_words(text: Column) -> Column:
    """Whitespace words (Python ``str.split()`` / istringstream
    semantics, same as ``text_quality.word_count``): empty or
    whitespace-only text -> empty array."""
    return F.filter(F.split(text, r"\s+"), lambda w: F.length(w) > 0)


def split_lines(text: Column, para: bool = False) -> Column:
    """Lines (split on runs of newlines) or paragraphs (split on blank
    lines), stripped, empties dropped — DataTrove's splitters."""
    pat = r"\n\s*\n" if para else r"\n+"
    parts = F.split(strip_ws(text), pat)
    stripped = F.transform(parts, lambda p: strip_ws(p))
    return F.filter(stripped, lambda p: F.length(p) > 0)
