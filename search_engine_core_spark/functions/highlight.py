"""Result highlighting — the ``HIGHLIGHT FIELDS 2 title content`` leg of
the reference's search command (``SearchQuery.highlight``,
``include/search_engine/storage/RedisSearchStorage.h:34`` /
``buildSearchCommand``, ``src/storage/RedisSearchStorage.cpp:254-261``),
where RediSearch wraps every matched term in ``<b>...</b>``.

One ``regexp_replace`` per field: the query's canonical tokens become a
word-boundary alternation evaluated JVM-side over the k result rows only
(highlighting runs AFTER top-k, never over the corpus).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def highlight_pattern(terms: list[str]) -> str:
    """Case-insensitive word-boundary alternation over the query terms,
    longest-first so overlapping terms (``spark``, ``sparkql``) prefer the
    longer match — RediSearch highlights whole matched tokens."""
    esc = [re.escape(t) for t in sorted(set(terms), key=lambda t: (-len(t), t)) if t]
    if not esc:
        return ""
    return r"(?i)\b(" + "|".join(esc) + r")\b"


def highlight_expr(
    col: Column | str,
    terms: list[str],
    tag_open: str = "<b>",
    tag_close: str = "</b>",
) -> Column:
    """Wrap every term occurrence in ``col`` with open/close tags
    (RediSearch's default ``<b>``/``</b>``)."""
    c = F.col(col) if isinstance(col, str) else col
    pat = highlight_pattern(terms)
    if not pat:
        return c
    return F.regexp_replace(c, pat, f"{tag_open}$1{tag_close}")
