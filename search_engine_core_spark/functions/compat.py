"""Small reference-parity primitives that don't belong to a larger family.

* ``escape_redis_string`` — F14, the field sanitizer applied to every
  string field before the HMSET-style index write
  (``escapeRedisString``, ``src/storage/RedisSearchStorage.cpp:13-20``):
  ``"`` -> ``'``, newline/CR -> space. Pure ``translate`` — JVM-side.
* ``count_term_occurrences`` — F3, the word-boundary regex term counter
  used by every scoring branch (``ScoringAlgorithm::countTermOccurrences``,
  ``src/scoring/SearchScorer.cpp:94-110``): count of ``\\b<term>\\b``
  matches over lowercased text. Quirk preserved: the term is NOT
  regex-escaped (the reference interpolates it raw); canonical tokens are
  [a-z0-9]+ so this never bites in practice.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def escape_redis_string(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, '"\n\r', "'  ")


def escape_redis_string_py(s: str) -> str:
    """Driver-side twin (used in tests for parity)."""
    return s.replace('"', "'").replace("\n", " ").replace("\r", " ")


def count_term_occurrences(text: Column | str, term: str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(F.lower(c), F.lit(r"\b" + term.lower() + r"\b"))


def count_term_occurrences_py(text: str, term: str) -> int:
    return len(re.findall(r"\b" + term.lower() + r"\b", text.lower()))
