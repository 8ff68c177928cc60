"""Pure-Python BM25 oracle — the rank-identity ground truth for tests.

Implements exactly the math the Spark engine expresses in columns
(``functions/scoring.py``), mirroring the reference formulas
(``/root/reference/src/scoring/SearchScorer.cpp:257-274``) over a
single-content-field corpus with token-count doclen (FIXTURES.md §4
contract). Never imported by any Spark plan.
"""

from __future__ import annotations

import math
from collections import Counter

from search_engine_core_spark.functions.tokenizer import tokenize_py
from search_engine_core_spark.plans.query_parser import And, Filter, Node, Or, QueryParser, Term

K1 = 1.2
B = 0.75


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]], meta: dict[int, dict] | None = None):
        """docs: (doc_id, content) pairs. meta: optional per-doc fields for
        Filter evaluation (e.g. {'lang': 'python', 'repo': ...})."""
        self.content = dict(docs)
        self.meta = meta or {}
        self.tf: dict[int, Counter] = {}
        self.doclen: dict[int, int] = {}
        self.df: Counter = Counter()
        for doc_id, text in docs:
            toks = tokenize_py(text)
            self.tf[doc_id] = Counter(toks)
            self.doclen[doc_id] = len(toks)
            for t in set(toks):
                self.df[t] += 1
        self.n = len(docs)
        self.avgdl = (sum(self.doclen.values()) / self.n) if self.n else 0.0

    def idf(self, term: str) -> float:
        d = self.df.get(term, 0)
        return math.log((self.n - d + 0.5) / (d + 0.5))

    def bm25(self, doc_id: int, term: str) -> float:
        tf = self.tf[doc_id].get(term, 0)
        if tf == 0:
            return 0.0
        norm = self.doclen[doc_id] / self.avgdl
        return self.idf(term) * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * norm))

    # -- retrieval (mirrors plans/planner.py semantics) -----------------
    def _candidates(self, node: Node) -> set[int]:
        if isinstance(node, Term):
            if node.exact:
                phrase = node.value.lower()
                return {d for d, c in self.content.items() if phrase in c.lower()}
            toks = tokenize_py(node.value)
            if not toks:
                return set()
            return {d for d in self.content if all(self.tf[d].get(t, 0) > 0 for t in toks)}
        if isinstance(node, Filter):
            field = {"domain": "repo"}.get(node.field, node.field)
            return {d for d in self.content if self.meta.get(d, {}).get(field) == node.value}
        if isinstance(node, And):
            sets = [self._candidates(c) for c in node.children]
            return set.intersection(*sets) if sets else set()
        if isinstance(node, Or):
            out: set[int] = set()
            for c in node.children:
                out |= self._candidates(c)
            return out
        raise TypeError(node)

    def _scoring_terms(self, node: Node, acc: dict[str, None]) -> None:
        if isinstance(node, Term):
            for t in tokenize_py(node.value):
                acc.setdefault(t, None)
        elif isinstance(node, (And, Or)):
            for c in node.children:
                self._scoring_terms(c, acc)

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        ast = QueryParser().parse(query)
        terms: dict[str, None] = {}
        self._scoring_terms(ast, terms)
        cand = self._candidates(ast)
        scored = [(d, sum(self.bm25(d, t) for t in terms)) for d in cand]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]
