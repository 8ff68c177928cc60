"""AST -> DataFrame plan: candidate retrieval + BM25 scoring + top-k.

Replaces the reference's FT.SEARCH dispatch (``src/search_api.cpp:284-305``)
and the scorer's re-rank (``src/scoring/SearchScorer.cpp:603-622``) with one
declarative plan Catalyst can optimize end to end:

  candidates(AST) ⋈ triples[term ∈ Q] ⋈ broadcast(df-stats[term ∈ Q])
    -> per-(doc,term) BM25 -> sum per doc -> orderBy(score desc, doc_id asc)
    -> limit k   (TakeOrderedAndProject)

Retrieval semantics (§2.9):
  Term        — doc must contain ALL canonical tokens of the term value
  Term(exact) — substring containment, case-insensitive (F4,
                ``SearchScorer.cpp:116-125``); its tokens also score
  Filter      — metadata equality (P2/P3); `site:`/`domain` maps to the
                corpus `repo` column by default
  And / Or    — intersection / union of child doc sets

Scoring terms = canonical tokens of every Term node (the reference's
extractQueryInfo re-tokenizes the raw query — ``SearchScorer.cpp:475-500`` —
which also sweeps in filter field names; we deliberately score only real
query terms and document the deviation here).

Tiebreak contract: (score desc, doc_id asc). The reference's std::sort is
unstable (``SearchScorer.cpp:611-617``) so tie order there is unspecified;
we define it (SURVEY §7 risk 1) and the oracle does the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_core_spark.functions.scoring import (
    bm25_term_score,
    capped_log_tf,
    combined_score,
    tfidf_idf,
)
from search_engine_core_spark.functions.tokenizer import tokenize_py
from search_engine_core_spark.operators.stats import CorpusStats
from search_engine_core_spark.plans.query_parser import (
    And,
    Filter,
    Node,
    Or,
    QueryParser,
    Term,
)

# Query-field -> corpus-column mapping (the corpus has no `domain`; repo
# plays that role for code).
DEFAULT_FIELD_MAP = {"domain": "repo", "lang": "lang", "repo": "repo", "path": "path"}


def scoring_terms(ast: Node) -> list[str]:
    """Distinct canonical tokens of all Term nodes, in first-seen order."""
    seen: dict[str, None] = {}

    def walk(node: Node) -> None:
        if isinstance(node, Term):
            for t in tokenize_py(node.value):
                seen.setdefault(t, None)
        elif isinstance(node, (And, Or)):
            for c in node.children:
                walk(c)

    walk(ast)
    return list(seen)


class Planner:
    """Builds candidate + scored DataFrames from a parsed query."""

    def __init__(
        self,
        docs: DataFrame,
        trip: DataFrame,
        dfreq: DataFrame,
        stats: CorpusStats,
        field_map: dict[str, str] | None = None,
        phrase_docs_fn=None,
    ):
        self.docs = docs
        self.trip = trip
        self.dfreq = dfreq
        self.stats = stats
        self.field_map = field_map if field_map is not None else DEFAULT_FIELD_MAP
        # optional positional-adjacency candidate source for exact phrases
        # (Term -> DataFrame(doc_id) | None): injected by engines whose
        # index stores the positions sidecar (operators/positions.py)
        self.phrase_docs_fn = phrase_docs_fn
        self.parser = QueryParser()

    # -- candidate sets -------------------------------------------------
    def _term_docs(self, term: Term) -> DataFrame:
        if term.exact:
            # F4: case-insensitive substring containment — but postings
            # FIRST: the reference substring-checks only the FT.SEARCH
            # result set (docs matching the phrase's tokens), never the
            # whole corpus (``SearchScorer.cpp:116-125`` runs on hits).
            # Intersect the postings of the phrase's canonical tokens,
            # then substring-verify just those candidates; at 100 TB the
            # verify scan reads content for a tiny semi-joined slice
            # instead of every byte of the corpus.
            phrase = term.value.lower()
            toks = tokenize_py(term.value)
            if self.phrase_docs_fn is not None:
                adj = self.phrase_docs_fn(term)
                if adj is not None:
                    if "content" not in self.docs.columns:
                        # slim index + positions: token-adjacency answers
                        # the phrase with NO content re-attach — this is
                        # RediSearch's own FT.SEARCH exact-phrase
                        # semantics (positional), which the reference's
                        # substring check runs on top of
                        return adj
                    # content present: adjacency TIGHTENS the prefilter
                    # (strictly closer to the reference than
                    # has-all-tokens) before the same substring verify
                    return (
                        self.docs.join(adj, "doc_id", "left_semi")
                        .filter(F.instr(F.lower(F.col("content")), F.lit(phrase)) > 0)
                        .select("doc_id")
                    )
            if "content" not in self.docs.columns:
                raise ValueError(
                    "exact-phrase query on a slim index without a "
                    "positions sidecar: substring verification needs the "
                    "content column — attach_content(corpus) or rebuild "
                    "with positions=True"
                )
            base = self.docs
            if toks:
                base = base.join(self._docs_with_all_terms(toks), "doc_id", "left_semi")
            return base.filter(
                F.instr(F.lower(F.col("content")), F.lit(phrase)) > 0
            ).select("doc_id")
        toks = tokenize_py(term.value)
        if not toks:
            return self.docs.select("doc_id").limit(0)
        return self._docs_with_all_terms(toks)

    def _docs_with_all_terms(self, toks: list[str]) -> DataFrame:
        # groupBy-having beats an n-way self-join: one shuffle, no skew
        # amplification. isin() pushes into the triples scan.
        # DISTINCT tokens: trip holds one row per (doc, term), so a
        # repeated token ("data data" as one phrase/term) must count
        # once — comparing against len(toks) made such terms unmatchable
        uniq = list(dict.fromkeys(toks))
        matched = self.trip.filter(F.col("term").isin(uniq))
        if len(uniq) == 1:
            return matched.select("doc_id")
        return (
            matched.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("_nt"))
            .filter(F.col("_nt") == len(uniq))
            .select("doc_id")
        )

    def _filter_docs(self, flt: Filter) -> DataFrame:
        col = self.field_map.get(flt.field, flt.field)
        if col not in self.docs.columns:
            return self.docs.select("doc_id").limit(0)
        return self.docs.filter(F.col(col) == flt.value).select("doc_id")

    def candidates(self, node: Node) -> DataFrame:
        if isinstance(node, Term):
            return self._term_docs(node)
        if isinstance(node, Filter):
            return self._filter_docs(node)
        if isinstance(node, And):
            # Flat all-plain-term AND collapses to one groupBy-having.
            if all(isinstance(c, Term) and not c.exact for c in node.children):
                toks = sorted({t for c in node.children for t in tokenize_py(c.value)})
                if toks:
                    return self._docs_with_all_terms(toks)
            # a plain term with NO canonical tokens (e.g. a 1-char word)
            # is ignored, matching the collapsed branch above — routing
            # it through _term_docs would return the empty set and
            # annihilate the whole conjunction
            kids = [
                c for c in node.children
                if not (isinstance(c, Term) and not c.exact
                        and not tokenize_py(c.value))
            ]
            if not kids:
                return self.docs.select("doc_id").limit(0)
            out = self.candidates(kids[0])
            for child in kids[1:]:
                out = out.join(self.candidates(child), "doc_id", "left_semi")
            return out
        if isinstance(node, Or):
            out = self.candidates(node.children[0])
            for child in node.children[1:]:
                out = out.unionByName(self.candidates(child))
            return out.distinct()
        raise TypeError(f"unknown node {node!r}")

    # -- scoring --------------------------------------------------------
    def score(self, cand: DataFrame, terms: list[str]) -> DataFrame:
        """BM25 sum over query terms for the candidate docs."""
        if not terms:
            return cand.withColumn("score", F.lit(0.0))
        q_trip = self.trip.filter(F.col("term").isin(terms))
        q_df = self.dfreq.filter(F.col("term").isin(terms))
        per_term = q_trip.join(cand, "doc_id", "left_semi")
        doclen = self.docs.select("doc_id", "doclen")
        scored = (
            per_term.join(F.broadcast(q_df), "term", "inner")
            .join(doclen, "doc_id", "inner")
            .withColumn(
                "term_score",
                bm25_term_score(
                    F.col("tf").cast("double"),
                    F.col("df").cast("double"),
                    F.col("doclen"),
                    self.stats.n_docs,
                    self.stats.avgdl,
                ),
            )
            .groupBy("doc_id")
            .agg(F.sum("term_score").alias("score"))
        )
        # Docs in the candidate set with no scoring-term hits (pure filter /
        # phrase-only queries) keep score 0.
        return cand.join(scored, "doc_id", "left").fillna({"score": 0.0})

    def score_tfidf(self, cand: DataFrame, terms: list[str]) -> DataFrame:
        """X1 TF-IDF algorithm (``SearchScorer.cpp:287-397`` content branch):
        per (doc, term) score = log(1 + min(tf, 10)) / charlen * log(N/df)
        — F5 cap/log defaults, normalizeByLength with CHARACTER length
        (``SearchScorer.h:32-36``), F8 idf with the df-defaults-to-1 quirk
        (``SearchScorer.cpp:377-382``). tf comes from the canonical
        tokenizer rather than the reference's word-boundary regex count
        (F3 deviation, identical for alnum terms in natural text)."""
        if not terms:
            return cand.withColumn("score", F.lit(0.0))
        if "content" not in self.docs.columns:
            raise ValueError(
                "algorithm='tfidf' normalizes by CHARACTER length and "
                "needs the content column: slim index readers must "
                "attach_content(corpus) first"
            )
        q_trip = self.trip.filter(F.col("term").isin(terms))
        q_df = self.dfreq.filter(F.col("term").isin(terms))
        per_term = q_trip.join(cand, "doc_id", "left_semi")
        charlen = self.docs.select("doc_id", F.length("content").alias("_charlen"))
        scored = (
            per_term.join(F.broadcast(q_df), "term", "left")
            .join(charlen, "doc_id", "inner")
            .withColumn(
                "term_score",
                capped_log_tf(F.col("tf"))
                / F.col("_charlen").cast("double")
                * tfidf_idf(F.col("df"), self.stats.n_docs),
            )
            .groupBy("doc_id")
            .agg(F.sum("term_score").alias("score"))
        )
        return cand.join(scored, "doc_id", "left").fillna({"score": 0.0})

    def topk(self, query: str, k: int = 10, algorithm: str = "bm25") -> DataFrame:
        """Parse + retrieve + score + deterministic top-k (O1-O3)."""
        return self.topk_ast(self.parser.parse(query), k, algorithm)

    def scored_ast(self, ast: Node, algorithm: str = "bm25") -> DataFrame:
        """Full scored candidate set (doc_id, score), no ordering/limit.
        ``algorithm``: bm25 | tfidf | combined (X1/X4,
        ``SearchScorer.cpp:625-643`` setAlgorithm dispatch). ``combined``
        is F11 RedisSearchCombined: 0.3*base + 0.7*custom
        (``SearchScorer.cpp:399-423``); the base score column is
        ``base_score`` on docs when present, else the reference's
        baseScore default 1.0 (``SearchScorer.h:75``)."""
        terms = scoring_terms(ast)
        cand = self.candidates(ast)
        if algorithm == "bm25":
            return self.score(cand, terms)
        if algorithm == "tfidf":
            return self.score_tfidf(cand, terms)
        if algorithm == "combined":
            scored = self.score(cand, terms)
            if "base_score" in self.docs.columns:
                base = self.docs.select(
                    "doc_id", F.col("base_score").cast("double").alias("_base")
                )
                scored = scored.join(base, "doc_id", "left").fillna({"_base": 1.0})
            else:
                scored = scored.withColumn("_base", F.lit(1.0))
            # doc.baseScore > 0 guards the combine (SearchScorer.cpp:404)
            return scored.select(
                "doc_id",
                F.when(
                    F.col("_base") > 0, combined_score(F.col("_base"), F.col("score"))
                )
                .otherwise(F.col("score"))
                .alias("score"),
            )
        raise ValueError(f"unknown algorithm {algorithm!r} (bm25|tfidf|combined)")

    def topk_ast(self, ast: Node, k: int = 10, algorithm: str = "bm25") -> DataFrame:
        scored = self.scored_ast(ast, algorithm)
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
