"""Batched multi-query evaluation: N queries, ONE postings scan, ONE plan.

The reference serves queries one at a time over a warm RediSearch socket
(``src/search_api.cpp:194-378``) where per-query overhead is microseconds;
a Spark query tier pays a per-job scheduling floor (~100 ms) instead, so
the throughput shape at scale is BATCHED evaluation — query-log replay,
offline relevance eval, A/B scorer comparison, bulk relevance-feedback
scoring all arrive as *sets* of queries. This module answers N queries in
a single DataFrame plan:

* the union of all queries' canonical tokens prunes ONE postings scan
  (bucket PartitionFilters + term PushedFilters), decoded once;
* plain term conjunctions/disjunctions (the block-max-WAND-eligible
  shapes) are scored **vectorized**: a broadcast (query, term) table
  joins the decoded postings, BM25 sums per (query, doc) in one
  map-side-combinable groupBy, and a (query)-partitioned window takes
  top-k — cost is one scan + one shuffle of candidate rows, independent
  of the number of queries in the batch;
* phrases / filters / mixed precedence / non-bm25 scorers fall back to
  per-query Planner subtrees over the SAME decoded postings (no extra
  scans), unioned into the one output plan.

Rank-identical to per-query ``search`` by construction (same tokenizer,
same BM25 expression, same (score desc, doc_id asc) tiebreak) —
test-pinned in ``tests/test_batch_query.py``.

At 100 TB: the scan cost is the union term set's postings (what ONE
worst-case query would read), the vectorized stage shuffles only
(query, doc) candidate rows hash-partitioned by query, and nothing is
collected on the driver — the result stays a DataFrame, so a 10k-query
replay is one job, not 10k jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from search_engine_core_spark.functions.scoring import bm25_term_score
from search_engine_core_spark.functions.tokenizer import tokenize_py
from search_engine_core_spark.operators.stats import CorpusStats
from search_engine_core_spark.plans.planner import Planner, scoring_terms
from search_engine_core_spark.plans.query_parser import And, Node, Or, QueryParser, Term

# ~16 B/doc hash relation: 4M docs ≈ 64 MB broadcast — safe on any real
# executor; above this, the doclen join falls back to Catalyst's choice.
_DOCLEN_BROADCAST_MAX = 4_000_000


def plain_mode(ast: Node) -> str | None:
    """'AND' / 'OR' for pure plain-term shapes whose DSL semantics the
    vectorized batch scorer reproduces exactly (same eligibility rule as
    ``IndexSearchEngine._wand_mode``), else None."""

    def plain(n: Node) -> bool:
        return isinstance(n, Term) and not n.exact

    if plain(ast):
        return "AND"  # single term: all its tokens required
    if isinstance(ast, And) and all(plain(c) for c in ast.children):
        return "AND"
    if isinstance(ast, Or) and all(
        plain(c) and len(tokenize_py(c.value)) == 1 for c in ast.children
    ):
        # token-OR == DSL OR only when each child is ONE token
        return "OR"
    return None


def _batch_plain_topk(
    spark,
    plain: list[tuple[str, str, list[str]]],
    k: int,
    trip: DataFrame,
    dfreq: DataFrame,
    docs: DataFrame,
    stats: CorpusStats,
) -> DataFrame:
    """Vectorized top-k for a batch of (query, mode, tokens) plain shapes.

    One broadcast of the (query, term) table, one candidate join, one
    groupBy, one window — the per-query work is rows in a plan, not plans.
    """
    qtok_rows = [(qid, t) for qid, (_, _, toks) in enumerate(plain) for t in toks]
    if not qtok_rows:
        return spark.createDataFrame([], "query string, doc_id long, score double")
    # (qid, term) fan-out rows and per-query metadata are SEPARATE
    # relations: keeping _mode/_n_toks out of the candidate aggregation
    # keeps its buffer all-numeric (sum + count), so Spark plans a
    # codegen'd Tungsten HashAggregate. Folding them in as first(...)
    # forces SortAggregate — a full sort of the fan-out rows that measured
    # 10x the CPU of the hash shape on a 128-query replay (BENCH notes).
    # The query is carried through the hot path as a dense INT id, not its
    # string: the candidate agg hashes and the top-k exchange + sort key
    # on a 4-byte key instead of a ~16-byte UTF8 comparator (the same
    # radix-vs-string lesson as the build's xxhash64 sort key — measured
    # 1.3-1.5x on a 512-query replay's vectorized stage); the k result
    # rows per query get their string back via one tiny broadcast join.
    qtok = spark.createDataFrame(qtok_rows, "qid int, term string")
    qmeta = spark.createDataFrame(
        [(qid, mode, len(toks)) for qid, (_, mode, toks) in enumerate(plain)],
        "qid int, _mode string, _n_toks int",
    )
    qname = spark.createDataFrame(
        [(qid, q) for qid, (q, _, _) in enumerate(plain)], "qid int, query string"
    )
    terms = sorted({t for _, t in qtok_rows})
    # doc-level join first (one row per (term, doc)), THEN the broadcast
    # query fan-out — doclen rides the smaller relation. The doclen side
    # is ~16 B/doc: explicitly broadcast below _DOCLEN_BROADCAST_MAX docs
    # (Catalyst's file-size estimate of the docs table includes content
    # columns and picks a sort-merge join otherwise); at larger corpora
    # the shuffle co-partition is the right shape — or denormalize doclen
    # into the postings at build time.
    doclen = docs.select("doc_id", "doclen")
    if stats.n_docs <= _DOCLEN_BROADCAST_MAX:
        doclen = F.broadcast(doclen)
    # Repartition the pruned postings by doc_id BEFORE the query fan-out:
    # hashpartitioning(doc_id) satisfies the (query, doc_id) aggregation's
    # clustering requirement (doc_id ⊆ group keys), so the agg runs
    # exchange-free and the only sizeable shuffle is the trip rows
    # themselves — NOT the trip × queries fan-out (batch-size-independent
    # wire traffic; an A/B at 128 queries measured the fan-out exchange
    # 2-4x slower across separate executor JVMs).
    # EXPLICIT width on this exchange: its input bytes are small (one row
    # per pruned (term, doc)) but everything CPU-heavy — the query fan-out
    # join and the (qid, doc) candidate agg — runs pipelined on top of it,
    # so letting AQE size the exchange by bytes coalesces the whole
    # vectorized stage onto 1-2 tasks (the same starvation the build's
    # encode exchange hit; BENCH/BASELINE.md "explicit partition counts").
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    per_term = (
        trip.filter(F.col("term").isin(terms))
        .repartition(n_part, F.col("doc_id"))
        .join(doclen, "doc_id", "inner")
        .join(F.broadcast(dfreq.filter(F.col("term").isin(terms))), "term", "inner")
        .withColumn(
            "term_score",
            bm25_term_score(
                F.col("tf").cast("double"),
                F.col("df").cast("double"),
                F.col("doclen"),
                stats.n_docs,
                stats.avgdl,
            ),
        )
    )
    scored = (
        per_term.join(F.broadcast(qtok), "term", "inner")
        .groupBy("qid", "doc_id")
        .agg(
            F.sum("term_score").alias("score"),
            F.count(F.lit(1)).alias("_nt"),
        )
        .join(F.broadcast(qmeta), "qid", "inner")
        # AND: the doc must hold ALL of the query's tokens (qtok rows are
        # distinct per (qid, term) — scoring_terms dedupes — and trip is
        # one row per (term, doc), so the group count IS the matched-token
        # count); OR: any.
        .filter((F.col("_mode") == "OR") | (F.col("_nt") == F.col("_n_toks")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .join(F.broadcast(qname), "qid", "inner")
        .select("query", "doc_id", "score")
    )


def search_many(
    spark,
    queries: list[str],
    k: int,
    trip: DataFrame,
    dfreq: DataFrame,
    docs: DataFrame,
    stats: CorpusStats,
    algorithm: str = "bm25",
    field_map: dict[str, str] | None = None,
    phrase_docs_fn=None,
) -> tuple[DataFrame, dict]:
    """Shared batch implementation over any (trip, dfreq, docs) triple —
    the in-memory engine passes its cached tables, the index engine passes
    the once-decoded union-term postings. Returns (result, route_stats);
    result columns: (query, doc_id, score), per-query top-k, ordered by
    (query asc, score desc, doc_id asc). Duplicate query strings collapse
    to one evaluation.

    ``algorithm="fielded"`` routes every query through the flagship
    fielded scorer over the SAME shared tables (``fielded_topk`` prunes
    candidates from ``trip`` by each query's own tokens, so the shared
    union-decoded postings give the same candidate set as a per-query
    decode) — batch replay of fielded queries stays rank-identical to
    :meth:`search`, matching the other algorithms' contract."""
    seen: dict[str, None] = {}
    for q in queries:
        seen.setdefault(q, None)
    if algorithm == "fielded":
        from search_engine_core_spark.functions.reference_scorer import (
            fielded_topk,
        )

        if "content" not in docs.columns:
            raise ValueError(
                "algorithm='fielded' needs the content column: slim index "
                "readers must attach_content(corpus) first"
            )
        f_parts = [
            fielded_topk(docs, q, k, trip=trip).select(
                F.lit(q).alias("query"), "doc_id", "score"
            )
            for q in seen
        ]
        if not f_parts:
            out = spark.createDataFrame(
                [], "query string, doc_id long, score double"
            )
        else:
            out = f_parts[0]
            for p in f_parts[1:]:
                out = out.unionByName(p)
        return (
            out.orderBy("query", F.desc("score"), F.asc("doc_id")),
            {"vectorized": 0, "planner": 0, "fielded": len(seen)},
        )
    parser = QueryParser()
    parsed = [(q, parser.parse(q)) for q in seen]
    plain: list[tuple[str, str, list[str]]] = []
    general: list[tuple[str, Node]] = []
    for q, ast in parsed:
        mode = plain_mode(ast) if algorithm == "bm25" else None
        if mode is not None:
            plain.append((q, mode, scoring_terms(ast)))
        else:
            general.append((q, ast))
    parts: list[DataFrame] = []
    if plain:
        parts.append(_batch_plain_topk(spark, plain, k, trip, dfreq, docs, stats))
    if general:
        planner = Planner(docs, trip, dfreq, stats, field_map, phrase_docs_fn)
        for q, ast in general:
            parts.append(
                planner.topk_ast(ast, k, algorithm).select(
                    F.lit(q).alias("query"), "doc_id", "score"
                )
            )
    if not parts:
        out = spark.createDataFrame([], "query string, doc_id long, score double")
    else:
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
    stats_out = {"vectorized": len(plain), "planner": len(general)}
    return out.orderBy("query", F.desc("score"), F.asc("doc_id")), stats_out
