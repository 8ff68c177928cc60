"""SearchEngine facade: build once, query many times.

In-memory mode caches the triples/df/stats derived tables; materialized
mode (``index_dir``) builds the compressed posting-list index on disk with
checkpoint/resume (``sources/index_io.py``) and queries via block-max
pruning (``operators/topk.py``). Both modes answer the same DSL with the
same ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_core_spark.corpus import with_doc_columns
from search_engine_core_spark.operators.stats import CorpusStats, corpus_stats, doc_frequency, triples
from search_engine_core_spark.plans.planner import Planner
from search_engine_core_spark.plans.query_parser import QueryParser


def clamp_page_limit(page: int, limit: int, strict: bool = False) -> tuple[int, int]:
    """The search API's bounds (``src/search_api.cpp:162-181``): limit
    [1, 100], page [1, 1000].

    ``strict=True`` is exact reference parity: out-of-range values are
    REJECTED with a :class:`ValueError` carrying the reference's own
    messages ("Page must be between 1 and 1000", "Limit must be between
    1 and 100" — the 400/valid=false path of ``validateSearchRequest``).
    The default ``strict=False`` is a DOCUMENTED DEVIATION: values
    saturate to the nearest bound instead — a DataFrame API has no
    request/response cycle to 400 on, and clamping keeps batch callers
    total. The bounds themselves are the reference's either way."""
    page, limit = int(page), int(limit)
    if strict:
        if not 1 <= page <= 1000:
            raise ValueError("Page must be between 1 and 1000")
        if not 1 <= limit <= 100:
            raise ValueError("Limit must be between 1 and 100")
        return page, limit
    return max(1, min(1000, page)), max(1, min(100, limit))


def _meta_with_snippet(hits: DataFrame, docs: DataFrame, terms: list[str],
                       highlight: bool) -> DataFrame:
    """Join top-k hits back to doc metadata + 200-char snippet (O6,
    ``src/storage/RedisSearchStorage.cpp:286-289``), optional ``<b>``
    highlighting — applied to the k result rows only, never the corpus."""
    cols = [c for c in ("repo", "path", "lang", "content") if c in docs.columns]
    out = hits.join(docs.select("doc_id", *cols), "doc_id", "left")
    if "content" in cols:
        snippet = F.when(
            F.length("content") > 200,
            F.concat(F.substring("content", 1, 200), F.lit("...")),
        ).otherwise(F.col("content"))
        if highlight:
            from search_engine_core_spark.functions.highlight import highlight_expr

            snippet = highlight_expr(snippet, terms)
        out = out.withColumn("snippet", snippet).drop("content")
    return out.orderBy(F.desc("score"), F.asc("doc_id"))


class _PaginatedSearch:
    """GET /search?page=&limit= semantics shared by all engines (O2),
    plus the reference's cached-response layer (:meth:`search_cached`)."""

    #: LRU bound for search_cached (the reference's Redis cache is
    #: likewise bounded; k-row entries make this a few MB at most)
    CACHE_MAX = 256

    def search_page(self, query: str, page: int = 1, limit: int = 10,
                    algorithm: str = "bm25", strict: bool = False) -> DataFrame:
        page, limit = clamp_page_limit(page, limit, strict=strict)
        return self.search(query, k=page * limit, algorithm=algorithm).offset(
            (page - 1) * limit
        )

    def search_cached(self, query: str, k: int = 10,
                      algorithm: str = "bm25") -> DataFrame:
        """The Spark twin of the reference's cached response path
        (``docs/PERFORMANCE_OPTIMIZATIONS_SUMMARY.md:14-20`` — 2 ms
        cached vs 150 ms uncached via a Redis result cache): an LRU of
        collected top-k results keyed by (query, k, algorithm). Coherent
        BY CONSTRUCTION: every engine pins an immutable corpus/index
        snapshot at open (the same contract the per-term memos rely on),
        so an entry can never go stale within an engine's lifetime —
        index updates are served by opening a new engine, exactly like
        the reference invalidating its cache on re-index. A hit replays
        the k collected rows as a local DataFrame: no distributed job.
        LRU bookkeeping is lock-guarded — a serving tier drives one
        engine from many driver threads (the reference's uWS workers
        share one Redis cache the same way); the search itself runs
        outside the lock so concurrent misses don't serialize."""
        import threading
        from collections import OrderedDict

        key = (query, int(k), algorithm)
        # dict.setdefault is atomic under the GIL — no two threads can
        # observe different lock/cache objects
        lock = self.__dict__.setdefault("_result_cache_lock", threading.Lock())
        cache = self.__dict__.setdefault("_result_cache", OrderedDict())
        with lock:
            hit = cache.get(key)
            if hit is not None:
                cache.move_to_end(key)
        if hit is None:
            df = self.search(query, k=k, algorithm=algorithm)
            hit = (df.schema, df.collect())
            with lock:
                cache[key] = hit
                if len(cache) > self.CACHE_MAX:
                    cache.popitem(last=False)
        from pyspark.sql import SparkSession

        # getActiveSession() is THREAD-LOCAL (None in a fresh serving
        # thread) — prefer the engine's own handles
        spark = (
            getattr(self, "spark", None)
            or getattr(getattr(self, "docs", None), "sparkSession", None)
            or SparkSession.getActiveSession()
        )
        return spark.createDataFrame(hit[1], hit[0])


class SearchEngine(_PaginatedSearch):
    def __init__(self, docs: DataFrame, field_map: dict[str, str] | None = None):
        """``docs`` must carry doc_id/content/doclen (see corpus.py);
        a raw input_hint corpus is upgraded automatically."""
        if "doc_id" not in docs.columns:
            docs = with_doc_columns(docs)
        self.docs = docs.cache()
        self.trip = triples(self.docs).cache()
        self.dfreq = doc_frequency(self.trip).cache()
        self.stats: CorpusStats = corpus_stats(self.docs)
        self.planner = Planner(self.docs, self.trip, self.dfreq, self.stats, field_map)

    def search(self, query: str, k: int = 10, algorithm: str = "bm25") -> DataFrame:
        """Top-k (doc_id, score), deterministic tiebreak (score desc, id asc).
        ``algorithm`` selects the scorer — bm25 | tfidf | combined |
        fielded — the Spark twin of ``SearchScorer::setAlgorithm`` / the
        ``SCORER`` passthrough (``src/scoring/SearchScorer.cpp:625-643``,
        ``src/search_core/Scorer.cpp:27-38``); ``fielded`` dispatches to
        the reference's flagship field-weighted scorer."""
        if algorithm == "fielded":
            from search_engine_core_spark.functions.reference_scorer import fielded_topk

            return fielded_topk(self.docs, query, k, trip=self.trip)
        return self.planner.topk(query, k, algorithm)

    def search_with_meta(self, query: str, k: int = 10, highlight: bool = False) -> DataFrame:
        """Top-k joined back to document metadata + 200-char snippet (O6,
        ``src/storage/RedisSearchStorage.cpp:286-289``). ``highlight=True``
        wraps the query's canonical tokens in ``<b>`` tags in the snippet
        (``SearchQuery.highlight`` -> ``HIGHLIGHT FIELDS``,
        ``RedisSearchStorage.cpp:254-261``)."""
        from search_engine_core_spark.plans.planner import scoring_terms

        terms = scoring_terms(self.planner.parser.parse(query)) if highlight else []
        return _meta_with_snippet(self.search(query, k), self.docs, terms, highlight)

    def search_many(self, queries: list[str], k: int = 10,
                    algorithm: str = "bm25") -> DataFrame:
        """Batched evaluation: N queries, ONE plan (operators/batch_query).
        Returns (query, doc_id, score) with per-query top-k, rank-identical
        to :meth:`search` per query. Route counts land in
        ``last_batch_stats``."""
        from search_engine_core_spark.operators.batch_query import search_many

        out, self.last_batch_stats = search_many(
            self.docs.sparkSession, queries, k, self.trip, self.dfreq,
            self.docs, self.stats, algorithm, self.planner.field_map,
        )
        return out

    def unpersist(self) -> None:
        for df in (self.trip, self.dfreq, self.docs):
            df.unpersist()


class IndexSearchEngine(_PaginatedSearch):
    """Query engine over a materialized compressed index (sources/index_io).

    ``search`` answers the full DSL by decoding only the query terms'
    postings (partition-pruned scan -> Arrow decode -> same Planner as the
    in-memory engine, so ranks are identical by construction).
    ``search_wand`` is the block-max pruned path for plain term queries.
    """

    # WAND's final top-k is merged on the driver (bounded collects) —
    # the right trade at API-sized k. Past this cap, search() keeps the
    # distributed planner plan instead (see search()).
    WAND_DRIVER_K_CAP = 10_000

    def __init__(
        self,
        spark,
        index_dir: str,
        n_buckets: int = 16,
        field_map: dict[str, str] | None = None,
    ):
        from search_engine_core_spark.operators.topk import WandTopK
        from search_engine_core_spark.sources.index_io import IndexReader

        self.spark = spark
        self.reader = IndexReader(spark, index_dir, n_buckets)
        self.stats = self.reader.stats
        self.field_map = field_map
        self.wand = WandTopK(self.reader, self.stats)
        # index-open warming (what every engine does at startup): load the
        # driver-resident term dictionary and Lucene-style norms now, so
        # the first query doesn't pay the two one-time jobs. Both are
        # size-guarded no-ops on corpora too big for driver residency.
        self.reader.term_meta([])
        self.reader.norms()

    def _planner(self, terms: list[str]) -> Planner:
        from search_engine_core_spark.operators.postings import decode_postings_df

        if terms:
            # decode ONCE per query: the Planner references triples several
            # times (one candidate probe per AST child + the scoring join);
            # an eager localCheckpoint materializes the tiny decoded set and
            # truncates lineage so each reuse is a read, not a re-decode.
            # Single-term queries touch triples once — skip the overhead.
            trip = decode_postings_df(self.reader.postings_for_terms(terms))
            if len(terms) > 1:
                trip = trip.localCheckpoint(eager=True)
        else:
            trip = self.spark.createDataFrame([], "doc_id long, term string, tf long")
        return Planner(
            self.reader.docs,
            trip,
            self.reader.dfreq,
            self.stats,
            self.field_map,
            phrase_docs_fn=self._phrase_docs_fn(),
        )

    def _phrase_docs_fn(self):
        """Positional-adjacency phrase candidates when the index stores the
        positions sidecar; None keeps the content substring path. On slim
        indexes this is what answers phrases WITHOUT attach_content."""
        if not self.reader.has_positions():
            return None
        from search_engine_core_spark.functions.tokenizer import tokenize_py
        from search_engine_core_spark.operators.positions import phrase_candidate_docs

        def fn(term):
            toks = tokenize_py(term.value)
            if not toks:
                return None  # no tokens to align — substring path decides
            return phrase_candidate_docs(
                self.reader.positions_for_terms(list(dict.fromkeys(toks))), toks
            )

        return fn

    def search(self, query: str, k: int = 10, algorithm: str = "bm25") -> DataFrame:
        from search_engine_core_spark.plans.planner import scoring_terms

        if algorithm == "fielded":
            # flagship fielded scorer over the index's docs table (needs
            # content — slim indexes must attach_content() first);
            # candidates come from the query tokens' decoded postings so
            # only the hit set is field-scored (reference shape, and the
            # scale difference between a pruned scan and a full one)
            from search_engine_core_spark.functions.reference_scorer import (
                _extract_query,
                fielded_topk,
            )
            from search_engine_core_spark.functions.tokenizer import tokenize_py
            from search_engine_core_spark.operators.postings import decode_postings_df

            if "content" not in self.reader.docs.columns:
                raise ValueError(
                    "algorithm='fielded' needs the content column: "
                    "slim index readers must attach_content(corpus) first"
                )
            terms, phrases = _extract_query(query)
            toks = list(dict.fromkeys(terms + [t for p in phrases for t in tokenize_py(p)]))
            trip = (
                decode_postings_df(self.reader.postings_for_terms(toks)) if toks else None
            )
            self.last_path = "fielded"
            return fielded_topk(self.reader.docs, query, k, trip=trip)
        ast = QueryParser().parse(query)
        mode = self._wand_mode(ast)
        self.last_path = "planner"  # overwritten below when WAND routes
        if algorithm == "bm25" and mode is not None and k <= self.WAND_DRIVER_K_CAP:
            # pure term-only AND/OR shapes route through block-max WAND:
            # rank-identical by construction (test-pinned) and cheaper —
            # only the rarest term ever fully decodes. Mixed precedence,
            # phrases, filters and non-bm25 scorers stay on the general
            # planner. Above WAND_DRIVER_K_CAP (deep pagination:
            # search_page at the clamp ceiling asks k = 1000*100) the
            # planner path wins — it returns a fully distributed
            # TakeOrdered plan with NO driver materialization, where
            # WAND's final merge would pull k rows through the driver
            # per query.
            self.last_path = "wand"
            return self.wand.topk(scoring_terms(ast), k, mode=mode)
        return self._planner(scoring_terms(ast)).topk_ast(ast, k, algorithm)

    @property
    def last_query_stats(self) -> dict | None:
        """Diagnostics of the most recent ``search``/``search_wand`` call:
        {"route": "wand"|"planner", **WandTopK.last_stats when the WAND
        path ran} — seed size, θ, early-exit, survivor count, fallback
        labels. Best-effort observability (the scalars the driver already
        holds); not synchronized across concurrent searches."""
        route = getattr(self, "last_path", None)
        if route is None:
            return None
        out = {"route": route}
        if route == "wand" and self.wand.last_stats is not None:
            out.update(self.wand.last_stats)
        return out

    @staticmethod
    def _wand_mode(ast) -> str | None:
        """'AND' / 'OR' for pure plain-term conjunctions/disjunctions
        (the shapes whose DSL semantics WAND reproduces exactly), else
        None. ONE implementation — ``operators.batch_query.plain_mode``
        — shared with the batch path, so the per-query WAND router and
        the vectorized batch router can never drift on eligibility."""
        from search_engine_core_spark.operators.batch_query import plain_mode

        return plain_mode(ast)

    def search_with_meta(self, query: str, k: int = 10, highlight: bool = False) -> DataFrame:
        """Index-engine twin of ``SearchEngine.search_with_meta`` — the
        flagship GET /search result shape over the materialized index.
        Slim indexes (no content column) return metadata without a
        snippet; ``attach_content`` first to restore it."""
        from search_engine_core_spark.plans.planner import scoring_terms

        terms = scoring_terms(QueryParser().parse(query)) if highlight else []
        return _meta_with_snippet(
            self.search(query, k), self.reader.docs, terms, highlight
        )

    def suggest(self, prefix: str, k: int = 10) -> DataFrame:
        """S14 over the materialized index: FT.SUGGET analog — terms with
        the prefix from the index's df table, most frequent first. When
        the driver-resident dictionary is loaded, a real deployment would
        serve this with no Spark job; the DataFrame form keeps the result
        composable."""
        from search_engine_core_spark.operators.keywords import suggest

        return suggest(self.reader.dfreq, prefix, k)

    def search_wand(self, query: str, k: int = 10, **wand_kwargs) -> DataFrame:
        """Block-max WAND path. OR semantics over the query's canonical
        tokens (WAND is an OR-mode algorithm); explicit all-plain-term AND
        queries short-circuit to the semi-join AND path. Queries carrying
        field filters RAISE: WAND scores terms only, so silently dropping
        a ``lang:python`` filter would change result MEMBERSHIP (not just
        ranking) vs :meth:`search` — use :meth:`search` for filtered
        queries (it routes WAND-eligible shapes to WAND itself).
        ``wand_kwargs`` pass through to :meth:`WandTopK.topk`
        (``seed_cap``, ``survivor_cap``) so the driver-byte guards are
        tunable without reaching into the engine's internals."""
        from search_engine_core_spark.plans.planner import scoring_terms
        from search_engine_core_spark.plans.query_parser import And, Filter, Term

        ast = QueryParser().parse(query)

        def _has_filter(n) -> bool:
            if isinstance(n, Filter):
                return True
            return any(_has_filter(c) for c in getattr(n, "children", ()))

        if _has_filter(ast):
            raise ValueError(
                "search_wand scores plain terms only — a field filter "
                "would be silently ignored, changing result membership; "
                "use search(), which applies filters and still routes "
                "WAND-eligible shapes through WAND"
            )
        terms = scoring_terms(ast)
        mode = (
            "AND"
            if isinstance(ast, And)
            and all(isinstance(c, Term) and not c.exact for c in ast.children)
            or (isinstance(ast, Term) and not ast.exact)
            else "OR"
        )
        self.last_path = "wand"
        return self.wand.topk(terms, k, mode=mode, **wand_kwargs)

    def search_many(self, queries: list[str], k: int = 10,
                    algorithm: str = "bm25") -> DataFrame:
        """Batched evaluation over the materialized index: the union of
        all queries' tokens prunes ONE postings scan (decoded once,
        checkpoint-materialized), then ``operators/batch_query`` scores
        plain shapes vectorized and routes the rest through per-query
        Planner subtrees over the same decoded set — N queries cost one
        scan + one plan instead of N scheduling round-trips. Returns
        (query, doc_id, score); rank-identical to :meth:`search` per
        query (test-pinned). Route counts land in ``last_batch_stats``."""
        from search_engine_core_spark.operators.batch_query import search_many
        from search_engine_core_spark.operators.postings import decode_postings_df
        from search_engine_core_spark.plans.planner import scoring_terms

        if algorithm == "fielded":
            # the fielded scorer tokenizes with _extract_query (terms +
            # phrase tokens) — the union decode must cover exactly those
            # so batch candidates match the single-query path
            from search_engine_core_spark.functions.reference_scorer import (
                _extract_query,
            )
            from search_engine_core_spark.functions.tokenizer import tokenize_py

            if "content" not in self.reader.docs.columns:
                # fail before the eager union decode, like search() does
                raise ValueError(
                    "algorithm='fielded' needs the content column: "
                    "slim index readers must attach_content(corpus) first"
                )
            toks: set[str] = set()
            for q in queries:
                terms, phrases = _extract_query(q)
                toks.update(terms)
                toks.update(t for p in phrases for t in tokenize_py(p))
            all_toks = sorted(toks)
        else:
            parser = QueryParser()
            all_toks = sorted(
                {t for q in queries for t in scoring_terms(parser.parse(q))}
            )
        if all_toks:
            # (measured: repartitioning the ENCODED rows before decode to
            # widen the Arrow stage made BOTH cluster sizes slower on a
            # 512-query replay — the exchange of compressed payload bytes
            # + broken scan→decode pipelining cost more than the added
            # width bought; the decode is not the batch path's bottleneck)
            trip = decode_postings_df(
                self.reader.postings_for_terms(all_toks)
            ).localCheckpoint(eager=True)
        else:
            trip = self.spark.createDataFrame(
                [], "doc_id long, term string, tf long"
            )
        out, self.last_batch_stats = search_many(
            self.spark, queries, k, trip, self.reader.dfreq,
            self.reader.docs, self.stats, algorithm,
            self.field_map, self._phrase_docs_fn(),
        )
        return out
