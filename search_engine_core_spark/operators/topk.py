"""Query-time top-k over compressed postings: block-max WAND pruning.

The reference scores every FT.SEARCH hit then sorts
(``src/scoring/SearchScorer.cpp:603-622``); it never prunes. We add the
standard block-max WAND idea (Broder et al. 2003; Ding & Suel SIGIR'11),
adapted to a distributed two-pass shape that needs no coordinated cursor
state across executors:

  pass 1 (threshold seeding): fully decode the RAREST query term's
    postings (smallest df — cheapest), score those docs exactly over all
    query terms, and take the k-th best score as threshold θ.
  pass 2 (pruned union, OR semantics): for every other term t, a doc NOT
    containing the rarest term can score at most
        bound(t-block) = Σ_{t'≠t} ub(t') + block_ub(t, block)
    where ub(t') is the term's global upper bound (max_tf) and block_ub
    uses the block's max_tf — so each executor can discard whole blocks
    byte-unread (block offsets make the skip real, not just a filter).
  Survivors are decoded, scored exactly, unioned with pass-1 docs, and the
  final deterministic top-k (score desc, doc_id asc) is taken.

The score upper bound for a term uses doclen -> 0:
  ub = max(idf, 0) * tf*(k1+1)/(tf + k1*(1-b))     with tf = max_tf.
Negative-IDF (hot) terms contribute ub = 0 — they can only lower a score,
so they never rescue a pruned block; exact scoring still subtracts them.

AND semantics short-circuits WAND: candidates = docs holding ALL terms,
found by semi-joining decoded postings starting from the rarest term.

Results are rank-identical to the naive DataFrame path (tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_core_spark.functions.scoring import B, K1
from search_engine_core_spark.operators.stats import CorpusStats


def _idf(df: float, n: int) -> float:
    return float(np.log((n - df + 0.5) / (df + 0.5)))


def _tf_component_ub(tf: float) -> float:
    # doclen -> 0 bound of the BM25 tf saturation
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B))


def term_upper_bound(df: float, max_tf: float, n_docs: int) -> float:
    return max(_idf(df, n_docs), 0.0) * _tf_component_ub(max_tf)


def decode_pruned(
    postings: DataFrame,
    per_term_others_ub: dict[str, float],
    per_term_idf: dict[str, float],
    theta: float,
) -> DataFrame:
    """mapInPandas decode that skips blocks whose best possible total score
    stays under θ. ``per_term_others_ub[t]`` = Σ ub of the other query
    terms; block passes iff others_ub + idf⁺(t)·tf_ub(block_max_tf) ≥ θ."""

    def gen(batches):
        from search_engine_core_spark.operators.postings import decode_masked_batch

        for pdf in batches:
            others_row = pdf["term"].map(lambda t: per_term_others_ub.get(t, 0.0)).to_numpy(
                dtype=np.float64
            )
            idf_row = pdf["term"].map(
                lambda t: max(per_term_idf.get(t, 0.0), 0.0)
            ).to_numpy(dtype=np.float64)

            def bound_mask(bf, bl, bmax, rob):
                bm = bmax.astype(np.float64)
                bound = others_row[rob] + idf_row[rob] * (bm * (K1 + 1.0)) / (
                    bm + K1 * (1.0 - B)
                )
                return bound >= theta

            out = decode_masked_batch(pdf, bound_mask)
            if out is None:
                continue
            ids, tfs, val_row = out
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "term": pdf["term"].to_numpy()[val_row],
                    "tf": tfs.astype(np.int64),
                }
            )

    return postings.mapInPandas(gen, "doc_id long, term string, tf long")


def decode_score_for_docs(
    postings: DataFrame,
    bc_pairs,
    idf_map: dict[str, float],
    avgdl: float,
) -> DataFrame:
    """Fused block-targeted decode + exact BM25 partial scoring for a
    known doc set: one mapInPandas emits per-doc partial (score, n_terms)
    already pre-aggregated within each batch, so the seeded top-k needs
    NO broadcast-exchange of decoded triples and NO per-query docs-table
    join — the doclen lookup rides ``bc_pairs``, a Broadcast of
    ``(sorted ids int64, aligned doclens float64)`` fetched once with the
    seed ids. The BM25 expression mirrors ``WandTopK._score_exact``'s
    operation order (idf * (tf*(k1+1)) / denom) so scores agree with the
    naive path to float noise (<< the 1e-9 test tolerance)."""

    def gen(batches):
        from search_engine_core_spark.operators.postings import decode_masked_batch

        targets, dls = bc_pairs.value
        if targets.size == 0:
            return  # empty seed set: the membership probe would IndexError
        for pdf in batches:
            out = decode_masked_batch(
                pdf,
                lambda bf, bl, bmax, rob: np.searchsorted(targets, bf, "left")
                < np.searchsorted(targets, bl, "right"),
            )
            if out is None:
                continue
            ids, tfs, val_row = out
            pos = np.searchsorted(targets, ids)
            keep = (pos < targets.size) & (targets[np.minimum(pos, targets.size - 1)] == ids)
            if not keep.any():
                continue
            ids = ids[keep]
            tf = tfs[keep].astype(np.float64)
            dl = dls[pos[keep]]
            idf_row = pdf["term"].map(lambda t: idf_map.get(t, 0.0)).to_numpy(
                dtype=np.float64
            )
            idf = idf_row[val_row[keep]]
            ts = (idf * (tf * (K1 + 1.0))) / (tf + K1 * (1.0 - B + B * dl / avgdl))
            uids, inv = np.unique(ids, return_inverse=True)
            yield pd.DataFrame(
                {
                    "doc_id": uids,
                    "s": np.bincount(inv, weights=ts),
                    "nt": np.bincount(inv).astype(np.int64),
                }
            )

    return postings.mapInPandas(gen, "doc_id long, s double, nt long")


def score_triples_for_docs(
    trip: DataFrame,
    bc_pairs,
    idf_map: dict[str, float],
    avgdl: float,
) -> DataFrame:
    """Exact BM25 partials over PLAIN (doc_id, term, tf) triples for a
    known doc set — the update-tier twin of :func:`decode_score_for_docs`
    (which consumes compressed postings rows). It deliberately repeats
    that function's numpy expression, operation order and driver-side
    ``idf_map`` (np.log) so a tier doc and a main-live doc with identical
    (tf, doclen, df) produce BIT-IDENTICAL scores: the final top-k
    tie-breaks by doc_id only after scores compare equal, and a 1-ULP
    drift between np.log and the JVM's log is enough to flip an exact
    tie group's order vs the naive path (caught by the randomized LSM
    lifecycle test)."""

    def gen(batches):
        targets, dls = bc_pairs.value
        if targets.size == 0:
            return
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["doc_id"].to_numpy().astype(np.int64)
            pos = np.searchsorted(targets, ids)
            keep = (pos < targets.size) & (
                targets[np.minimum(pos, targets.size - 1)] == ids
            )
            if not keep.any():
                continue
            ids = ids[keep]
            tf = pdf["tf"].to_numpy().astype(np.float64)[keep]
            dl = dls[pos[keep]]
            idf = pdf["term"].map(lambda t: idf_map.get(t, 0.0)).to_numpy(
                dtype=np.float64
            )[keep]
            ts = (idf * (tf * (K1 + 1.0))) / (tf + K1 * (1.0 - B + B * dl / avgdl))
            uids, inv = np.unique(ids, return_inverse=True)
            yield pd.DataFrame(
                {
                    "doc_id": uids,
                    "s": np.bincount(inv, weights=ts),
                    "nt": np.bincount(inv).astype(np.int64),
                }
            )

    return trip.mapInPandas(gen, "doc_id long, s double, nt long")


class WandTopK:
    """Block-max two-pass top-k over an IndexReader.

    ``docs`` (optional) overrides the doclen source for exact scoring —
    the LSM read path passes its merged latest-wins docs view so update-
    tier docs (whose doclen differs from, or is absent in, the main
    index) score against their CURRENT length; main-live docs' rows are
    identical in both views, so the override is always safe."""

    #: per-query diagnostics, overwritten by every ``topk`` call (see
    #: the assignment sites for keys). Best-effort observability for a
    #: serving tier: scalars the driver already holds — recording them
    #: costs nothing. NOT synchronized: under concurrent searches on one
    #: engine, read it only for monitoring, never for control flow.
    last_stats: dict | None = None

    def __init__(self, reader, stats: CorpusStats, docs: DataFrame | None = None):
        self.reader = reader
        self.stats = stats
        self.docs = docs if docs is not None else reader.docs

    def _score_parts(
        self,
        trip: DataFrame,
        term_stats: dict[str, tuple[int, int]],
    ) -> DataFrame:
        """(doc_id, term, tf) restricted to query terms -> per-(doc, term)
        BM25 partials (doc_id, ts). Callers aggregate: ``_score_exact``
        sums to (doc_id, score); the LSM tier scorer also counts distinct
        matched terms for AND semantics."""
        n, avgdl = self.stats.n_docs, self.stats.avgdl
        # idf precomputed DRIVER-SIDE with np.log, the same _idf every
        # other WAND path uses (seed decode, tier scorer): a 1-ULP drift
        # between np.log and the JVM's log is enough to flip an exact tie
        # group at the k boundary, so survivors must not be the one path
        # scored with F.log
        idf_map = F.create_map(
            *[
                x
                for t, (d, _) in term_stats.items()
                for x in (F.lit(t), F.lit(_idf(float(d), n)))
            ]
        )
        doclen = self.docs.select("doc_id", "doclen")
        # trip is bounded (seed_cap x query terms); broadcasting it turns
        # the doclen lookup into a map-side hash join against the big docs
        # table — no shuffle of either side, which at 100 TB is the
        # difference between a per-query exchange and a column-pruned scan
        per = (
            doclen.join(F.broadcast(trip), "doc_id", "inner")
            .withColumn("idf", idf_map[F.col("term")])
            .withColumn(
                "ts",
                F.col("idf")
                * (F.col("tf") * (K1 + 1.0))
                / (
                    F.col("tf")
                    + K1 * (1.0 - B + B * F.col("doclen").cast("double") / float(avgdl))
                ),
            )
        )
        return per

    def _score_exact(
        self,
        trip: DataFrame,
        term_stats: dict[str, tuple[int, int]],
    ) -> DataFrame:
        """(doc_id, term, tf) restricted to query terms -> (doc_id, score).

        AND-candidate selection happens upstream (seed_agg folds the
        term-count into the fused decode+score aggregation); this helper
        only sums BM25 partials for an already-selected doc set."""
        return (
            self._score_parts(trip, term_stats)
            .groupBy("doc_id")
            .agg(F.sum("ts").alias("score"))
        )

    def topk(
        self,
        terms: list[str],
        k: int = 10,
        mode: str = "OR",
        # 1M ids ≈ 8 MB collected (Arrow) + a 16 MB (ids, doclens)
        # broadcast — comfortably driver-safe, and it keeps mid-frequency
        # terms (df ≈ N/4 at multi-million-doc corpora) on the pruned
        # WAND path instead of the full-decode fallback (r6: at a 2M-doc
        # index the old 200k cap sent every medium-term query through
        # the fallback, ~12 s vs ~2 s pruned)
        seed_cap: int = 1_000_000,
        survivor_cap: int | None = None,
        term_stats_override: dict[str, tuple[int, int]] | None = None,
        exclude_ids=None,
        extra_trip: DataFrame | None = None,
        extra_pairs=None,
    ) -> DataFrame:
        """terms must be canonical tokens. Returns (doc_id, score) top-k.

        The three trailing kwargs are the LSM composition hooks
        (``DeltaSearchEngine._wand_topk``): ``term_stats_override`` is a
        complete term -> (df, max_tf) map over the MERGED corpus (main ∖
        superseded ⊎ update tiers) — df must be exact (it feeds idf),
        max_tf may over-estimate (it only loosens upper bounds, which
        stays sound); ``exclude_ids`` is a sorted int64 ndarray of main
        docs superseded by an update tier — they are removed from the
        seed set, the pass-2 survivor set and the full-decode fallback,
        so a stale version can never score; ``extra_trip`` holds the
        update tiers' (doc_id, term, tf) triples for the query terms
        (latest-wins, disjoint from main-live docs by construction) —
        those docs are scored exactly from their own triples and merged
        into the seed top-k, so θ starts no lower than the tier's k-th
        score; ``extra_pairs`` is the matching (sorted tier doc ids
        int64, aligned latest-wins doclens float64) pair the tier scorer
        needs (required with ``extra_trip``).

        Decode discipline (the whole point of WAND): the ONLY term ever
        fully decoded is the RAREST one. Every other term is touched two
        ways, both block-skipping: (a) block-targeted decode restricted to
        the seed/survivor doc sets (binary search on block_first/block_last
        — misses are never byte-read), (b) the θ-pruned pass over block_max
        metadata. Hot terms with df≈N are never materialized, which is what
        kept the old eager ``decode_postings_df(postings)`` from scaling.
        ``seed_cap`` guards the driver-side seed-id collect; above it we
        degrade to the distributed full-decode path (correct, slower).
        ``survivor_cap`` (default: seed_cap) applies the same guard to the
        pass-2 survivor-id collect: a weakly-discriminative OR query (low
        θ, all terms mid-frequency) can pass millions of ids through an
        unguarded collect, so above the cap we fall back to the same
        distributed full decode — exact scoring of θ-pruned triples alone
        would NOT be rank-identical, since a survivor's pruned blocks may
        hide part of its true score."""
        spark = self.reader.spark
        # one dict per query, mutated at each stage so every early return
        # leaves an accurate trace; "path" is the coarse outcome label
        st = self.last_stats = {
            "path": "wand", "mode": mode, "terms": list(terms), "k": k,
            "rarest": None, "seed_size": 0, "theta": None,
            "early_exit": False, "survivors": 0, "tier": extra_trip is not None,
        }
        empty = spark.createDataFrame([], "doc_id long, score double")
        if not terms:
            st["path"] = "empty"
            return empty
        # NO cache: every pass re-reads the bucket-pruned parquet with
        # column pruning — caching would materialize the hot terms' binary
        # block payloads (exactly the bytes WAND exists to never touch).
        postings = self.reader.postings_for_terms(terms)
        from search_engine_core_spark.operators.postings import (
            decode_postings_df,
            decode_postings_for_docs,
        )

        # dictionary lookup: the driver-resident term dictionary answers
        # term -> (df, max_tf) with NO Spark job (real engines hold the
        # dictionary in RAM — the reference's RediSearch does entirely);
        # when the vocabulary exceeds the reader's size guard, fall back
        # to a per-query pruned metadata scan (one row per (term, shard),
        # no binary-column read). Measured alternatives at sf0.1: the
        # sequential metadata collect costs ~0.2 s/query of driver
        # scheduling; fusing it into the seed job (in-plan rarest term,
        # union with meta rows) or overlapping the two actions in threads
        # was SLOWER still — the chained broadcast sub-queries serialize
        # inside one job and cost more than the round-trip they replace.
        if term_stats_override is not None:
            term_stats = term_stats_override
        else:
            term_stats = self.reader.term_meta(terms)
            if term_stats is None:
                meta_rows = postings.select("term", "df", "max_tf").collect()
                term_stats = {}
                for r in meta_rows:
                    d0, m0 = term_stats.get(r["term"], (0, 0))
                    term_stats[r["term"]] = (d0 + int(r["df"]), max(m0, int(r["max_tf"])))
        present = [t for t in terms if t in term_stats]
        if not present:
            st["path"] = "empty"
            return empty
        n = self.stats.n_docs

        if mode == "AND" and len(present) < len(terms):
            st["path"] = "empty"
            return empty

        if exclude_ids is not None:
            exclude_ids = np.asarray(exclude_ids, dtype=np.int64)
            if exclude_ids.size == 0:
                exclude_ids = None
        _key = lambda r: (-r["score"], r["doc_id"])

        idfs = {t: _idf(d, n) for t, (d, _) in term_stats.items()}

        # update-tier candidates ride the SEED JOB: their exact BM25
        # partials (from their own triples, through the SAME numpy
        # expression + np.log idf map as the seed path — see
        # score_triples_for_docs; exact tie groups spanning tier and
        # main-live docs must order identically to the naive path) are
        # unioned with the seed partials BEFORE the top-k aggregation,
        # so the tier costs a plan branch, not an extra driver job. Doc
        # sets are disjoint (tier docs are excluded from main), so the
        # shared groupBy/_nt/θ machinery is exact for both.
        def _with_tier(contrib: DataFrame) -> DataFrame:
            if extra_trip is None:
                return contrib
            bc_tier = spark.sparkContext.broadcast(
                (
                    np.asarray(extra_pairs[0], dtype=np.int64),
                    np.asarray(extra_pairs[1], dtype=np.float64),
                )
            )
            return contrib.unionByName(
                score_triples_for_docs(
                    extra_trip.filter(F.col("term").isin(present)),
                    bc_tier,
                    idfs,
                    self.stats.avgdl,
                )
            )

        def _fallback() -> DataFrame:
            exclude_df = (
                spark.createDataFrame(
                    [(int(i),) for i in exclude_ids], "doc_id long"
                )
                if exclude_ids is not None
                else None
            )
            rows = self._topk_full_decode(
                postings, term_stats, present, k, mode,
                exclude_df=exclude_df, extra_trip=extra_trip,
            )
            return spark.createDataFrame(rows, "doc_id long, score double") if rows else empty

        rarest = min(present, key=lambda t: term_stats[t][0])
        rare_post = postings.filter(F.col("term") == rarest)
        rest_post = postings.filter(F.col("term") != rarest)

        st["rarest"] = rarest
        if term_stats[rarest][0] > seed_cap:
            # degenerate query: every term is hot — fall back to the
            # distributed full decode (no driver-side id set).
            st["path"] = "full_decode_fallback"
            return _fallback()

        # pass 1: decode ONLY the rarest term, and collect ONLY its doc-id
        # array (bounded by seed_cap) in ONE job — the id set must reach
        # the driver to parameterize the block-targeted decode, but
        # nothing else does. Doclens come from the reader's resident norms
        # (Lucene-style; no per-query docs join) when the corpus fits the
        # guard, else from a broadcast-join against the docs table. The
        # (ids, doclens) pair goes back out as ONE broadcast; everything
        # downstream is one fused distributed job (decode + score + agg +
        # TakeOrdered) with no broadcast-exchange of decoded triples (the
        # r2 wand_1 regression was exactly these extra job chains).
        # toArrow, NOT toPandas: pandas may widen long columns, and 64-bit
        # doc ids are not float64-representable past the 53-bit mantissa.
        norms = self.reader.norms()
        if norms is not None:
            ids_tbl = decode_postings_df(rare_post).select("doc_id").toArrow()
            rare_ids = np.sort(ids_tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))
            if exclude_ids is not None:
                rare_ids = rare_ids[np.isin(rare_ids, exclude_ids, invert=True)]
            dls = norms[1][np.searchsorted(norms[0], rare_ids)] if rare_ids.size else np.empty(0)
        else:
            pairs = (
                self.reader.docs.select("doc_id", "doclen")
                .join(F.broadcast(decode_postings_df(rare_post).select("doc_id")), "doc_id")
                .toArrow()
            )
            ids_np = pairs["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            dls_np = pairs["doclen"].to_numpy(zero_copy_only=False).astype(np.float64)
            order = np.argsort(ids_np)
            rare_ids = ids_np[order]
            dls = dls_np[order]
            if exclude_ids is not None:
                keep = np.isin(rare_ids, exclude_ids, invert=True)
                rare_ids, dls = rare_ids[keep], dls[keep]
        st["seed_size"] = int(rare_ids.size)
        if rare_ids.size == 0 and extra_trip is None:
            st["path"] = "empty"
            return empty
        # rare_ids may be empty with update tiers present (a term so far
        # seen only in a tier): main seeding is a no-op, the tier branch
        # of the seed job still produces candidates, and pass 2 still
        # sweeps the other terms' main postings.
        bc_pairs = spark.sparkContext.broadcast((rare_ids, dls))
        # all terms incl. the rarest: for the rarest the target set is its
        # own doc set, so block-targeting degrades to the full decode —
        # one operator, no union, and hot terms stay block-skipped.
        seed_agg = (
            _with_tier(decode_score_for_docs(postings, bc_pairs, idfs, self.stats.avgdl))
            .groupBy("doc_id")
            .agg(F.sum("s").alias("score"), F.sum("nt").alias("_nt"))
        )

        if mode == "AND":
            # AND needs no θ machinery: candidates = docs holding ALL
            # terms (term-count rides the same agg), already restricted
            # to the rarest term's doc set (or, for tier docs, their own
            # complete triples). One distributed chain.
            rows = (
                seed_agg.filter(F.col("_nt") == len(present))
                .select("doc_id", "score")
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k)
                .collect()
            )
            st["path"] = "and_semijoin"
            return spark.createDataFrame(rows, "doc_id long, score double") if rows else empty

        seed_top = (
            seed_agg.select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        theta = seed_top[-1]["score"] if len(seed_top) >= k else float("-inf")
        st["theta"] = theta

        ubs = {t: term_upper_bound(d, m, n) for t, (d, m) in term_stats.items()}
        # early exit: a doc WITHOUT the rarest term scores at most the sum
        # of the other terms' upper bounds; when that bound cannot reach θ
        # the seed top-k is final — pass 2 (and its two jobs) never runs.
        # Discriminative queries (rare term carries the IDF mass) take
        # this path, leaving WAND at 3 driver jobs total.
        if theta > sum(u for t2, u in ubs.items() if t2 != rarest):
            st["early_exit"] = True
            return (
                spark.createDataFrame(seed_top, "doc_id long, score double")
                if seed_top
                else empty
            )

        # pass 2: θ-pruned decode of the other terms (block-max skipping),
        # survivors = pruned docs not already seeded
        others_ub = {t: sum(u for t2, u in ubs.items() if t2 != t) for t in ubs}
        pruned_trip = decode_pruned(rest_post, others_ub, idfs, theta)
        # bounded collect: at most cap+1 rows ever reach the driver; the
        # sentinel row detects overflow without materializing the full
        # set. toArrow, not collect(): at the raised cap a Row-object
        # list would cost ~100 B/row of driver heap for the same ids.
        cap = seed_cap if survivor_cap is None else survivor_cap
        surv_tbl = (
            pruned_trip.select("doc_id").distinct().limit(cap + 1).toArrow()
        )
        st["survivors"] = surv_tbl.num_rows
        if surv_tbl.num_rows > cap:
            st["path"] = "survivor_overflow_fallback"
            return _fallback()
        pruned_ids = surv_tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if exclude_ids is not None:
            # superseded docs can survive θ-pruning (their stale postings
            # are still in main) — they must never be exact-scored
            pruned_ids = np.setdiff1d(pruned_ids, exclude_ids)
        extra_ids = np.setdiff1d(pruned_ids, rare_ids)
        if extra_ids.size == 0:
            return (
                spark.createDataFrame(seed_top, "doc_id long, score double")
                if seed_top
                else empty
            )
        # exact scoring for survivors: block-targeted decode of ALL their
        # terms (survivors hold no rarest-term postings by construction)
        surv_trip = decode_postings_for_docs(rest_post, extra_ids)
        extra_top = (
            self._score_exact(surv_trip, term_stats)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        merged = sorted(list(seed_top) + list(extra_top), key=_key)[:k]
        return spark.createDataFrame(merged, "doc_id long, score double") if merged else empty

    def _topk_full_decode(
        self,
        postings: DataFrame,
        term_stats,
        present: list[str],
        k: int,
        mode: str,
        exclude_df: DataFrame | None = None,
        extra_trip: DataFrame | None = None,
    ) -> list:
        """Fallback when even the rarest term exceeds the seed cap (or the
        survivor cap overflows): one distributed decode + exact scoring
        (no pruning possible — every candidate can reach θ when all terms
        are hot). ``exclude_df``/``extra_trip`` keep the LSM composition
        exact on this path too: superseded main docs are anti-joined out
        and the update tiers' triples are unioned in before scoring."""
        from search_engine_core_spark.operators.postings import decode_postings_df

        trip = decode_postings_df(postings)
        if exclude_df is not None:
            trip = trip.join(exclude_df, "doc_id", "left_anti")
        if extra_trip is not None:
            trip = trip.unionByName(
                extra_trip.filter(F.col("term").isin(present)).select(
                    "doc_id", "term", "tf"
                )
            )
        if mode == "AND":
            cand = (
                trip.groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("_nt"))
                .filter(F.col("_nt") == len(present))
                .select("doc_id")
            )
            trip = trip.join(cand, "doc_id", "left_semi")
        return (
            self._score_exact(trip, term_stats)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
