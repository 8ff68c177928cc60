"""Reference-parity fielded scorer — the exact semantics of the C++
``SearchScorer`` (``/root/reference/src/scoring/SearchScorer.cpp``), as
Catalyst column expressions over a fielded documents DataFrame
(url, title, content, description, domain, keywords?, score).

Preserved quirks (each cited):
* corpus stats default to N=1000, avgdl=100 unless updated
  (``SearchScorer.h:157-159``) — scoreResults on a raw corpus uses these;
* per-field doclen is the CHARACTER length (``SearchScorer.cpp:141,152``),
  not token count (the canonical single-field engine uses token count);
* unseen terms get df=0 via ``documentFrequencies_[term]`` default-insert
  (``SearchScorer.cpp:146``);
* ``matchedTerms`` increments ONLY in the title branch
  (``SearchScorer.cpp:150``) — coverage is title-coverage, a reference bug
  we replicate verbatim;
* exact-phrase boost: +exactMatchBoost*w_title if the phrase substring-
  matches the title, +exactMatchBoost*w_content for content
  (``SearchScorer.cpp:194-202``), case-insensitive;
* baseScore multiplies the total when > 0 (``SearchScorer.cpp:208-211``);
* title-match boost uses CASE-SENSITIVE ``title.find(term)`` on the raw
  title with the lowercased term (``SearchScorer.cpp:509-516``) — so it
  usually fires only for lowercase titles; replicated verbatim;
* domain boost for github.com / stackoverflow.com
  (``SearchScorer.cpp:505-507``);
* keyword branch (``SearchScorer.cpp:183-189``): per query term, if ANY
  keyword matches it (word-boundary ≈ token containment), add exactly
  1.0*keywords_w once (the reference breaks after the first keyword);
* drop results below minScore=0.01, THEN min-max normalize to [0,1]
  (``SearchScorer.cpp:581-600``).

A pure-Python twin (``score_results_py``) mirrors every step for
rank+score identity tests.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_engine_core_spark.functions.tokenizer import tokenize_py


@dataclass
class ScoringConfig:
    title_w: float = 5.0
    description_w: float = 3.0
    content_w: float = 1.0
    keywords_w: float = 4.0
    k1: float = 1.2
    b: float = 0.75
    exact_match_boost: float = 2.0
    title_match_boost: float = 1.5
    domain_authority_boost: float = 1.2
    min_score: float = 0.01
    normalize: bool = True

    @staticmethod
    def default() -> "ScoringConfig":
        return ScoringConfig()

    @staticmethod
    def title_heavy() -> "ScoringConfig":
        # SearchScorer.cpp:20-27
        return ScoringConfig(
            title_w=10.0, description_w=2.0, content_w=0.5, title_match_boost=2.0
        )

    @staticmethod
    def content_heavy() -> "ScoringConfig":
        # SearchScorer.cpp:29-36 (tf cap 20 applies to the TF-IDF path)
        return ScoringConfig(title_w=3.0, content_w=2.0, description_w=1.5)

    @staticmethod
    def balanced() -> "ScoringConfig":
        # SearchScorer.cpp:38-47
        return ScoringConfig(
            title_w=3.0,
            description_w=2.0,
            content_w=1.5,
            keywords_w=2.5,
            exact_match_boost=1.5,
            title_match_boost=1.2,
        )


@dataclass
class ReferenceStats:
    """BM25Algorithm's mutable corpus stats with the reference defaults."""

    n_docs: int = 1000
    avgdl: float = 100.0
    dfreq: dict[str, int] = field(default_factory=dict)

    @staticmethod
    def from_docs(rows: list[dict]) -> "ReferenceStats":
        """updateCorpusStatistics (SearchScorer.cpp:225-255): char lengths
        of content+title+description; df over the union of field tokens."""
        n = len(rows)
        total_len = 0.0
        dfreq: dict[str, int] = {}
        for r in rows:
            title, content, desc = (r.get("title") or "", r.get("content") or "", r.get("description") or "")
            total_len += len(content) + len(title) + len(desc)
            seen = set(tokenize_py(title)) | set(tokenize_py(content)) | set(tokenize_py(desc))
            for t in seen:
                dfreq[t] = dfreq.get(t, 0) + 1
        return ReferenceStats(n, total_len / n if n else 100.0, dfreq)


def _extract_query(query: str) -> tuple[list[str], list[str]]:
    """extractQueryInfo (SearchScorer.cpp:475-500): tokenize the RAW query
    (quotes and all), plus quoted phrases by regex."""
    terms = tokenize_py(query)
    phrases = re.findall(r'"([^"]+)"', query)
    return terms, phrases


def _bm25(tf: int, doclen: int, df: int, stats: ReferenceStats, cfg: ScoringConfig) -> float:
    if tf == 0 or stats.n_docs == 0:
        return 0.0
    idf = math.log((stats.n_docs - df + 0.5) / (df + 0.5))
    norm = doclen / stats.avgdl
    return idf * (tf * (cfg.k1 + 1)) / (tf + cfg.k1 * (1 - cfg.b + cfg.b * norm))


def score_results_py(
    rows: list[dict],
    query: str,
    cfg: ScoringConfig | None = None,
    stats: ReferenceStats | None = None,
    top_k: int | None = None,
) -> list[dict]:
    """Pure-Python port of SearchScorer::scoreResults + rankResults.
    Tiebreak for rankResults' unstable std::sort: (score desc, url asc)."""
    cfg = cfg or ScoringConfig()
    stats = stats or ReferenceStats()
    terms, phrases = _extract_query(query)
    out = []
    for r in rows:
        title, content, desc = (r.get("title") or "", r.get("content") or "", r.get("description") or "")
        domain = r.get("domain") or ""
        kw_raw = r.get("keywords") or []
        keywords = kw_raw.split("|") if isinstance(kw_raw, str) else list(kw_raw)
        try:
            base = float(r.get("score") or 0.0)
        except ValueError:
            base = 1.0
        tf_title, tf_content, tf_desc = (
            _tf_map(title),
            _tf_map(content),
            _tf_map(desc),
        )
        title_s = content_s = desc_s = kw_s = 0.0
        matched = 0
        for t in terms:
            df = stats.dfreq.get(t, 0)
            tt = tf_title.get(t, 0)
            if tt > 0:
                title_s += _bm25(tt, len(title), df, stats, cfg) * cfg.title_w
                matched += 1  # reference counts matches only here
            tc = tf_content.get(t, 0)
            if tc > 0:
                content_s += _bm25(tc, len(content), df, stats, cfg) * cfg.content_w
            if desc:
                td = tf_desc.get(t, 0)
                if td > 0:
                    desc_s += _bm25(td, len(desc), df, stats, cfg) * cfg.description_w
            # keyword branch (SearchScorer.cpp:183-189): +1.0*keywords_w per
            # query term matching ANY keyword (word-boundary countTerm-
            # Occurrences ≈ token containment under the canonical tokenizer),
            # break after the first matching keyword.
            for kw in keywords:
                if t in tokenize_py(kw):
                    kw_s += 1.0 * cfg.keywords_w
                    break
        exact = 0.0
        for p in phrases:
            pl = p.lower()
            if pl and pl in title.lower():
                exact += cfg.exact_match_boost * cfg.title_w
            if pl and pl in content.lower():
                exact += cfg.exact_match_boost * cfg.content_w
        total = title_s + content_s + desc_s + kw_s + exact
        if base > 0:
            total *= base
        boost = 0.0
        if domain in ("github.com", "stackoverflow.com"):
            boost += cfg.domain_authority_boost
        if any(t in title for t in terms):  # case-sensitive find, verbatim
            boost += cfg.title_match_boost
        total *= 1.0 + boost
        out.append(
            {
                "url": r.get("url"),
                "score": total,
                "title_score": title_s,
                "content_score": content_s,
                "exact_score": exact,
                "matched_terms": matched,
                "coverage": matched / len(terms) if terms else 0.0,
                "boost": boost,
            }
        )
    out = [o for o in out if o["score"] >= cfg.min_score]
    if cfg.normalize and out:
        lo = min(o["score"] for o in out)
        hi = max(o["score"] for o in out)
        if hi - lo > 0:
            for o in out:
                o["score"] = (o["score"] - lo) / (hi - lo)
    out.sort(key=lambda o: (-o["score"], o["url"]))
    return out[:top_k] if top_k else out


def _tf_map(text: str) -> dict[str, int]:
    m: dict[str, int] = {}
    for t in tokenize_py(text):
        m[t] = m.get(t, 0) + 1
    return m


# --------------------------------------------------------------- Spark side
def _field_expr(col, term: str):
    """tf of term in a field via the canonical tokenizer, JVM-side."""
    from search_engine_core_spark.functions.tokenizer import tokenize_expr

    return F.size(F.filter(tokenize_expr(col), lambda x: x == F.lit(term)))


def _bm25_expr(tf, doclen, df: int, stats: ReferenceStats, cfg: ScoringConfig):
    idf = math.log((stats.n_docs - df + 0.5) / (df + 0.5))
    norm = doclen.cast("double") / float(stats.avgdl)
    return F.when(
        tf > 0,
        F.lit(idf) * (tf * (cfg.k1 + 1)) / (tf + cfg.k1 * (1 - cfg.b + cfg.b * norm)),
    ).otherwise(F.lit(0.0))


def score_results(
    docs: DataFrame,
    query: str,
    cfg: ScoringConfig | None = None,
    stats: ReferenceStats | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """Spark twin of ``score_results_py``: one declarative plan, no UDFs.

    Query terms are plan literals (queries are tiny); docs is the
    distributed side. Returns (url, score, title_score, content_score,
    exact_score, matched_terms, coverage, boost) ordered (score desc,
    url asc), limited to top_k when given.
    """
    cfg = cfg or ScoringConfig()
    stats = stats or ReferenceStats()
    terms, phrases = _extract_query(query)

    title = F.coalesce(F.col("title"), F.lit(""))
    content = F.coalesce(F.col("content"), F.lit(""))
    desc = F.coalesce(F.col("description"), F.lit(""))
    domain = F.coalesce(F.col("domain"), F.lit(""))
    base = F.coalesce(F.col("score"), F.lit(0.0)).cast("double")
    # keywords: array<string> or '|'-joined string column (F20), optional
    if "keywords" in docs.columns:
        kw_arr = (
            F.split(F.coalesce(F.col("keywords"), F.lit("")), r"\|")
            if dict(docs.dtypes)["keywords"] == "string"
            else F.coalesce(F.col("keywords"), F.array())
        )
    else:
        kw_arr = None

    from search_engine_core_spark.functions.tokenizer import tokenize_expr

    title_s = F.lit(0.0)
    content_s = F.lit(0.0)
    desc_s = F.lit(0.0)
    kw_s = F.lit(0.0)
    matched = F.lit(0)
    for t in terms:
        df = stats.dfreq.get(t, 0)
        tt = _field_expr(title, t)
        tc = _field_expr(content, t)
        td = _field_expr(desc, t)
        title_s = title_s + _bm25_expr(tt, F.length(title), df, stats, cfg) * cfg.title_w
        content_s = content_s + _bm25_expr(tc, F.length(content), df, stats, cfg) * cfg.content_w
        desc_s = desc_s + F.when(
            F.length(desc) > 0, _bm25_expr(td, F.length(desc), df, stats, cfg) * cfg.description_w
        ).otherwise(F.lit(0.0))
        matched = matched + F.when(tt > 0, F.lit(1)).otherwise(F.lit(0))
        if kw_arr is not None:
            # keyword branch (SearchScorer.cpp:183-189): ONE +keywords_w per
            # term if any keyword contains it (break ≡ exists), word-boundary
            # match ≈ token containment under the canonical tokenizer.
            has_kw = F.exists(
                kw_arr, lambda kw: F.array_contains(tokenize_expr(kw), t)
            )
            kw_s = kw_s + F.when(has_kw, F.lit(1.0 * cfg.keywords_w)).otherwise(
                F.lit(0.0)
            )

    exact = F.lit(0.0)
    for p in phrases:
        pl = p.lower()
        exact = exact + F.when(
            F.instr(F.lower(title), F.lit(pl)) > 0, F.lit(cfg.exact_match_boost * cfg.title_w)
        ).otherwise(F.lit(0.0))
        exact = exact + F.when(
            F.instr(F.lower(content), F.lit(pl)) > 0, F.lit(cfg.exact_match_boost * cfg.content_w)
        ).otherwise(F.lit(0.0))

    total = title_s + content_s + desc_s + kw_s + exact
    total = F.when(base > 0, total * base).otherwise(total)

    boost = F.when(domain.isin("github.com", "stackoverflow.com"), F.lit(cfg.domain_authority_boost)).otherwise(F.lit(0.0))
    if terms:
        title_has_term = None
        for t in terms:
            cond = F.instr(title, F.lit(t)) > 0  # case-sensitive, verbatim
            title_has_term = cond if title_has_term is None else (title_has_term | cond)
        boost = boost + F.when(title_has_term, F.lit(cfg.title_match_boost)).otherwise(F.lit(0.0))
    total = total * (1.0 + boost)

    # doc_id passthrough: a caller that carries its own key avoids joining
    # back on url, which is not injective (repo='org', path='repo/x.py'
    # collides with repo='org/repo', path='x.py')
    id_cols = ["doc_id"] if "doc_id" in docs.columns else []
    scored = docs.select(
        *id_cols,
        "url",
        total.alias("score"),
        title_s.alias("title_score"),
        content_s.alias("content_score"),
        exact.alias("exact_score"),
        matched.alias("matched_terms"),
        (matched.cast("double") / F.lit(float(len(terms) or 1))).alias("coverage"),
        boost.alias("boost"),
    ).filter(F.col("score") >= cfg.min_score)

    if cfg.normalize:
        # global min/max via a ONE-ROW aggregate broadcast back in — an
        # unpartitioned Window would funnel the whole scored set through
        # a single task to compute the same two numbers
        bounds = F.broadcast(
            scored.agg(
                F.min("score").alias("_lo"), F.max("score").alias("_hi")
            )
        )
        scored = (
            scored.crossJoin(bounds)
            .withColumn(
                "score",
                F.when(
                    F.col("_hi") - F.col("_lo") > 0,
                    (F.col("score") - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo")),
                ).otherwise(F.col("score")),
            )
            .drop("_lo", "_hi")
        )
    scored = scored.orderBy(F.desc("score"), F.asc("url"))
    return scored.limit(top_k) if top_k else scored


def fielded_topk(docs: DataFrame, query: str, k: int = 10,
                 cfg: ScoringConfig | None = None,
                 stats: ReferenceStats | None = None,
                 trip: DataFrame | None = None) -> DataFrame:
    """X1/X4 wiring for ``search(algorithm="fielded")``: map a code-corpus
    table (doc_id, repo, path, content) onto the reference's web-document
    fields and run the flagship fielded scorer
    (``SearchScorer::scoreResults``, ``src/scoring/SearchScorer.cpp``):

      url := repo "/" path   title := path       content := content
      description := ""      domain := repo      base score := 0

    Output matches the other algorithms' contract: (doc_id, score),
    deterministic order (score desc, doc_id asc), top-k. doc_id rides
    through :func:`score_results` directly — no url join-back, whose
    slash-joined key is not injective across (repo, path) splits.

    ``trip`` (doc_id, term, tf) restricts scoring to HITS — docs holding
    at least one query token — which is the reference's actual shape:
    ``SearchScorer::scoreResults`` runs over the FT.SEARCH result set,
    never the whole corpus (``SearchScorer.cpp:603-622``). At 100 TB this
    is the difference between a per-query full-corpus scan and a
    postings-pruned candidate set; engines pass their triples/decoded
    postings, callers without an index may omit it (full scan).
    The index triples cover CONTENT only, so the candidate set also
    admits docs whose title (path) contains a query token — a map-side
    predicate over the docs table's path column, no extra scan shape —
    or a title-only match (path='setup.py', content without 'setup')
    would be silently unscorable through the pruned path while scoring
    fine on the full scan. Phrase hits buried mid-identifier are NOT
    widened: the reference's own FT.SEARCH candidates are token-based,
    so the pruned path matches reference recall there (the no-trip full
    scan is strictly more generous, documented deviation)."""
    if trip is not None:
        terms, phrases = _extract_query(query)
        toks = list(dict.fromkeys(terms + [t for p in phrases for t in tokenize_py(p)]))
        if toks:
            cand = trip.filter(F.col("term").isin(toks)).select("doc_id").distinct()
            lp = F.lower(F.coalesce(F.col("path"), F.lit("")))
            title_hit = F.lit(False)
            for t in toks:
                title_hit = title_hit | F.contains(lp, F.lit(t))
            docs = (
                docs.join(
                    cand.withColumn("_hit", F.lit(1)), "doc_id", "left"
                )
                .filter((F.col("_hit") == 1) | title_hit)
                .drop("_hit")
            )
    fielded = docs.select(
        F.col("doc_id"),
        F.concat_ws("/", F.coalesce(F.col("repo"), F.lit("")), F.col("path")).alias("url"),
        F.coalesce(F.col("path"), F.lit("")).alias("title"),
        F.col("content"),
        F.lit("").alias("description"),
        F.coalesce(F.col("repo"), F.lit("")).alias("domain"),
        F.lit(0.0).alias("score"),
    )
    scored = score_results(fielded, query, cfg, stats)
    return (
        scored.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
