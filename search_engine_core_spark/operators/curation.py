"""End-to-end corpus curation: C4 → span dedup → Gopher → optional
CCNet perplexity gate → optional MinHash near-dup cluster removal →
PII, with a per-document, per-rule attribution report and a one-row
funnel.

Composes the public web-corpus recipe (Raffel et al. 2020 §2.2 cleaning,
Rae et al. 2021 Appendix-A quality/repetition gates, regex PII
scrubbing) the way production curation stacks (DataTrove, NeMo Curator,
CCNet) chain them. The reference engine has no analog — like
``operators/sampling.py`` this is training-data-pipeline surface the
brief adds beyond reference parity.

Two consumption shapes:

* :func:`curate` — the corpus that survives, PII-redacted. The fastest
  path: each stage's rows drop before the next stage runs, so Gopher
  never scores a C4 reject.
* :func:`curation_report` — EVERY input doc with per-rule booleans
  (``c4_pass``, ``span_changed``, ``gopher_quality_pass``,
  ``gopher_repetition_pass``, ``kept``), the staged texts, and PII
  counts. This is the debugging/audit surface: at 100 TB the question
  is never just "how many dropped" but "which rule, and show me ten" —
  a report row answers both, and :func:`curation_funnel` folds it to a
  one-row stage-count summary in a single aggregate job.

Why a report instead of ``Observation`` counters riding :func:`curate`:
the span-dedup operator consumes its input in several plan branches
(span extraction, the winners groupBy, the join-back), so a
``CollectMetrics`` node placed upstream executes once PER BRANCH and
over-counts — the funnel-over-report shape keeps every audited edge
consumed exactly once instead.

Scale shape: one pass. C4 flags and staged text are column expressions;
span dedup contributes its one corpus-level shuffle (restricted to the
C4 survivors, matching :func:`curate`'s semantics) plus a join of its
REWRITES back to the report spine — duplicated spans are a small
fraction of a real corpus, so that join's build side is small and AQE
broadcasts it; Gopher/PII flags are map-side on the joined result. The
funnel is a map-side-combinable global aggregate (13 sums, one row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_core_spark.functions.c4 import c4_clean_lines, c4_doc_pass, c4_filter
from search_engine_core_spark.functions.gopher import (
    gopher_filter,
    gopher_quality_pass,
    gopher_repetition_pass,
    split_gopher_thresholds,
)
from search_engine_core_spark.functions.pii import pii_counts, redact_pii
from search_engine_core_spark.operators.components import canonical_docs, dedup_groups
from search_engine_core_spark.operators.dedup import minhash_lsh_pairs
from search_engine_core_spark.operators.lm import (
    perplexity_filter,
    perplexity_verdicts,
)
from search_engine_core_spark.operators.spans import (
    dedup_three_sentence_spans,
    dedup_token_windows,
)

__all__ = ["curate", "curate_code", "curation_report", "curation_funnel"]


def _split_opts(c4_opts: dict | None, gopher_opts: dict | None) -> tuple[dict, dict, dict]:
    """(c4 line/page kwargs, gopher quality kwargs, gopher repetition
    kwargs) — the gopher routing/validation is gopher.py's own
    :func:`split_gopher_thresholds`, not a copy."""
    q_kw, r_kw = split_gopher_thresholds(dict(gopher_opts or {}))
    return dict(c4_opts or {}), q_kw, r_kw


def _near_dup_opts(near_dup: dict) -> tuple[dict, str]:
    """(minhash_lsh_pairs kwargs, components algorithm)."""
    nd = dict(near_dup)
    algorithm = nd.pop("algorithm", "label")
    allowed = {"n_perm", "n_bands", "max_bucket"}
    unknown = set(nd) - allowed
    if unknown:
        raise TypeError(
            f"curation near_dup: unknown options {sorted(unknown)} "
            f"(allowed: {sorted(allowed)} + 'algorithm')"
        )
    return nd, algorithm


def _require_numeric_id(df: DataFrame, id_col: str) -> None:
    """Fail FAST (schema check, before any job runs) when near-dup is
    requested over a non-numeric id: the component resolver casts ids to
    long (``components.py``), so a string id (URL, content hash) would
    run the whole gate pipeline and then die mid-job with a cast error —
    or, with ANSI off, cast to NULL and silently keep every duplicate."""
    from pyspark.sql import types as T

    dt = df.schema[id_col].dataType
    if not isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise TypeError(
            f"curation near_dup: id column {id_col!r} is {dt.simpleString()}, "
            "but near-dup component resolution requires an integral id — "
            "derive one first (e.g. withColumn(id, F.xxhash64(url)))"
        )


def curate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    c4_opts: dict | None = None,
    gopher_opts: dict | None = None,
    token_windows: int | None = None,
    ppl_opts: dict | None = None,
    near_dup: dict | None = None,
    pii_kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
    impl: str = "pandas",
) -> DataFrame:
    """The surviving, PII-redacted corpus: C4 line-clean + page gates →
    corpus-level three-sentence-span dedup → optional token-window
    exact-substring removal → Gopher quality/repetition gates →
    optional CCNet perplexity gate → optional MinHash near-dup removal
    → PII redaction.
    Row-identical to ``curation_report(...).filter("kept")`` with the
    redacted text (pinned in tests).

    ``token_windows`` (an int, e.g. the Lee-et-al 50) switches on the
    second rewrite stage, ``operators.spans.dedup_token_windows`` —
    RefinedWeb runs exactly this pairing (fuzzy dedup + exact-substring
    removal). Rewrites come BEFORE the Gopher gates so quality scores
    the final text.

    ``near_dup`` (a dict, ``{}`` for defaults) switches on near-dup
    cluster removal: MinHash-LSH candidate pairs → connected components
    → keep the min-id doc per cluster (``operators.dedup`` +
    ``operators.components``, the repo's standard keep-the-minimum
    rule). Keys: ``n_perm``, ``n_bands``, ``max_bucket`` (LSH), and
    ``algorithm`` ("label" | "star") for the component resolver.
    Deliberately AFTER the quality gates (the RefinedWeb/Gopher order):
    the gates are map-side and cheap, dedup is the corpus shuffle —
    filtering first shrinks the shuffle. LSH false positives merge
    non-identical docs at the configured band/permutation rate; tune
    ``n_perm``/``n_bands`` rather than post-verifying pairs. Setting
    ``near_dup`` makes the call EAGER: the iterative component resolver
    checkpoints per round, and the survivor frame is localCheckpointed
    so the gate pipeline runs once, not once per plan branch. Requires
    an integral id column (checked up front).

    ``ppl_opts`` (a dict, keys of
    :func:`~search_engine_core_spark.operators.lm.perplexity_verdicts`:
    ``max_ppl`` OR ``keep_frac``, plus ``k`` / ``train_docs`` /
    ``broadcast_lm`` — the last selects the bounded-LM fast scoring
    plan, see ``doc_perplexity``) switches
    on the CCNet perplexity gate — between the Gopher gates and the
    near-dup shuffle (LM scoring is one corpus-level join over the gate
    survivors; dropping the tail first shrinks the heavier MinHash
    stage). ``keep_frac`` is resolved with the exact ``percentile``
    aggregate here (partitioning-independent, so
    :func:`curation_report` reproduces the identical threshold from its
    own plan); the stage then localCheckpoints the survivor frame —
    like ``near_dup``, this makes the call eager."""
    c4_o, gq_o, gr_o = _split_opts(c4_opts, gopher_opts)
    out = c4_filter(df, text_col, **c4_o)
    out = dedup_three_sentence_spans(out, text_col, id_col)
    if token_windows is not None:
        out = dedup_token_windows(out, text_col, id_col, window=token_windows)
    out = gopher_filter(out, text_col, impl=impl, **gq_o, **gr_o)
    if ppl_opts is not None:
        # checkpoint first: threshold resolution is an action, and the
        # semi-join's final action would otherwise re-run the whole gate
        # pipeline (same discipline as the near_dup stage below)
        out = out.localCheckpoint(eager=True)
        out = perplexity_filter(
            out, text_col, id_col, **{"approx": False, **ppl_opts}
        )
    if near_dup is not None:
        nd_kw, algorithm = _near_dup_opts(near_dup)
        _require_numeric_id(df, id_col)
        # the component resolver checkpoints eagerly per round, which
        # would execute the gate pipeline NOW for the pairs branch and
        # AGAIN at the caller's action for the join-back — checkpoint the
        # survivor frame once so both branches read it (this makes
        # curate() eager when near_dup is set; documented trade).
        out = out.localCheckpoint(eager=True)
        pairs = minhash_lsh_pairs(out, text_col, id_col, **nd_kw)
        out = canonical_docs(out, pairs, id_col, algorithm=algorithm)
    return out.withColumn(text_col, redact_pii(text_col, pii_kinds))


def curate_code(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
    *,
    code_opts: dict | None = None,
    token_windows: int | None = None,
    near_dup: dict | None = None,
) -> DataFrame:
    """The code-corpus sibling of :func:`curate` (BASELINE.json
    input_hint: the corpus is source code, where C4's
    terminal-punctuation line rules and Gopher's English-stopword floor
    would gut every file): StarCoder-recipe quality gates
    (``functions.code_quality.code_filter`` — line length, alphanumeric
    fraction, autogenerated/encoded-data detection, comment-ratio
    bounds) → optional token-window exact-substring removal → optional
    MinHash near-dup cluster removal → secret redaction. Stage order
    mirrors :func:`curate`: the map-side gates run first to shrink the
    dedup shuffles, rewrites precede near-dup so clusters form over
    final text, redaction last so dedup sees the original bytes.
    ``near_dup`` takes the same option dict as :func:`curate` (and makes
    the call eager the same way, via one ``localCheckpoint`` feeding
    both the pairs branch and the join-back); requires an integral id.
    """
    from search_engine_core_spark.functions.code_quality import (
        code_filter,
        redact_secrets,
    )

    out = code_filter(df, content_col, lang_col, **(code_opts or {}))
    if token_windows is not None:
        out = dedup_token_windows(out, content_col, id_col, window=token_windows)
    if near_dup is not None:
        nd_kw, algorithm = _near_dup_opts(near_dup)
        _require_numeric_id(df, id_col)
        out = out.localCheckpoint(eager=True)
        pairs = minhash_lsh_pairs(out, content_col, id_col, **nd_kw)
        out = canonical_docs(out, pairs, id_col, algorithm=algorithm)
    return out.withColumn(content_col, redact_secrets(content_col))


def curation_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    c4_opts: dict | None = None,
    gopher_opts: dict | None = None,
    token_windows: int | None = None,
    ppl_opts: dict | None = None,
    near_dup: dict | None = None,
    pii_kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
    impl: str = "pandas",
) -> DataFrame:
    """One row per INPUT doc: ``(id, text_c4, c4_pass, span_changed,
    [token_windows_changed,] text_deduped, gopher_quality_pass,
    gopher_repetition_pass, [ppl, ppl_pass,] [near_dup_pass,] kept,
    pii, text_redacted)``.

    Stage semantics mirror :func:`curate` exactly: the rewrite stages
    (span dedup, then token windows when ``token_windows`` is given)
    run over the C4 survivors only (a C4-rejected doc never claims a
    span win), Gopher scores the final rewritten text, the CCNet
    perplexity gate (when ``ppl_opts`` is given — LM trained and
    thresholded over the gate survivors' rewritten text, exact
    ``percentile`` so the threshold matches :func:`curate`'s from a
    different plan) and near-dup clusters (when ``near_dup`` is given)
    form over the gate survivors only, PII counts reflect the
    pre-redaction text. Downstream columns are NULL on docs an upstream
    stage already rejected — they were never scored in the sequential
    pipeline, and charging them a verdict would misattribute the
    drop."""
    c4_o, gq_o, gr_o = _split_opts(c4_opts, gopher_opts)
    line_kw = {}
    if "min_words_per_line" in c4_o:
        line_kw["min_words_per_line"] = c4_o.pop("min_words_per_line")

    spine = df.select(
        F.col(id_col).alias(id_col),
        c4_clean_lines(text_col, **line_kw).alias("text_c4"),
    ).withColumn("c4_pass", c4_doc_pass("text_c4", **c4_o))

    # rewrite stages over C4 survivors only; join the rewrites back. The
    # staged side carries every survivor, but only CHANGED texts need
    # to travel — project the diff to keep the joined relation small.
    deduped = dedup_three_sentence_spans(
        spine.filter("c4_pass").select(id_col, F.col("text_c4").alias("text")),
        "text",
        id_col,
    )
    staged = deduped.select(id_col, F.col("text").alias("_t1"))
    if token_windows is not None:
        stage2 = dedup_token_windows(
            deduped, "text", id_col, window=token_windows
        ).select(id_col, F.col("text").alias("_t2"))
        staged = staged.join(stage2, id_col)
    else:
        staged = staged.withColumn("_t2", F.col("_t1"))
    rewrites = (
        staged.join(spine.select(id_col, "text_c4"), id_col)
        .filter((F.col("_t1") != F.col("text_c4")) | (F.col("_t2") != F.col("_t1")))
        .select(
            id_col,
            (F.col("_t1") != F.col("text_c4")).alias("_span_ch"),
            (F.col("_t2") != F.col("_t1")).alias("_tok_ch"),
            F.col("_t2").alias("_rewrite"),
        )
    )
    rep = (
        spine.join(rewrites, id_col, "left")
        .withColumn("span_changed", F.coalesce("_span_ch", F.lit(False)))
        .withColumn("text_deduped", F.coalesce("_rewrite", "text_c4"))
        .drop("_span_ch", "_rewrite")
    )
    if token_windows is not None:
        rep = rep.withColumn(
            "token_windows_changed", F.coalesce("_tok_ch", F.lit(False))
        )
    rep = rep.drop("_tok_ch")

    null_b = F.lit(None).cast("boolean")
    gq = gopher_quality_pass("text_deduped", **gq_o)
    # Spark extracts Python UDFs OUT of CASE WHEN and evaluates them on
    # every row, so wrapping the repetition verdict in when(c4_pass, ...)
    # alone would still pay the Arrow batch for every C4 reject. Mask the
    # INPUT instead: rejects feed NULL, whose per-row cost is O(1), and
    # the outer when() nulls the (meaningless) verdict as before.
    gr = gopher_repetition_pass(
        F.when(F.col("c4_pass"), F.col("text_deduped")), impl=impl, **gr_o
    )
    rep = rep.withColumn(
        "gopher_quality_pass", F.when(F.col("c4_pass"), gq).otherwise(null_b)
    ).withColumn(
        "gopher_repetition_pass", F.when(F.col("c4_pass"), gr).otherwise(null_b)
    )
    gate = (
        F.col("c4_pass")
        & F.coalesce("gopher_quality_pass", F.lit(False))
        & F.coalesce("gopher_repetition_pass", F.lit(False))
    )
    if ppl_opts is not None:
        # checkpoint the spine once: threshold resolution is an action
        # inside perplexity_verdicts, and the final report action would
        # otherwise re-run the span-dedup shuffle and the Arrow
        # repetition batch (same discipline as the near_dup stage)
        rep = rep.localCheckpoint(eager=True)
        survivors = rep.filter(gate).select(
            id_col, F.col("text_deduped").alias("text")
        )
        # checkpoint the SMALL verdicts frame (3 columns x docs), not the
        # spine again: downstream consumers then re-run only a broadcast-
        # size join over the already-checkpointed spine blocks, instead of
        # re-materializing every staged text a second time
        verdicts = (
            perplexity_verdicts(
                survivors, "text", id_col, **{"approx": False, **ppl_opts}
            )
            .select(id_col, "ppl", F.col("ppl_pass").alias("_pp"))
            .localCheckpoint(eager=True)
        )
        rep = (
            rep.join(verdicts, id_col, "left")
            .withColumn("ppl_pass", F.when(gate, F.col("_pp")).otherwise(null_b))
            .drop("_pp")
        )
        gate = gate & F.coalesce("ppl_pass", F.lit(False))
    if near_dup is not None:
        nd_kw, algorithm = _near_dup_opts(near_dup)
        _require_numeric_id(df, id_col)
        # checkpoint the report spine once: the cluster branch (below)
        # executes eagerly inside the component resolver, and the final
        # action would otherwise recompute the span-dedup shuffle and
        # the Arrow repetition batch a second time. When the ppl stage
        # already checkpointed the spine, rep is ckpt + one cheap join —
        # re-checkpointing would duplicate every staged text in block
        # storage for no added protection.
        if ppl_opts is None:
            rep = rep.localCheckpoint(eager=True)
        survivors = rep.filter(gate).select(
            id_col, F.col("text_deduped").alias("text")
        )
        pairs = minhash_lsh_pairs(survivors, "text", id_col, **nd_kw)
        # dedup_groups only lists ids that appear in a pair; everything
        # else is trivially canonical (coalesce True below)
        clustered = dedup_groups(pairs, algorithm=algorithm).select(
            F.col("id").alias(id_col), "is_canonical"
        )
        rep = (
            rep.join(clustered, id_col, "left")
            .withColumn(
                "near_dup_pass",
                F.when(gate, F.coalesce("is_canonical", F.lit(True))).otherwise(null_b),
            )
            .drop("is_canonical")
        )
        gate = gate & F.coalesce("near_dup_pass", F.lit(False))
    rep = rep.withColumn("kept", gate)
    return rep.withColumn(
        "pii", F.when(F.col("c4_pass"), pii_counts("text_deduped", pii_kinds))
    ).withColumn(
        "text_redacted",
        F.when(F.col("kept"), redact_pii("text_deduped", pii_kinds)),
    )


def curation_funnel(report: DataFrame) -> DataFrame:
    """One row folding a :func:`curation_report`: ``n_in``, ``n_c4``
    (survived C4), ``n_span_changed``, ``n_token_windows_changed`` (when
    the report carries that rewrite stage), ``n_gopher_quality``,
    ``n_gopher_repetition`` (survived that gate, among C4 survivors),
    ``n_ppl_dropped`` (when the report carries the perplexity stage),
    ``n_near_dup_dropped`` (when the report carries the near-dup stage),
    ``n_kept``, and total PII hits by kind over the kept text's
    pre-redaction form. A single map-side-combinable aggregate."""
    pii_fields = report.schema["pii"].dataType.fieldNames()
    aggs = [
        F.count(F.lit(1)).alias("n_in"),
        F.sum(F.col("c4_pass").cast("long")).alias("n_c4"),
        F.sum(F.col("span_changed").cast("long")).alias("n_span_changed"),
    ]
    if "token_windows_changed" in report.columns:
        aggs.append(
            F.sum(F.col("token_windows_changed").cast("long")).alias(
                "n_token_windows_changed"
            )
        )
    aggs += [
        F.sum(F.coalesce("gopher_quality_pass", F.lit(False)).cast("long")).alias(
            "n_gopher_quality"
        ),
        F.sum(F.coalesce("gopher_repetition_pass", F.lit(False)).cast("long")).alias(
            "n_gopher_repetition"
        ),
    ]
    if "ppl_pass" in report.columns:
        aggs.append(
            F.sum(
                F.coalesce(F.col("ppl_pass") == F.lit(False), F.lit(False)).cast(
                    "long"
                )
            ).alias("n_ppl_dropped")
        )
    if "near_dup_pass" in report.columns:
        # coalesce BEFORE the cast: an all-NULL column (every doc failed
        # upstream) must fold to 0 like the other counters, not NULL
        aggs.append(
            F.sum(
                F.coalesce(F.col("near_dup_pass") == F.lit(False), F.lit(False)).cast(
                    "long"
                )
            ).alias("n_near_dup_dropped")
        )
    aggs.append(F.sum(F.col("kept").cast("long")).alias("n_kept"))
    for f in pii_fields:
        aggs.append(
            F.sum(F.when(F.col("kept"), F.col(f"pii.{f}")).otherwise(F.lit(0))).alias(
                f"kept_{f}"
            )
        )
    return report.agg(*aggs)
