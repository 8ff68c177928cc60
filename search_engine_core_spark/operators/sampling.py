"""Deterministic splits, corpus mixing, and eval-set decontamination —
the last mile of a training-data pipeline once dedup has run.

The reference engine has no analog (it serves queries; it does not cut
training sets) — like ``operators/components.py`` this is part of the
training-data-pipeline surface the brief adds beyond reference parity.
All three operators follow the same scale rules as the rest of the repo:
pure column expressions in the hot path (xxhash64 — the repo's canonical
hash, JVM-side, codegen'd), no per-row Python, bounded driver state
(one row per group / per eval n-gram, never per document).

* :func:`hash_split` — train/val/test assignment as a PURE FUNCTION of
  (key, seed): re-runs, repartitions, and GROWING the corpus never move
  an existing row between splits (the property random ``df.sample``
  cannot give you, and the one that prevents eval contamination across
  pipeline re-runs).
* :func:`resample_to_mix` — downsample groups (domain / language /
  source) to a target mixture, the standard corpus-mixing step
  (cf. the public Pile / DoReMi mixture-weight setups), again keyed by
  deterministic hash so the kept subset is reproducible.
* :func:`contaminated_ids` / :func:`decontaminate` — n-gram collision
  decontamination against an eval/benchmark set (the public GPT-3
  appendix-C rule: drop a training doc sharing any 13-gram with eval).
  The eval side is tiny by construction (benchmarks), so its gram set
  broadcasts; the training side streams through explode + broadcast
  semi-join — grams are never materialized corpus-wide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_core_spark.functions.tokenizer import tokenize_expr

__all__ = [
    "hash_fraction",
    "hash_split",
    "resample_to_mix",
    "contaminated_ids",
    "decontaminate",
    "pack_sequences",
]


def hash_fraction(key: Column | str, seed: int = 0) -> Column:
    """Uniform [0, 1) as a pure function of (``key``, ``seed``):
    xxhash64 of the (key, seed) tuple mapped from signed-int64 range.
    Same key + same seed = same fraction on any cluster size, any
    partitioning, any Spark version that keeps xxhash64 stable (it is a
    pinned on-disk format in this repo — ``functions/xxhash.py``)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.xxhash64(c, F.lit(int(seed)))
    frac = h.cast("double") / F.lit(float(2**64)) + F.lit(0.5)
    # int64 -> double rounds hashes within 512 of 2**63 UP to exactly
    # 2**63, making frac == 1.0 — outside the documented [0, 1) range and
    # deterministically dropping those keys from rate-1.0 resamples;
    # clamp to the largest double below 1.0 (~2**-54 of keys affected)
    return F.least(frac, F.lit(1.0 - 2.0**-53))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with probability proportional to
    ``weights`` (normalized), deterministically by ``key_col``: the split
    is a function of the key alone, so adding NEW data to the corpus
    never reassigns existing rows (no train/eval leakage across pipeline
    re-runs), and the same doc lands in the same split on every machine.
    Pure column expression — no shuffle, no sampling state."""
    if not weights:
        raise ValueError("hash_split needs at least one named weight")
    for name, w in weights.items():
        # a negative weight passes the sum check but corrupts every
        # cumulative threshold after it (splits silently over/under-fill)
        if w < 0:
            raise ValueError(f"hash_split weight {name!r} is negative: {w}")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("hash_split weights must sum to a positive value")
    frac = hash_fraction(key_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond_expr = F.when(frac < F.lit(acc), F.lit(name))
        expr = cond_expr if expr is None else expr.when(frac < F.lit(acc), F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def resample_to_mix(
    df: DataFrame,
    group_col: str,
    target: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Downsample ``df`` so the ``group_col`` distribution matches the
    ``target`` mixture (normalized), keeping as many rows as pure
    downsampling allows: the output size is N* = min_g(n_g / w_g), the
    largest total for which every group can be served without
    upsampling, and each group keeps ceil-free rate w_g·N*/n_g of its
    rows by deterministic hash. Groups absent from ``target`` are
    dropped. Driver state = one (group, count) row per group."""
    if not target:
        raise ValueError("resample_to_mix needs a non-empty target mixture")
    tot_w = float(sum(target.values()))
    if tot_w <= 0:
        raise ValueError("resample_to_mix target weights must sum > 0")
    shares = {g: w / tot_w for g, w in target.items() if w > 0}
    counts = {
        r["g"]: r["n"]
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["g"] in shares
    }
    missing = [g for g in shares if g not in counts]
    if missing:
        raise ValueError(
            f"resample_to_mix: target groups absent from the data: {missing}"
        )
    n_star = min(counts[g] / shares[g] for g in shares)
    rates = {g: min(1.0, shares[g] * n_star / counts[g]) for g in shares}
    rate_expr = None
    for g, r in rates.items():
        w = F.when(F.col(group_col) == F.lit(g), F.lit(r))
        rate_expr = w if rate_expr is None else rate_expr.when(
            F.col(group_col) == F.lit(g), F.lit(r)
        )
    rate_expr = rate_expr.otherwise(F.lit(-1.0))  # not in target: drop
    return df.filter(hash_fraction(key_col, seed) < rate_expr)


def _gram_hashes(text: Column | str, n: int) -> Column:
    """array<long> of xxhash64 over the canonical-token n-grams of a
    string column; empty for docs shorter than ``n`` tokens. JVM-side:
    tokenize → sliding slice → concat_ws → xxhash64, all inside one
    higher-order ``transform``.

    The token array is BOUND to a lambda variable (via a one-element
    ``transform``) so it is evaluated once per document: referenced
    inline, Catalyst re-evaluates ``F.slice(toks, i, n)``'s tokenizer
    child once per gram element (the duplicated-evaluation trap measured
    at ~20x in ``dedup.minhash_signature``; guide §4.4). A Column-
    returning helper cannot project, hence the bind trick."""

    def _grams_of(toks: Column) -> Column:
        cnt = F.size(toks) - F.lit(n - 1)
        grams = F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n))),
        )
        return F.when(cnt >= 1, grams).otherwise(F.array().cast("array<bigint>"))

    return F.element_at(F.transform(F.array(tokenize_expr(text)), _grams_of), 1)


def contaminated_ids(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ids of training docs sharing ANY token ``n``-gram with the eval
    set (GPT-3 appendix-C decontamination rule, n=13 default). The eval
    gram set is distinct-ed and BROADCAST (benchmarks are small); the
    training side explodes its grams and left-semi joins — map-side, no
    shuffle of the corpus, grams never materialized corpus-wide. Docs
    shorter than ``n`` tokens can never collide (empty gram array)."""
    eval_grams = (
        eval_df.select(F.explode(_gram_hashes(text_col, n)).alias("gram"))
        .distinct()
    )
    train_grams = train.select(
        F.col(id_col), F.explode(_gram_hashes(text_col, n)).alias("gram")
    )
    return (
        train_grams.join(F.broadcast(eval_grams), "gram", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``train`` minus every doc :func:`contaminated_ids` flags."""
    return train.join(
        contaminated_ids(train, eval_df, n, text_col, id_col), id_col, "left_anti"
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_shards: int = 256,
    seed: int = 0,
) -> DataFrame:
    """Concat-and-chunk sequence packing — assign every doc a
    (pack_id, pack_offset) so that concatenating docs in (pack_id,
    pack_offset) order and cutting every ``budget`` tokens yields the
    training sequences. This is the standard pretraining packing
    (documents may straddle a chunk boundary — the ``crosses_boundary``
    column flags those for callers that must not split docs).

    Distributed shape: docs are sharded by hash (shards are independent
    token streams, so packing parallelizes with NO coordination — at
    100 TB every shard is a separate cumsum), deterministically ordered
    within a shard by (hash, id), and offset by a running token cumsum —
    ONE window per shard, one shuffle total. Output adds:

    * ``pack_shard`` — which independent stream the doc belongs to;
    * ``pack_id`` — chunk index within the shard (floor(start/budget));
    * ``pack_offset`` — the doc's token offset within the shard stream;
    * ``crosses_boundary`` — true when the doc straddles a chunk cut.

    Deterministic end-to-end: same (ids, token counts, seed, shards) =
    same packing on any cluster size.
    """
    if budget <= 0:
        raise ValueError("pack_sequences budget must be positive")
    from pyspark.sql import Window

    shard = F.pmod(F.xxhash64(F.col(id_col), F.lit(int(seed))), F.lit(n_shards))
    w = (
        Window.partitionBy("pack_shard")
        .orderBy(hash_fraction(id_col, seed + 1), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = F.col(token_col).cast("long")
    out = (
        df.withColumn("pack_shard", shard)
        .withColumn("_end", F.sum(tok).over(w))
        .withColumn("pack_offset", F.col("_end") - tok)
        .withColumn("pack_id", F.floor(F.col("pack_offset") / F.lit(int(budget))))
        .withColumn(
            "crosses_boundary",
            F.floor((F.col("_end") - F.lit(1)) / F.lit(int(budget)))
            > F.col("pack_id"),
        )
        .drop("_end")
    )
    return out
