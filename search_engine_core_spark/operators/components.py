"""Connected components over near-duplicate pair graphs — the resolution
step that turns candidate PAIRS into dedup GROUPS.

Every near-dup generator in this repo (``dedup.minhash_lsh_pairs``,
``dedup.simhash_near_dup_pairs``, ``dedup.ngram_jaccard_pairs``,
``EmbeddingIndex.near_dup``) emits pairs; an actual training-data dedup
must then pick ONE survivor per duplicate *cluster*, and clusters are the
connected components of the pair graph (A~B, B~C ⇒ {A,B,C} is one group
even though (A,C) was never emitted — LSH pairs are deliberately
transitive-sparse, see ``minhash_lsh_pairs``'s ``max_bucket`` contract).
The reference engine has no analog (RediSearch stores one doc per URL
key and never cross-links duplicates); this is part of the
training-data-pipeline surface the brief adds beyond reference parity.

Algorithm: iterative min-label propagation (each round every node adopts
the smallest label in its closed neighborhood), expressed as a
join + groupBy-min per round — no collected adjacency lists, no
``collect_list`` hot keys, so a billion-edge graph is just B rounds of
shuffle. Rounds needed = the graph's diameter. For similarity graphs
that is small by construction: near-dup clusters are dense blobs (every
member shares a band/bucket with the cluster minimum under the
``max_bucket`` cap, making them diameter ≤ 2 stars), so propagation
converges in a handful of rounds. The adversarial worst case (a long
chain of pairwise-similar docs) costs O(chain length) rounds here;
``connected_components_star`` implements the O(log² n)-round
alternating-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014 — public) for exactly that case, and
``max_iter`` makes the assumption explicit instead of silently looping. Each round eagerly
localCheckpoints the label frame: iterative lineage otherwise grows the
plan exponentially (the classic Spark iterative-algorithm trap).
Convergence is detected by a scalar fixpoint invariant — labels only
decrease, so an exact (decimal) sum of labels is strictly decreasing
until the fixpoint; the sum rides an ``Observation`` on each round's
eager checkpoint, so detection costs zero extra jobs and no
old-vs-new label join.

Determinism: the component id IS the smallest member id — no tie to
break anywhere, any execution order converges to the same labeling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "connected_components_star",
    "dedup_groups",
    "canonical_docs",
]


def _require_integral_ids(
    pairs: DataFrame, id_a: str, id_b: str, where: str
) -> None:
    """Both id columns must be integral: the algorithms cast to long,
    and a string/float id would either NULL out under a non-ANSI cast
    (silently dropping every edge — the dedup becomes a no-op) or fail
    deep inside the plan under Spark 4's ANSI default. Fail fast with a
    clear message instead; hash non-numeric ids first (``xxhash64``,
    the convention the corpus's ``doc_id`` itself uses)."""
    from pyspark.sql import types as T

    ok = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    for name in (id_a, id_b):
        dt = pairs.schema[name].dataType
        if not isinstance(dt, ok):
            raise ValueError(
                f"{where}: id column {name!r} must be integral, got "
                f"{dt.simpleString()} — hash non-numeric ids to int64 "
                "first (e.g. F.xxhash64)"
            )


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every id appearing in ``pairs``; component =
    the smallest id reachable through the pair graph.

    ``pairs`` is an undirected edge list (self-loops and duplicate /
    reversed edges are tolerated — they collapse in the first round).
    Raises after ``max_iter`` rounds without convergence rather than
    returning a silently-wrong partial labeling: hitting the cap means
    the graph has a longer diameter than min-propagation should serve
    (see the module docstring for the O(log²) alternative).
    """
    _require_integral_ids(pairs, id_a, id_b, "connected_components")
    # materialize the (small) pair set ONCE: edges and vertices both
    # derive from it, and without this checkpoint the caller's pair
    # GENERATOR pipeline (e.g. the full MinHash-LSH stack) executes
    # twice — measured as half the whole dedup_cc bench line at sf1.0
    raw = pairs.select(
        F.col(id_a).cast("long").alias("u"), F.col(id_b).cast("long").alias("v")
    ).localCheckpoint(eager=True)
    edges = (
        raw.filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # symmetric view once; each round joins labels against it
    sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # vertices come from the RAW pairs, not the filtered edges: an id
    # appearing only in self-loop pairs still self-roots in the output
    # ("one row for every id appearing in pairs")
    verts = (
        raw.select("u")
        .unionByName(raw.select(F.col("v").alias("u")))
        .distinct()
    )
    def _checkpoint_with_sum(df: DataFrame):
        # Fixpoint invariant, computed for FREE: labels only ever DECREASE
        # element-wise, so sum(component) strictly decreases until
        # convergence — equal sums on consecutive rounds ⟺ no label moved.
        # The sum rides an Observation on the eager localCheckpoint job
        # itself (metrics are accumulator-backed, so the checkpoint's own
        # materialization populates them): ZERO extra jobs per round,
        # replacing the old labels-vs-labels join + limit(1).count() probe
        # — at a billion edges that was a full extra shuffle every round.
        # decimal(38,0) keeps the sum exact (an int64 sum could wrap on a
        # huge graph and alias two different labelings); empty graphs sum
        # to NULL on every round and converge immediately.
        obs = Observation()
        ck = df.observe(
            obs, F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).localCheckpoint(eager=True)
        return ck, obs.get["s"]

    labels, prev_sum = _checkpoint_with_sum(
        verts.select(F.col("u").alias("id"), F.col("u").alias("component"))
    )
    for _ in range(max_iter):
        # candidate labels flowing across edges: v offers its current
        # component to u (and vice versa through sym)
        offers = (
            sym.join(labels.withColumnRenamed("id", "v"), "v")
            .select(F.col("u").alias("id"), "component")
        )
        labels, cur_sum = _checkpoint_with_sum(
            labels.unionByName(offers)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "the pair graph has an unexpectedly long diameter; raise max_iter "
        "or use connected_components_star (O(log² n) rounds regardless "
        "of diameter)"
    )


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_rounds: int = 50,
) -> DataFrame:
    """(id, component) via the alternating large-star / small-star
    algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii —
    "Connected Components in MapReduce and Beyond", SoCC 2014, public):
    the long-diameter companion to :func:`connected_components`.
    Min-label propagation needs diameter-many rounds — a 10k-link chain
    of pairwise-similar docs is 10k shuffles; alternating-star converges
    in O(log² n) rounds regardless of diameter (empirically <~15 even on
    huge graphs). Each round costs more shuffles than a propagation
    round, so the dense-blob graphs LSH actually emits should keep the
    default; this is the escape hatch ``connected_components`` raising
    at ``max_iter`` points to.

    The state is an edge set in canonical child>parent orientation, never
    a label frame:

    * large-star: every node connects its LARGER neighbors to the
      minimum of its closed neighborhood;
    * small-star: every node connects its smaller neighbors (and itself)
      to that minimum.

    Both are a groupBy-min + an equi-join — no adjacency lists collect,
    hot (high-degree) nodes are just hot join keys handled by AQE skew
    splitting. Convergence = the (count, sum(child), sum(parent)) triple
    of the edge set repeating — exact decimals, riding an Observation on
    each round's eager checkpoint (zero probe jobs). Because the triple
    is a fingerprint rather than a proof, the final labeling is then
    VALIDATED with one free-standing min-propagation round over the
    original edges (stars only ever connect within a true component, so
    a non-fixpoint there is impossible unless the fingerprint aliased —
    in which case this raises instead of returning a wrong labeling).

    Returns the same schema and the same labels as
    :func:`connected_components` (component = smallest member id).
    """
    _require_integral_ids(pairs, id_a, id_b, "connected_components_star")
    # one materialization of the pair set (same rationale as
    # connected_components): in_verts is consumed AFTER the star rounds,
    # so without this the generator pipeline would re-run at the end
    raw = pairs.select(
        F.col(id_a).cast("long").alias("a"), F.col(id_b).cast("long").alias("b")
    ).localCheckpoint(eager=True)
    in_verts = (
        raw.select(F.col("a").alias("u"))
        .unionByName(raw.select(F.col("b").alias("u")))
        .distinct()
    )
    edges = (
        raw.filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    orig_sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )

    def _fingerprint_checkpoint(df: DataFrame):
        obs = Observation()
        ck = df.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("u").cast("decimal(38,0)")).alias("su"),
            F.sum(F.col("v").cast("decimal(38,0)")).alias("sv"),
        ).localCheckpoint(eager=True)
        m = obs.get
        return ck, (m["n"], m["su"], m["sv"])

    prev_fp = None
    for _ in range(max_rounds):
        # ---- large-star: for each node, larger neighbors -> closed min --
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mn = sym.groupBy("u").agg(F.min("v").alias("_mnv")).select(
            "u", F.least("u", "_mnv").alias("m")
        )
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mn, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # ---- small-star: smaller neighbors (and self) -> their min -----
        # `large` is already child>parent oriented, so grouping by the
        # child IS the "messages to the larger endpoint" step
        mn_s = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mn_s, "u")
            .select(F.col("v").alias("node"), "m")
            .filter(F.col("node") != F.col("m"))
            .unionByName(mn_s.select(F.col("u").alias("node"), "m"))
            .select(F.col("node").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        edges, fp = _fingerprint_checkpoint(small)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} "
            "rounds — not expected for any graph (O(log² n) bound); check "
            "the input for pathological id distributions"
        )
    # stars -> labels: children point at their parent, parents are roots;
    # ids the star edges never saw (self-loop-only / isolated in pairs)
    # self-root, matching connected_components
    labels = (
        edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
        .unionByName(
            edges.select(F.col("v").alias("id"), F.col("v").alias("component"))
        )
        .distinct()
    )
    labels = labels.unionByName(
        in_verts.join(labels, in_verts["u"] == labels["id"], "left_anti")
        .select(F.col("u").alias("id"), F.col("u").alias("component"))
    )
    # validation round (see docstring): one min-propagation step over the
    # ORIGINAL edges must be a fixpoint of this labeling
    offers = (
        orig_sym.join(labels.withColumnRenamed("id", "v"), "v")
        .select(F.col("u").alias("id"), "component")
    )
    settled = (
        labels.unionByName(offers)
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )
    check = (
        settled.join(
            labels.withColumnRenamed("component", "_claimed"), "id"
        )
        .filter(F.col("component") != F.col("_claimed"))
        .limit(1)
        .count()
    )
    if check:
        raise RuntimeError(
            "connected_components_star convergence fingerprint aliased — "
            "labeling failed post-validation (this should be unreachable)"
        )
    return labels


def dedup_groups(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
    algorithm: str = "label",
) -> DataFrame:
    """(id, component, is_canonical) for every id in the pair graph:
    one deterministic survivor per duplicate cluster — the smallest id,
    the same keep-the-minimum rule as ``minhash_lsh_pairs``'s bucket cap
    and ``exact_duplicates``. ``algorithm``: ``"label"`` (min-label
    propagation, diameter-many cheap rounds — right for LSH blob graphs)
    or ``"star"`` (alternating-star, O(log² n) pricier rounds — right
    for long-diameter graphs)."""
    if algorithm == "star":
        cc = connected_components_star(pairs, id_a, id_b)
    elif algorithm == "label":
        cc = connected_components(pairs, id_a, id_b, max_iter)
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}: 'label' or 'star'")
    return cc.select(
        "id", "component", (F.col("id") == F.col("component")).alias("is_canonical")
    )


def canonical_docs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
    algorithm: str = "label",
) -> DataFrame:
    """The deduplicated corpus: ``docs`` minus every non-canonical member
    of every near-dup cluster (docs in no pair are trivially canonical).
    One anti-join against the (small) set of doomed ids — the pair graph
    only ever contains the near-dup docs, never the whole corpus."""
    doomed = (
        dedup_groups(pairs, id_a, id_b, max_iter, algorithm)
        .filter(~F.col("is_canonical"))
        .select(F.col("id").alias(id_col))
    )
    return docs.join(doomed, id_col, "left_anti")
