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
chain of pairwise-similar docs) costs O(chain length) rounds here; the
O(log² n)-round alternating-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014 — public) is the known
upgrade if a real corpus ever produces one, and ``max_iter`` makes the
assumption explicit instead of silently looping. Each round eagerly
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

__all__ = ["connected_components", "dedup_groups", "canonical_docs"]


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
    edges = (
        pairs.select(
            F.col(id_a).cast("long").alias("u"), F.col(id_b).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # symmetric view once; each round joins labels against it
    sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
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
        sym.select("u")
        .distinct()
        .select(F.col("u").alias("id"), F.col("u").alias("component"))
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
        "or switch to an alternating-star implementation (module docstring)"
    )


def dedup_groups(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component, is_canonical) for every id in the pair graph:
    one deterministic survivor per duplicate cluster — the smallest id,
    the same keep-the-minimum rule as ``minhash_lsh_pairs``'s bucket cap
    and ``exact_duplicates``."""
    cc = connected_components(pairs, id_a, id_b, max_iter)
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
) -> DataFrame:
    """The deduplicated corpus: ``docs`` minus every non-canonical member
    of every near-dup cluster (docs in no pair are trivially canonical).
    One anti-join against the (small) set of doomed ids — the pair graph
    only ever contains the near-dup docs, never the whole corpus."""
    doomed = (
        dedup_groups(pairs, id_a, id_b, max_iter)
        .filter(~F.col("is_canonical"))
        .select(F.col("id").alias(id_col))
    )
    return docs.join(doomed, id_col, "left_anti")
