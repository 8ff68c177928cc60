"""Connected-components dedup resolution vs a pure-Python union-find twin.

The twin is the textbook disjoint-set with path compression — an
independent oracle for the DataFrame min-label propagation, exercised on
fixed topologies (chains force multi-round propagation, cliques/stars
finish in one) and seeded random graphs.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_core_spark.operators.components import (
    canonical_docs,
    connected_components,
    connected_components_star,
    dedup_groups,
)


def uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


def spark_components(spark, edges: list[tuple[int, int]], **kw) -> dict[int, int]:
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r["id"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


def test_disjoint_cliques_and_star(spark):
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (10, 12), (10, 13), (20, 21)]
    assert spark_components(spark, edges) == uf_components(edges)


def test_chain_needs_multiple_rounds(spark):
    # a 12-node path: min-label needs ~diameter rounds to flood 0 to the end
    edges = [(i + 1, i) for i in range(11)]
    got = spark_components(spark, edges)
    assert got == uf_components(edges)
    assert set(got.values()) == {0}


def test_tolerates_self_loops_duplicates_reversed(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2), (3, 3)]
    got = spark_components(spark, edges)
    # "one row for every id appearing in pairs": self-loop-only nodes
    # self-root instead of vanishing (matches the union-find twin)
    assert got == uf_components(edges) == {5: 5, 1: 1, 2: 1, 3: 3}


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(df).count() == 0


def test_max_iter_raises_instead_of_partial(spark):
    edges = [(i + 1, i) for i in range(6)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_match_union_find(spark, seed):
    rng = np.random.RandomState(seed)
    n, m = 60, 45  # sparse: several components, some singleton-free chains
    edges = [
        (int(rng.randint(n)), int(rng.randint(n))) for _ in range(m)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    assert spark_components(spark, edges) == uf_components(edges)


def test_dedup_groups_canonical_flag(spark):
    df = spark.createDataFrame([(3, 7), (7, 9), (20, 21)], "doc_a long, doc_b long")
    rows = {r["id"]: r for r in dedup_groups(df).collect()}
    assert rows[3]["is_canonical"] and rows[3]["component"] == 3
    assert not rows[7]["is_canonical"] and rows[7]["component"] == 3
    assert not rows[9]["is_canonical"] and rows[9]["component"] == 3
    assert rows[20]["is_canonical"] and not rows[21]["is_canonical"]


def test_canonical_docs_end_to_end_minhash(spark):
    """Full pipeline: corpus -> LSH candidate pairs -> CC -> dedup'd corpus.
    Three near-identical docs collapse to the smallest id; the unrelated
    doc survives untouched."""
    from search_engine_core_spark.operators.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),
            (3, base + " more"),
            (40, "completely different content about spark query engines"),
        ],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(docs, n_perm=8)
    kept = canonical_docs(docs, pairs)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 40 in ids and 1 in ids
    assert ids.issubset({1, 40})  # 2 and 3 collapsed into 1's cluster


def star_components(spark, edges: list[tuple[int, int]], **kw) -> dict[int, int]:
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r["id"]: r["component"]
        for r in connected_components_star(df, **kw).collect()
    }


class TestAlternatingStar:
    """Kiveris et al. alternating-star vs the same union-find twin."""

    def test_cliques_star_chain_topologies(self, spark):
        edges = [(1, 2), (2, 3), (1, 3), (10, 11), (10, 12), (10, 13),
                 (20, 21), (30, 31), (31, 32), (32, 33)]
        assert star_components(spark, edges) == uf_components(edges)

    def test_tolerates_self_loops_duplicates_reversed(self, spark):
        edges = [(5, 5), (1, 2), (2, 1), (1, 2), (3, 3)]
        assert star_components(spark, edges) == uf_components(edges)

    def test_string_ids_raise_up_front(self, spark):
        df = spark.createDataFrame([("a", "b")], "doc_a string, doc_b string")
        with pytest.raises(ValueError, match="must be integral"):
            connected_components_star(df)
        with pytest.raises(ValueError, match="must be integral"):
            connected_components(df)

    def test_empty_pairs(self, spark):
        df = spark.createDataFrame([], "doc_a long, doc_b long")
        assert connected_components_star(df).count() == 0

    @pytest.mark.parametrize("seed", [0, 3])
    def test_random_graphs_match_union_find(self, spark, seed):
        rng = np.random.RandomState(seed)
        n, m = 60, 45
        edges = [(int(rng.randint(n)), int(rng.randint(n))) for _ in range(m)]
        edges = [(u, v) for u, v in edges if u != v]
        assert star_components(spark, edges) == uf_components(edges)

    def test_long_chain_beyond_label_propagation_budget(self, spark):
        """The motivating case: a 60-node path has diameter 59 — min-label
        with max_iter=25 refuses it, alternating-star labels it in
        O(log² n) rounds. Shuffled ids so the chain isn't id-sorted."""
        rng = np.random.RandomState(7)
        ids = rng.permutation(60).tolist()
        edges = [(int(ids[i]), int(ids[i + 1])) for i in range(59)]
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(df, max_iter=25)
        got = star_components(spark, edges)
        assert got == uf_components(edges)
        assert set(got.values()) == {0}

    def test_dedup_groups_algorithm_routing(self, spark):
        df = spark.createDataFrame([(3, 7), (7, 9)], "doc_a long, doc_b long")
        rows = {r["id"]: r for r in dedup_groups(df, algorithm="star").collect()}
        assert rows[3]["is_canonical"] and rows[9]["component"] == 3
        with pytest.raises(ValueError, match="unknown algorithm"):
            dedup_groups(df, algorithm="nope")


def test_transitive_closure_beyond_emitted_pairs(spark):
    """A~B and B~C only: the group must still be {A,B,C} — the exact
    contract minhash_lsh_pairs' max_bucket cap relies on."""
    df = spark.createDataFrame([(100, 200), (200, 300)], "doc_a long, doc_b long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == {100: 100, 200: 100, 300: 100}
