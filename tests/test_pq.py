"""Product-quantization (operators/pq.py + the index's PQ sidecar).

Covers: deterministic training, Spark-encode == numpy-twin identity,
ADC score identity, recall floors vs exact brute force, the sidecar's
partition pruning, and lifecycle consistency (upsert/delete refresh the
codes with the STORED codebooks)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_core_spark.operators.pq import (
    _encode_batch,
    adc_lut,
    adc_scores_np,
    encode_pq,
    pq_adc_topk,
    pq_refined_topk,
    train_pq,
)

SF_EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(SF_EMB)


def _clustered(n=2000, dim=32, n_clusters=20, seed=3, noise=2.0):
    """Synthetic clustered vectors — ANN recall is meaningless on pure
    noise, so give the space real structure."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 4.0
    x = centers[rng.randint(0, n_clusters, n)] + rng.randn(n, dim) * noise
    return x.astype(np.float64)


def test_train_deterministic_and_shapes():
    x = _clustered(600, 32)
    b1 = train_pq(x, m=8, n_bits=6, seed=5)
    b2 = train_pq(x, m=8, n_bits=6, seed=5)
    assert b1.shape == (8, 64, 4)
    assert np.array_equal(b1, b2)
    b3 = train_pq(x, m=8, n_bits=6, seed=6)
    assert not np.array_equal(b1, b3)


def test_train_rejects_bad_dims():
    x = _clustered(600, 32)
    with pytest.raises(ValueError):
        train_pq(x, m=7)
    with pytest.raises(ValueError):
        train_pq(x[:10], m=8, n_bits=6)


def test_spark_encode_identical_to_numpy_twin(spark, emb):
    rows = emb.orderBy("vec_id").collect()
    vecs = np.asarray([r["embedding"] for r in rows])
    books = train_pq(vecs, m=8, n_bits=6, seed=1)
    want = {r["vec_id"]: _encode_batch(
        vecs[i : i + 1], books)[0].tobytes() for i, r in enumerate(rows)}
    got = {
        r["vec_id"]: bytes(r["code"])
        for r in encode_pq(emb, books).collect()
    }
    assert got == want
    assert all(len(c) == 8 for c in got.values())  # m bytes per vector


def test_adc_topk_matches_numpy_twin(spark, emb):
    rows = emb.orderBy("vec_id").collect()
    vecs = np.asarray([r["embedding"] for r in rows])
    ids = np.asarray([r["vec_id"] for r in rows])
    books = train_pq(vecs, m=8, n_bits=6, seed=1)
    q = vecs[17]
    codes = _encode_batch(vecs, books)
    scores = np.round(adc_scores_np(codes, adc_lut(q, books)), 6)
    order = np.lexsort((ids, -scores))[:10]
    want = [(int(ids[i]), float(scores[i])) for i in order]
    got = [
        (r["vec_id"], r["adc_sim"])
        for r in pq_adc_topk(encode_pq(emb, books), q, books, k=10).collect()
    ]
    assert got == want


def _recall(spark, x, k=10, refine=None, m=16):
    from search_engine_core_spark.operators.similarity import brute_force_topk

    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    ).cache()
    books = train_pq(x[:600], m=m, n_bits=6, seed=2)
    codes = encode_pq(df, books).cache()
    q = x[7]
    exact = {r["vec_id"] for r in brute_force_topk(df, list(q), k).collect()}
    if refine:
        approx = {
            r["vec_id"]
            for r in pq_refined_topk(codes, df, q, books, k=k, refine=refine).collect()
        }
    else:
        approx = {r["vec_id"] for r in pq_adc_topk(codes, q, books, k=k).collect()}
    return len(exact & approx) / k


def test_recall_floor_pure_adc(spark):
    # pure ADC ranks only as finely as the reconstruction error (~0.2
    # cosine here): neighbors separated by less than that shuffle, so the
    # honest floor for 10-NN in clustered data is modest (measured 0.4
    # at m=16) — which is exactly why refine exists
    assert _recall(spark, _clustered(), refine=None) >= 0.3


def test_recall_floor_refined(spark):
    # refine reads only k*refine full vectors yet restores near-exact
    # ranking — the property that makes m-bytes-per-row scans usable
    assert _recall(spark, _clustered(), refine=8) >= 0.9


class TestIndexSidecar:
    @pytest.fixture(scope="class")
    def pq_index(self, spark, emb, tmp_path_factory):
        from search_engine_core_spark.sources.embedding_index import (
            EmbeddingIndex,
            EmbeddingIndexBuilder,
        )

        d = str(tmp_path_factory.mktemp("pqidx") / "idx")
        b = EmbeddingIndexBuilder(
            spark, d, n_bits=4, n_centroids=4, centroid_ids=[1, 2, 3, 4],
            partition_cells=False,
        )
        b.build(emb.select("vec_id", "embedding"))
        b.add_pq(m=8, n_bits=6, seed=9, sample_n=400)
        return EmbeddingIndex(spark, d)

    def test_codes_cover_all_vectors(self, pq_index):
        vec_ids = {r["vec_id"] for r in pq_index.vectors().select("vec_id").collect()}
        code_rows = pq_index.pq_codes().collect()
        assert {r["vec_id"] for r in code_rows} == vec_ids
        assert all(len(bytes(r["code"])) == 8 for r in code_rows)

    def test_pq_probe_prunes_partitions(self, pq_index, emb):
        qv = [float(v) for v in emb.first()["embedding"]]
        plan = (
            pq_index.pq_topk(qv, 10, n_probe=3, refine=None)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PartitionFilters" in plan
        pf = plan.split("PartitionFilters")[1][:300]
        assert "bucket" in pf and "IN" in pf

    def test_refined_matches_exact_on_probed_set(self, pq_index, emb):
        """With refine covering the whole probed set, pq_topk must equal
        the exact ann_topk over the same probes — the approximation is
        confined to shortlist SELECTION, never to emitted scores."""
        qv = [float(v) for v in emb.first()["embedding"]]
        exact = [(r["vec_id"], r["cos_sim"])
                 for r in pq_index.ann_topk(qv, 10, n_probe=4).collect()]
        ref = [(r["vec_id"], r["cos_sim"])
               for r in pq_index.pq_topk(qv, 10, n_probe=4, refine=100).collect()]
        assert ref == exact

    def test_lifecycle_refresh_uses_stored_codebooks(self, spark, emb, tmp_path):
        """upsert + delete rewrite only affected code partitions, encoded
        with the codebooks trained at add_pq time: the final sidecar must
        equal a from-scratch encode of the final vectors under those SAME
        books (and never require retraining)."""
        from search_engine_core_spark.sources.embedding_index import (
            EmbeddingIndex,
            EmbeddingIndexBuilder,
        )

        d = str(tmp_path / "idx")
        b = EmbeddingIndexBuilder(
            spark, d, n_bits=4, n_centroids=4, centroid_ids=[1, 2, 3, 4],
            partition_cells=False,
        )
        b.build(emb.select("vec_id", "embedding"))
        b.add_pq(m=8, n_bits=6, seed=9, sample_n=400)
        books = b._pq_books()

        flipped = emb.filter(F.col("vec_id").between(20, 29)).select(
            "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
        )
        assert b.upsert(flipped) == 10
        assert b.delete(F.col("vec_id").between(10, 19)) == 10

        idx = EmbeddingIndex(spark, d)
        vec_rows = idx.vectors().orderBy("vec_id").collect()
        vecs = np.asarray([r["embedding"] for r in vec_rows])
        want = {
            r["vec_id"]: _encode_batch(vecs[i : i + 1], books)[0].tobytes()
            for i, r in enumerate(vec_rows)
        }
        got = {r["vec_id"]: bytes(r["code"]) for r in idx.pq_codes().collect()}
        assert got == want
