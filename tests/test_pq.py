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


def test_lloyd_reseeds_empty_clusters_distinctly():
    """Two clusters going empty in one iteration must re-seed to DISTINCT
    far points — re-argmaxing a stale d2 handed every empty cluster the
    same row, leaving duplicate dead centroids."""
    from search_engine_core_spark.operators.pq import _lloyd

    xs = np.array([[0.0], [0.1], [0.2], [10.0], [20.0]])
    # centroids 2 and 3 start far away -> both empty on the first assign
    cent = np.array([[0.05], [15.0], [99.0], [98.0]])
    out = _lloyd(xs, cent, iters=3)
    # all four final centroids distinct: no duplicate re-seeds survive
    assert len({float(c) for c in out.ravel()}) == 4


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
        books, _rot = b._pq_books()  # plain PQ here: rotation is None
        assert _rot is None

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


class TestOPQ:
    """Optimized PQ (train_opq): rotation quality, determinism, and the
    rotated encode/LUT round-trip through the index sidecar."""

    @staticmethod
    def _mixed(n=600, d=16, seed=11):
        """Latent gaussian mixed across all coordinates: correlations
        deliberately straddle every fixed m-way subspace boundary — the
        regime plain PQ wastes code budget on and OPQ exists for."""
        from search_engine_core_spark.operators.pq import _normalize_rows

        rng = np.random.RandomState(seed)
        z = rng.randn(n, d // 2)          # low-rank latent
        mix = rng.randn(d // 2, d)        # spread it over all dims
        return _normalize_rows(z @ mix + 0.05 * rng.randn(n, d))

    @staticmethod
    def _mse(x, r, books):
        from search_engine_core_spark.operators.pq import reconstruct_np

        xr = x @ r
        rec = reconstruct_np(_encode_batch(xr, books), books)
        return float(((xr - rec) ** 2).sum(axis=1).mean())

    def test_zero_iters_is_plain_pq(self):
        from search_engine_core_spark.operators.pq import train_opq

        x = self._mixed()
        r, books = train_opq(x, m=8, n_bits=4, seed=2, opq_iters=0)
        assert np.array_equal(r, np.eye(16))
        assert np.array_equal(books, train_pq(x, m=8, n_bits=4, seed=2))

    def test_rotation_orthogonal_and_deterministic(self):
        from search_engine_core_spark.operators.pq import train_opq

        x = self._mixed()
        r1, b1 = train_opq(x, m=8, n_bits=4, seed=2, opq_iters=5)
        r2, b2 = train_opq(x, m=8, n_bits=4, seed=2, opq_iters=5)
        assert np.array_equal(r1, r2) and np.array_equal(b1, b2)
        assert np.allclose(r1 @ r1.T, np.eye(16), atol=1e-10)

    def test_never_worse_than_pq_and_better_on_mixed_data(self):
        """The warm-started alternation is monotone: OPQ's quantization
        error can never exceed plain PQ's (same sample, same seed), and
        on cross-boundary-correlated data it must be substantially
        lower — the measurable claim behind shipping OPQ at all."""
        from search_engine_core_spark.operators.pq import train_opq

        x = self._mixed()
        books_pq = train_pq(x, m=8, n_bits=4, seed=2)
        mse_pq = self._mse(x, np.eye(16), books_pq)
        r, books = train_opq(x, m=8, n_bits=4, seed=2, opq_iters=8)
        mse_opq = self._mse(x, r, books)
        assert mse_opq <= mse_pq + 1e-12
        assert mse_opq < 0.9 * mse_pq, (mse_opq, mse_pq)

    def test_adc_scores_approximate_rotated_cosine(self):
        """LUT built from the rotated query over rotated-encoded codes:
        ADC == exact cosine of the RECONSTRUCTED vectors (the defining
        ADC identity), rotation or not."""
        from search_engine_core_spark.operators.pq import (
            reconstruct_np,
            train_opq,
        )

        x = self._mixed()
        r, books = train_opq(x, m=8, n_bits=4, seed=2, opq_iters=4)
        codes = _encode_batch(x @ r, books)
        q = x[7]
        lut = adc_lut(q, books, rotation=r)
        got = adc_scores_np(codes, lut)
        want = reconstruct_np(codes, books) @ (q @ r)
        assert np.allclose(got, want, atol=1e-12)

    def test_sidecar_opq_roundtrip(self, spark, emb, tmp_path):
        """add_pq(opq_iters>0): stored rotation reaches encode, refresh
        and query — codes equal the rotated numpy twin, the refined
        probe still emits exact original-space cosines, and upsert
        refreshes codes under the SAME stored rotation."""
        from search_engine_core_spark.sources.embedding_index import (
            EmbeddingIndex,
            EmbeddingIndexBuilder,
        )

        d = str(tmp_path / "idx_opq")
        b = EmbeddingIndexBuilder(
            spark, d, n_bits=4, n_centroids=4, centroid_ids=[1, 2, 3, 4],
            partition_cells=False,
        )
        b.build(emb.select("vec_id", "embedding"))
        b.add_pq(m=8, n_bits=6, seed=9, sample_n=400, opq_iters=3)
        books, rot = b._pq_books()
        assert rot is not None and np.allclose(rot @ rot.T, np.eye(rot.shape[0]), atol=1e-10)

        idx = EmbeddingIndex(spark, d)
        vec_rows = idx.vectors().orderBy("vec_id").collect()
        vecs = np.asarray([r["embedding"] for r in vec_rows], dtype=np.float64)
        want = {
            r["vec_id"]: _encode_batch((vecs @ rot)[i : i + 1], books)[0].tobytes()
            for i, r in enumerate(vec_rows)
        }
        got = {r["vec_id"]: bytes(r["code"]) for r in idx.pq_codes().collect()}
        assert got == want

        qv = [float(v) for v in vec_rows[0]["embedding"]]
        exact = [(r["vec_id"], r["cos_sim"])
                 for r in idx.ann_topk(qv, 10, n_probe=4).collect()]
        ref = [(r["vec_id"], r["cos_sim"])
               for r in idx.pq_topk(qv, 10, n_probe=4, refine=100).collect()]
        assert ref == exact  # refine re-ranks in the ORIGINAL space

        flipped = emb.filter(F.col("vec_id").between(5, 9)).select(
            "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
        )
        assert b.upsert(flipped) == 5
        idx2 = EmbeddingIndex(spark, d)
        rows2 = idx2.vectors().orderBy("vec_id").collect()
        vecs2 = np.asarray([r["embedding"] for r in rows2], dtype=np.float64)
        want2 = {
            r["vec_id"]: _encode_batch((vecs2 @ rot)[i : i + 1], books)[0].tobytes()
            for i, r in enumerate(rows2)
        }
        got2 = {r["vec_id"]: bytes(r["code"]) for r in idx2.pq_codes().collect()}
        assert got2 == want2
