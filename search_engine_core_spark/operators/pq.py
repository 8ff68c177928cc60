"""Product-quantization (PQ) compressed vectors + asymmetric-distance
top-k (ADC) — the memory/IO scale path for similarity search.

At 100 TB an embedding column of ``d`` float32s costs ``4*d`` bytes per
row; every ANN probe — even a perfectly partition-pruned one — pays that
to read the candidate set. PQ (Jegou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — public) splits
each L2-normalized vector into ``m`` subvectors, quantizes each against
its own 2^n_bits-entry codebook, and stores only the ``m`` code bytes:
a ``d=64, m=16`` index reads 16 bytes/vec instead of 256 — a 16x scan
reduction ON TOP of partition pruning, with the exact re-rank confined
to a shortlist.

Query-time ADC: the query is NOT quantized. A lookup table
``LUT[j][c] = q_sub[j] . codebook[j][c]`` (m x 256 float64, ~32 KB — a
closure constant shipped once per task) turns each candidate's score
into ``sum_j LUT[j][code[j]]``, an approximation of
``cosine(q, vec)`` that is exact when reconstruction is exact. Scoring
is a single numpy gather-sum over the whole Arrow batch — no per-row
Python.

Everything is deterministic: seeded k-means init, Lloyd's iterations in
float64, deterministic empty-cluster re-seeding — two trains with the
same (sample, m, n_bits, seed) produce byte-identical codebooks, which
the resume/rebuild story depends on.

Spark-first shape:
* train on a bounded driver-side sample (hash-sampled, order-free);
* encode via ``mapInPandas`` (Arrow batches, vectorized argmin);
* score via ``mapInPandas`` gather-sum + ``TakeOrderedAndProject``;
* refine = exact cosine over ONLY the ADC shortlist (semi-join by id).

Reference scope note: the reference engine has no vector compression
(RediSearch-backed text only); this module is part of the
training-data-pipeline surface the brief adds beyond reference parity,
sitting beside ``sources/embedding_index.py``'s partition layout.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_core_spark.operators.similarity import cosine

__all__ = [
    "train_pq",
    "train_opq",
    "reconstruct_np",
    "encode_pq",
    "adc_lut",
    "pq_adc_topk",
    "pq_refined_topk",
]


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return x / n


def train_pq(
    sample: np.ndarray,
    m: int = 8,
    n_bits: int = 8,
    seed: int = 0,
    iters: int = 20,
) -> np.ndarray:
    """Train per-subspace codebooks with deterministic Lloyd's k-means.

    ``sample``: (n, d) float array — a bounded, driver-sized training
    sample (thousands of rows suffice; PQ codebooks are tiny models).
    Rows are L2-normalized first so ADC inner products approximate
    cosine. Returns codebooks of shape (m, 2**n_bits, d//m) float64.

    Determinism: init picks ``k`` distinct sample rows via a seeded
    permutation; ties in assignment go to the LOWEST centroid index
    (np.argmin); an emptied cluster is re-seeded to the point farthest
    from its current centroid (lowest index on ties). Same inputs ->
    byte-identical codebooks, on any host.
    """
    x = _normalize_rows(np.asarray(sample, dtype=np.float64))
    n, d = x.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    k = 1 << n_bits
    if n < k:
        raise ValueError(f"need >= {k} training rows, got {n}")
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        xs = np.ascontiguousarray(x[:, j * dsub : (j + 1) * dsub])
        cent = xs[rng.permutation(n)[:k]].copy()
        books[j] = _lloyd(xs, cent, iters)
    return books


def _lloyd(xs: np.ndarray, cent: np.ndarray, iters: int) -> np.ndarray:
    """Deterministic Lloyd's iterations from GIVEN initial centroids —
    shared by the seeded cold start (``train_pq``) and the warm restarts
    OPQ's monotonicity proof requires (``train_opq``). Each iteration's
    assignment + recenter is monotone non-increasing in quantization
    error; the deterministic empty-cluster re-seed is the one step that
    may locally raise it (it trades a dead code for coverage)."""
    n = xs.shape[0]
    k, dsub = cent.shape
    cent = cent.copy()
    for _ in range(iters):
        # (n, k) squared distances via the expanded form; argmin ties
        # resolve to the lowest index — deterministic.
        d2 = (
            (xs * xs).sum(axis=1, keepdims=True)
            - 2.0 * (xs @ cent.T)
            + (cent * cent).sum(axis=1)[None, :]
        )
        assign = np.argmin(d2, axis=1)
        counts = np.bincount(assign, minlength=k)
        sums = np.zeros((k, dsub))
        np.add.at(sums, assign, xs)
        nonempty = counts > 0
        cent[nonempty] = sums[nonempty] / counts[nonempty, None]
        # deterministic empty-cluster re-seed: walk the points in
        # DECREASING distance-to-their-centroid order, one DISTINCT
        # point per empty cluster. (Re-argmaxing a stale d2 inside the
        # loop handed every empty cluster the SAME farthest point —
        # duplicate centroids that stayed dead under lowest-index
        # argmin ties; verified on [[0],[0],[0],[10]] with two empties.)
        empties = np.flatnonzero(~nonempty)
        if empties.size:
            order = np.argsort(-d2[np.arange(n), assign], kind="stable")
            for empty, far in zip(empties, order[: empties.size]):
                cent[empty] = xs[int(far)]
                assign[int(far)] = empty
    return cent


def reconstruct_np(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes -> (n, d) reconstructed vectors (codebook
    lookup per subspace). The PQ approximation the ADC score implicitly
    ranks by; used by the OPQ trainer and the reconstruction-error tests."""
    m, k, dsub = books.shape
    return np.concatenate(
        [books[j][codes[:, j]] for j in range(m)], axis=1
    )


def train_opq(
    sample: np.ndarray,
    m: int = 8,
    n_bits: int = 8,
    seed: int = 0,
    iters: int = 20,
    opq_iters: int = 10,
) -> tuple[np.ndarray, np.ndarray]:
    """Optimized PQ (Ge, He, Ke, Sun, "Optimized Product Quantization",
    CVPR 2013 — public; the non-parametric variant): learn an orthogonal
    rotation R so the m-way subspace split aligns with the data's
    correlation structure before quantizing. Plain PQ quantizes fixed
    coordinate blocks — when variance straddles a block boundary (always,
    for real embeddings), it wastes code budget; OPQ alternates

      1. fix R: train PQ codebooks on the rotated sample (x @ R),
      2. fix codes: solve the orthogonal Procrustes problem
         min_R ||X R − Y||_F  (Y = reconstructions)  via  R = U Vᵀ,
         U S Vᵀ = svd(Xᵀ Y),

    each step minimizing the shared quantization-error objective, so the
    error is MONOTONE NON-INCREASING in ``opq_iters`` (the identity-R
    first pass IS plain PQ — OPQ can only match or beat it; pinned by
    test). Returns ``(R, codebooks)`` with R (d, d) orthogonal.

    Encode/query contract: encode ``x @ R`` with the codebooks; rotate
    the query by R before building the ADC LUT. Rotation preserves inner
    products and L2 norms, so ADC scores still approximate cosine.
    Deterministic for fixed inputs: seeded k-means inside, deterministic
    LAPACK SVD of a fixed matrix.

    ``opq_iters=0`` returns (identity, plain-PQ codebooks) — the explicit
    "no rotation" degenerate the parity tests use.

    Monotonicity needs the codebook step WARM-STARTED (Lloyd refinement
    of the current books on the re-rotated data) — a fresh seeded
    retrain could land in a worse local minimum and break the
    PQ-never-worse guarantee the test pins. (Caveat shared with all
    Lloyd variants: the deterministic empty-cluster re-seed may locally
    raise the error; it essentially never fires on a warm start.)
    """
    # the identity-R cold start trains on the RAW sample (train_pq
    # normalizes internally) so opq_iters=0 is byte-identical to train_pq;
    # the loop then works in the normalized view (rotation preserves it)
    books = train_pq(sample, m=m, n_bits=n_bits, seed=seed, iters=iters)
    x = _normalize_rows(np.asarray(sample, dtype=np.float64))
    d = x.shape[1]
    dsub = d // m
    r = np.eye(d)
    for _ in range(opq_iters):
        y = reconstruct_np(_encode_batch(x @ r, books), books)
        u, _, vt = np.linalg.svd(x.T @ y)
        r = u @ vt
        xr = x @ r  # norms preserved: R is orthogonal
        books = np.stack(
            [
                _lloyd(
                    np.ascontiguousarray(xr[:, j * dsub : (j + 1) * dsub]),
                    books[j],
                    iters,
                )
                for j in range(m)
            ]
        )
    return r, books


def _encode_batch(vecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) float -> (n, m) uint8 codes. Vectorized argmin per subspace."""
    x = _normalize_rows(np.asarray(vecs, dtype=np.float64))
    m, k, dsub = books.shape
    codes = np.empty((x.shape[0], m), dtype=np.uint8)
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        cent = books[j]
        d2 = (
            (xs * xs).sum(axis=1, keepdims=True)
            - 2.0 * (xs @ cent.T)
            + (cent * cent).sum(axis=1)[None, :]
        )
        codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def encode_pq(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """Encode an embedding column to PQ codes: (id, code binary[, kept]).

    ``mapInPandas`` — one Arrow batch in, one vectorized ``_encode_batch``
    call, no per-row Python. ``keep_cols`` passes partition columns
    (bucket/cell) through so the codes table can be written with the same
    directory layout as the vectors and probed with the same pruning.
    ``rotation``: the OPQ matrix from :func:`train_opq` — vectors are
    rotated before encoding (queries must rotate identically at LUT
    time; the index stores R beside the codebooks so they can't drift).
    """
    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    rot = None if rotation is None else np.ascontiguousarray(rotation, dtype=np.float64)
    kept = list(keep_cols)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.stack(pdf[vec_col].to_numpy())
            if rot is not None:
                vecs = np.asarray(vecs, dtype=np.float64) @ rot
            codes = _encode_batch(vecs, books)
            out = {"vec_id": pdf[id_col].to_numpy(),
                   "code": [c.tobytes() for c in codes]}
            for c in kept:
                out[c] = pdf[c].to_numpy()
            yield pd.DataFrame(out)

    schema = "vec_id long, code binary"
    for c in kept:
        schema += f", {c} {dict(df.dtypes)[c]}"
    return df.mapInPandas(gen, schema)


def adc_lut(query_vec, codebooks: np.ndarray,
            rotation: np.ndarray | None = None) -> np.ndarray:
    """(m, k) table of per-subspace inner products for a NORMALIZED query.

    ``sum_j LUT[j][code[j]]`` approximates cosine(query, vec) and equals
    it exactly when the codebook reconstructs the vector exactly.
    ``rotation`` (OPQ): the query rotates through the SAME R the codes
    were encoded under — R is orthogonal, so qᵀv = (qR)ᵀ(vR) and the ADC
    sum still approximates the original-space cosine.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    nq = np.linalg.norm(q)
    if nq > 0:
        q = q / nq
    if rotation is not None:
        q = q @ np.asarray(rotation, dtype=np.float64)
    m, k, dsub = codebooks.shape
    lut = np.empty((m, k), dtype=np.float64)
    for j in range(m):
        lut[j] = codebooks[j] @ q[j * dsub : (j + 1) * dsub]
    return lut


def adc_scores_np(codes: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes + (m, k) LUT -> (n,) scores. Pure-numpy twin
    used by both the Spark path and the identity test."""
    m = lut.shape[0]
    return lut[np.arange(m)[None, :], codes].sum(axis=1)


def pq_adc_topk(
    codes_df: DataFrame,
    query_vec,
    codebooks: np.ndarray,
    k: int = 10,
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k over PQ codes only: scan cost is m bytes/row.

    Gather-sum per Arrow batch, then ``TakeOrderedAndProject`` on
    (score desc, vec_id asc). Scores rounded to 6 places so the order is
    a function of the emitted value (same convention as the exact paths).
    """
    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    lut = adc_lut(query_vec, books, rotation)
    m = books.shape[0]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf["code"].tolist()), dtype=np.uint8
            ).reshape(len(pdf), m)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(),
                "adc_sim": np.round(adc_scores_np(codes, lut), 6),
            })

    return (
        codes_df.select("vec_id", "code")
        .mapInPandas(gen, "vec_id long, adc_sim double")
        .orderBy(F.desc("adc_sim"), F.asc("vec_id"))
        .limit(k)
    )


def pq_refined_topk(
    codes_df: DataFrame,
    vectors_df: DataFrame,
    query_vec,
    codebooks: np.ndarray,
    k: int = 10,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """ADC shortlist of ``k*refine`` ids, then EXACT cosine over only
    those rows (broadcast semi-join on id — the shortlist is k*refine
    rows, always broadcastable). The standard IVF-PQ+refine shape: the
    full-precision read is proportional to the shortlist, not the probe.
    The exact re-rank runs in the ORIGINAL space — ``rotation`` only
    shapes the shortlist (better shortlist, same final metric).
    """
    shortlist = pq_adc_topk(
        codes_df, query_vec, codebooks, k=k * refine, rotation=rotation
    ).select(
        F.col("vec_id").alias("__pq_short_id")
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        vectors_df.join(
            F.broadcast(shortlist),
            vectors_df[id_col] == F.col("__pq_short_id"),
            "left_semi",
        )
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(F.round(cosine(F.col(vec_col), q), 7), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )
