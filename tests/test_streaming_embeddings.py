"""Continuous re-embedding ingest (streaming/embeddings.py): bootstrap
build on the first micro-batch, partition-local upserts after, checkpoint
resume across restarts, replace-semantics idempotence, and probe parity
vs brute force on the final corpus."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F


def _vecs(rng, ids):
    return [(int(i), [float(x) for x in rng.standard_normal(16)]) for i in ids]


def _state(spark, idx):
    from search_engine_core_spark.sources.embedding_index import EmbeddingIndex

    return {
        r["vec_id"]: tuple(round(float(x), 5) for x in r["embedding"])
        for r in EmbeddingIndex(spark, idx).vectors().collect()
    }


def test_streaming_embedding_lifecycle(spark, tmp_path):
    from search_engine_core_spark.sources.embedding_index import (
        EmbeddingIndex,
        EmbeddingIndexBuilder,
    )
    from search_engine_core_spark.streaming.embeddings import (
        start_incremental_embeddings,
    )

    inbox, idx, ckpt = (str(tmp_path / d) for d in ("inbox", "idx", "ckpt"))
    kw = dict(n_bits=4, n_centroids=4)
    rng = np.random.default_rng(11)
    schema = "vec_id long, embedding array<float>"

    # ---- batch 1 (bootstrap): ids 0..49 ----
    b1 = _vecs(rng, range(50))
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(inbox)
    q = start_incremental_embeddings(spark, inbox, idx, ckpt, builder_kwargs=kw)
    q.awaitTermination()
    meta1 = json.load(open(f"{idx}/meta.json"))
    assert meta1["n_vecs"] == 50
    want = {i: v for i, v in b1}

    # ---- batch 2 (restart, checkpoint skips batch 1's file):
    # re-embed 0..9, insert 50..59 ----
    b2 = _vecs(rng, list(range(10)) + list(range(50, 60)))
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(inbox)
    q = start_incremental_embeddings(spark, inbox, idx, ckpt, builder_kwargs=kw)
    q.awaitTermination()
    want.update({i: v for i, v in b2})

    meta2 = json.load(open(f"{idx}/meta.json"))
    assert meta2["n_vecs"] == 60
    # planes/centroids pinned by the bootstrap batch, untouched by upsert
    assert meta2["hyperplanes"] == meta1["hyperplanes"]
    assert meta2["centroids"] == meta1["centroids"]
    got = _state(spark, idx)
    assert got == {
        i: tuple(round(x, 5) for x in v) for i, v in want.items()
    }

    # ---- replace-semantics idempotence: replay batch 2 verbatim ----
    EmbeddingIndexBuilder(spark, idx, **kw).upsert(
        spark.createDataFrame(b2, schema)
    )
    assert json.load(open(f"{idx}/meta.json"))["n_vecs"] == 60
    assert _state(spark, idx) == got

    # ---- probe parity vs a numpy twin over the SAME probe set: bucket
    # assignment (stored planes), probe ring (base + margin-ordered bit
    # flips), and cosine ranking all recomputed independently ----
    qvec = want[0]
    ann = [
        r["vec_id"]
        for r in EmbeddingIndex(spark, idx).ann_topk(list(qvec), k=5, n_probe=4).collect()
    ]
    planes = np.array(meta2["hyperplanes"], dtype=np.float64)
    qv = np.array(qvec, dtype=np.float64)
    dots = planes @ qv
    base = int(sum(1 << j for j, d in enumerate(dots) if d > 0))
    flips = np.argsort(np.abs(dots), kind="stable")[:3]
    probes = {base} | {base ^ (1 << int(j)) for j in flips}
    ids = sorted(want)
    m = np.array([want[i] for i in ids], dtype=np.float64)
    buckets = (m @ planes.T > 0).astype(np.int64) @ (1 << np.arange(4))
    cand = [
        (i, b) for i, b in zip(ids, buckets) if int(b) in probes
    ]
    cm = np.array([want[i] for i, _ in cand], dtype=np.float64)
    cos = (cm @ qv) / (np.linalg.norm(cm, axis=1) * np.linalg.norm(qv))
    order = sorted(zip(-np.round(cos, 4), [i for i, _ in cand]))
    assert ann == [i for _, i in order[:5]]


def test_streaming_embedding_duplicate_collapse(spark, tmp_path):
    """Two rows for one vec_id inside a micro-batch collapse to the
    deterministic (lexicographic max) winner instead of tripping the
    builder's duplicate guard."""
    from search_engine_core_spark.streaming.embeddings import (
        start_incremental_embeddings,
    )

    inbox, idx, ckpt = (str(tmp_path / d) for d in ("inbox", "idx", "ckpt"))
    rows = [
        (1, [0.5] * 8),
        (1, [0.9] + [0.1] * 7),  # lexicographic max -> wins
        (2, [0.2] * 8),
    ]
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(
        1
    ).write.parquet(inbox)
    q = start_incremental_embeddings(
        spark, inbox, idx, ckpt, builder_kwargs=dict(n_bits=2, n_centroids=2)
    )
    q.awaitTermination()
    got = _state(spark, idx)
    assert set(got) == {1, 2}
    assert got[1][0] == pytest.approx(0.9, abs=1e-5)
