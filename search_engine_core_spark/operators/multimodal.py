"""Multimodal columns: opaque binary payloads + Arrow-batched transforms.

A 100 TB training-data pipeline carries image/audio/video as ``binary``
columns with typed metadata structs. The Spark-side plumbing here is real
and tested — schema, partition-parallel ``mapInPandas`` over Arrow record
batches, deterministic feature outputs — while the actual media decode is
STUBBED (this container has no image/audio libraries): ``decode_image``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic pseudo-decode derived from the payload bytes stands in so
the distributed pipeline can be exercised end to end.

Swap the stub for PIL / torchaudio / pyav inside ``_decode_batch`` — the
plan shape (predicate pushdown on metadata, binary column pruning, batch
sizing via spark.sql.execution.arrow.maxRecordsPerBatch) does not change.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, feat_dim int, feature array<float>, "
    "payload_sha256 string"
)


def synthesize_media(docs: DataFrame, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media column derived from doc_id (test fixture):
    payload = sha256 stream of the id, metadata cycled over types."""
    mt = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.pmod(F.col("doc_id"), 3) + 1).cast("int"),
    )
    payload = F.substring(
        F.repeat(F.sha2(F.col("doc_id").cast("string"), 256), payload_bytes // 32 + 1),
        1,
        payload_bytes,
    ).cast("binary")
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        (F.pmod(F.col("doc_id"), 640) + 1).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), 480) + 1).cast("int").alias("height"),
        (F.pmod(F.col("doc_id"), 30000)).cast("int").alias("duration_ms"),
        payload.alias("payload"),
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: hash-seeded features."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**31)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``fake=False`` is the production path — raises NotImplementedError in
    this container (no media libs); the Spark plumbing is identical.
    """

    def gen(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode needs PIL/torchaudio/pyav — not in this container"
                )
            feats = [_fake_decode(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feat_dim": dim,
                    "feature": [f.tolist() for f in feats],
                    "payload_sha256": [
                        hashlib.sha256(p).hexdigest() for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(gen, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled timestamp —
    the explode is JVM-side (sequence), only the decode (stubbed) would
    touch the payload. Shows the partitioning shape for frame extraction:
    rows stay with their payload partition, no shuffle."""
    n_frames = (F.col("duration_ms") / every_ms).cast("int") + 1
    return media.filter(F.col("media_type") == "video/mp4").select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        (F.col("duration_ms")).alias("duration_ms"),
    ).withColumn("ts_ms", F.col("frame_idx") * every_ms)
