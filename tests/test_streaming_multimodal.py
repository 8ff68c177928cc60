"""Streaming incremental index, frontier BFS, failure policy, multimodal
plumbing."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from search_engine_core_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synthesize_media,
)
from search_engine_core_spark.operators.stats import triples
from search_engine_core_spark.streaming.frontier import (
    backoff_delay_ms,
    bfs_frontier,
    classify_failure,
    normalize_url,
)
from search_engine_core_spark.streaming.incremental import (
    delta_triples,
    start_incremental_index,
)


def test_incremental_index_equals_batch(spark, tmp_path, small_corpus):
    inbox = str(tmp_path / "inbox")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    base = small_corpus.select("repo", "path", "commit", "lang", "content")
    # two "arrivals"
    base.filter(F.xxhash64("repo", "path", "commit") % 2 == 0).write.mode(
        "overwrite"
    ).parquet(f"{inbox}/batch1")
    base.filter(F.xxhash64("repo", "path", "commit") % 2 != 0).write.mode(
        "overwrite"
    ).parquet(f"{inbox}/batch2")

    q = start_incremental_index(spark, f"{inbox}/batch*", idx, ckpt)
    q.awaitTermination(120)

    got = {
        (r["doc_id"], r["term"], r["tf"])
        for r in delta_triples(spark, idx).collect()
    }
    want = {
        (r["doc_id"], r["term"], r["tf"]) for r in triples(small_corpus).collect()
    }
    assert got == want


def test_frontier_bfs(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("x", "y")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",)], "url string")
    got = {(r["url"], r["depth"]) for r in bfs_frontier(edges, seeds, max_depth=2).collect()}
    assert got == {("a", 0), ("b", 1), ("c", 2)}
    # cycle closes without revisiting; depth cap respected (d not reached)
    # T7 session-duration stop: an exhausted budget stops wave expansion
    got0 = {
        (r["url"], r["depth"])
        for r in bfs_frontier(edges, seeds, max_depth=2, max_duration_s=0).collect()
    }
    assert got0 == {("a", 0)}


def test_reap_expired_sessions(spark):
    """T7 cleanup-thread twin (CrawlerManager.cpp:316-330): running
    sessions older than maxSessionDuration flip to expired; fresh and
    terminal rows pass through."""
    from search_engine_core_spark.streaming.frontier import reap_expired_sessions

    now = 1_000_000
    sessions = spark.createDataFrame(
        [
            ("s1", now - 700_000, "running"),   # overdue -> expired
            ("s2", now - 100_000, "running"),   # within budget
            ("s3", now - 900_000, "completed"), # terminal, untouched
            ("s4", now - 900_000, "failed"),
        ],
        "session_id string, started_at_ms long, status string",
    )
    got = {
        r["session_id"]: r["status"]
        for r in reap_expired_sessions(sessions, now).collect()
    }
    assert got == {"s1": "expired", "s2": "running",
                   "s3": "completed", "s4": "failed"}


def test_failure_classification_and_backoff(spark):
    df = spark.createDataFrame(
        [(200,), (429,), (404,), (500,), (301,)], "status int"
    ).withColumn("cls", classify_failure(F.col("status")))
    got = {r["status"]: r["cls"] for r in df.collect()}
    assert got == {
        200: "SUCCESS",
        429: "RATE_LIMITED",
        404: "PERMANENT",
        500: "TEMPORARY",
        301: "TEMPORARY",
    }
    d = (
        spark.range(1, 10)
        .withColumn("delay", backoff_delay_ms(F.col("id").cast("int")))
        .collect()
    )
    delays = [r["delay"] for r in d]
    assert delays[0] == 1000.0 and delays[1] == 2000.0
    assert max(delays) == 60000.0  # capped


def test_normalize_url(spark):
    rows = spark.createDataFrame(
        [
            ("HTTP://Example.com/Path/",),
            ("https://example.com/",),
            ("https://example.com/a#frag",),
        ],
        "url string",
    ).select(normalize_url(F.col("url")).alias("u")).collect()
    assert [r["u"] for r in rows] == [
        "http://example.com/path",
        "https://example.com/",
        "https://example.com/a",
    ]


def test_multimodal_plumbing(spark, small_corpus):
    media = synthesize_media(small_corpus.select("doc_id").limit(30))
    feats = extract_features(media, dim=8).collect()
    assert len(feats) == 30
    by_id = {r["doc_id"]: r for r in feats}
    # deterministic features + sha invariant
    media_rows = {r["doc_id"]: r for r in media.collect()}
    some = feats[0]
    assert len(some["feature"]) == 8
    for r in feats[:5]:
        payload = bytes(media_rows[r["doc_id"]]["payload"])
        assert hashlib.sha256(payload).hexdigest() == r["payload_sha256"]
    # re-run -> identical (determinism across partitions)
    feats2 = {r["doc_id"]: r["feature"] for r in extract_features(media, dim=8).collect()}
    assert all(feats2[d] == by_id[d]["feature"] for d in feats2)


def test_multimodal_real_path_raises(spark, small_corpus):
    import pytest

    media = synthesize_media(small_corpus.select("doc_id").limit(2))
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        extract_features(media, dim=4, fake=False).collect()


def test_frame_sample_plan(spark, small_corpus):
    media = synthesize_media(small_corpus.select("doc_id").limit(60))
    plan = frame_sample_plan(media, every_ms=5000)
    rows = plan.collect()
    assert rows, "some docs must be video/mp4"
    for r in rows[:10]:
        assert r["ts_ms"] == r["frame_idx"] * 5000


class TestWavCodec:
    """r5: the REAL RIFF/WAVE parser behind the audio path (the image/
    video decode stays an honest stub)."""

    def _wav(self, sr=8000, samples=(0, 1, -1, 32767, -32768), extra_chunk=False):
        import struct

        import numpy as np

        data = np.asarray(samples, dtype="<i2").tobytes()
        body = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
        if extra_chunk:  # LIST chunk with odd size -> word-alignment path
            body += b"LIST" + struct.pack("<I", 3) + b"abc\x00"
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    def test_roundtrip_and_chunk_walk(self):
        from search_engine_core_spark.operators.multimodal import decode_wav

        d = decode_wav(self._wav(sr=12000, extra_chunk=True))
        assert d == {
            "sample_rate": 12000, "n_channels": 1, "bits_per_sample": 16,
            "n_samples": 5, "duration_ms": 5 * 1000 // 12000,
            "pcm_sum": 0 + 1 - 1 + 32767 - 32768,
        }

    def test_malformed_and_unsupported(self):
        import struct

        import pytest as _pytest

        from search_engine_core_spark.operators.multimodal import decode_wav

        with _pytest.raises(ValueError):
            decode_wav(b"not a wav at all")
        with _pytest.raises(ValueError):  # RIFF but no data chunk
            decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
        # 8-bit PCM -> honest NotImplementedError, like the media stub
        bad = bytearray(self._wav())
        bad[34] = 8  # bits_per_sample field
        with _pytest.raises(NotImplementedError):
            decode_wav(bytes(bad))

    def test_distributed_matches_local(self, spark):
        from search_engine_core_spark.operators.multimodal import (
            decode_wav,
            synthesize_wav_media,
            wav_features,
        )

        docs = spark.range(0, 30).selectExpr("id * 3 + 1 as doc_id")
        media = synthesize_wav_media(docs)
        got = {r["doc_id"]: r.asDict() for r in wav_features(media).collect()}
        for r in media.collect():
            d = decode_wav(bytes(r["payload"]))
            g = got[r["doc_id"]]
            for k, v in d.items():
                assert g[k] == v, (r["doc_id"], k)
        # ground-truth formulas hold (what the driver oracle recomputes)
        for i, g in got.items():
            assert g["sample_rate"] == 8000 + (i % 5) * 1000
            assert g["n_samples"] == 500 + (i % 2000)
