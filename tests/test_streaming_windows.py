"""Event-time streaming: watermarked windowed aggregation and
applyInPandasWithState sessionization, verified against their batch twins
on the driver's events table."""

from __future__ import annotations

import calendar
import shutil

import pytest
from pyspark.sql import functions as F

from search_engine_core_spark.streaming.windows import (
    sessionize,
    sessionize_batch,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def _ep(dt) -> int:
    """Naive datetime (UTC wall time, session tz) -> epoch seconds."""
    return calendar.timegm(dt.timetuple())


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """File-source streams need a directory of parquet files."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF}/events.parquet", d / "part-0.parquet")
    return str(d)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_windowed_counts_stream_equals_batch(spark, events, events_dir):
    batch = {
        (r["window_start"], r["event_type"], r["n"], round(r["total_value"], 4))
        for r in windowed_event_counts(events, watermark=None).collect()
    }
    stream = spark.readStream.schema(events.schema).parquet(events_dir)
    q = (
        windowed_event_counts(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"], r["n"], round(r["total_value"], 4))
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == batch


def test_sessionize_stream_subset_of_batch(spark, events, events_dir):
    batch = {
        (
            r["user_id"],
            _ep(r["session_start"]),
            _ep(r["session_end"]),
            r["n_events"],
        )
        for r in sessionize_batch(events, tiebreak_col="event_id").collect()
    }
    stream = spark.readStream.schema(events.schema).parquet(events_dir)
    q = (
        sessionize(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (
            r["user_id"],
            _ep(r["session_start"]),
            _ep(r["session_end"]),
            r["n_events"],
        )
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    # append mode emits CLOSED sessions; each user's final (still-open)
    # session may be withheld until its event-time timeout fires
    assert got, "no sessions emitted"
    assert got <= batch
    missing = batch - got
    # anything withheld must be at most one (the last) session per user
    by_user: dict = {}
    for u, s, e, n in missing:
        by_user.setdefault(u, []).append((s, e, n))
    assert all(len(v) == 1 for v in by_user.values())
    last_by_user = {
        u: max(s for uu, s, e, n in batch if uu == u) for u in by_user
    }
    for u, sess_list in by_user.items():
        assert sess_list[0][0] == last_by_user[u]


def test_sessionize_batch_gap_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 0),
        (1, "2024-01-01 00:10:00", 1),
        (1, "2024-01-01 01:00:00", 2),  # 50 min gap -> new session
        (2, "2024-01-01 05:00:00", 3),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, event_id long").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id"
    )
    got = {
        (r["user_id"], r["n_events"])
        for r in sessionize_batch(df, tiebreak_col="event_id").collect()
    }
    assert got == {(1, 2), (1, 1), (2, 1)}
