"""Event-time streaming operators: watermarked windowed aggregation and
custom stateful sessionization.

The reference has no event-time windowing (SURVEY §2.10: "No watermarks,
event-time windows ... exist anywhere"), but a complete analytics engine
over crawl/usage event streams needs both, so these are first-class here:

* :func:`windowed_event_counts` — tumbling/sliding event-time windows
  with a watermark bounding state for late data: the canonical Structured
  Streaming aggregation (state store per window x key, dropped once the
  watermark passes the window end). Works identically on a batch frame
  (no watermark needed) — the same column algebra, which is what the
  DuckDB oracle checks.
* :func:`sessionize` — gap-based user sessions via
  ``applyInPandasWithState`` (the custom-stateful-operator escape hatch):
  per-key state carries the open session across micro-batches; a session
  closes when the gap since its last event exceeds ``gap`` or the
  watermark times the state out. The batch twin (:func:`sessionize_batch`)
  is a pure window-function formulation (gap > threshold -> new session
  id) used for correctness oracles — at 10^12-event scale the streaming
  form bounds memory by live-session state instead of a global sort.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events int"
)
_STATE_SCHEMA = "start long, last long, n int"


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str | None = "value",
) -> DataFrame:
    """(window_start, window_end, key, n[, total_value]) per event-time
    window. On a streaming frame the watermark bounds the state store and
    admits late rows up to the bound; on a batch frame it is skipped (no
    state to bound). ``value_col=None`` (or a frame without the column)
    yields counts only — the (ts, key) shape needs no value column."""
    # event-time ops (watermark, state timeout) require an instant type:
    # normalize TIMESTAMP_NTZ parquet columns to LTZ (session tz = UTC)
    df = events.withColumn(ts_col, F.col(ts_col).cast("timestamp_ltz"))
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide or window)
    aggs = [F.count(F.lit(1)).alias("n")]
    cols = ["n"]
    if value_col is not None and value_col in df.columns:
        aggs.append(F.sum(value_col).alias("total_value"))
        cols.append("total_value")
    return (
        df.groupBy(win.alias("w"), F.col(key_col))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            *cols,
        )
    )


def _session_fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState, gap_ms: int = 30 * 60 * 1000):
    """Per-user session fold. State = (start_ms, last_ms, n). Emits every
    CLOSED session; the open one stays in state (emitted on timeout).
    ``gap_ms`` is bound by :func:`sessionize` so stream and batch twins
    agree for ANY gap, not only the 30-minute default."""
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(last, unit="ms")],
                    "n_events": [n],
                }
            )
        state.remove()
        return

    ts_all = []
    for pdf in pdfs:
        ts_all.append(pdf["ts"].astype("int64") // 1_000_000)  # ns -> ms
    ts = pd.concat(ts_all).sort_values().to_numpy()
    out_rows = []
    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = int(ts[0]), int(ts[0]), 0
    for t in ts:
        t = int(t)
        if t - last > gap_ms:
            out_rows.append((start, last, n))
            start, n = t, 0
        # a cross-batch late arrival (in-watermark, before the open
        # session's start) folds in and widens the span — the (start,
        # last, n) state cannot retroactively re-SPLIT (documented
        # one-pass approximation; see sessionize's docstring)
        start = min(start, t)
        last = max(last, t)
        n += 1
    state.update((start, last, n))
    # timeout once the watermark passes last+gap: closes idle sessions
    state.setTimeoutTimestamp(last + gap_ms)
    if out_rows:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_rows),
                "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in out_rows],
                "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in out_rows],
                "n_events": [n for _, _, n in out_rows],
            }
        )


def sessionize(
    events: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Streaming gap-sessionization: one state row per live
    (user, open-session); closed sessions emit incrementally, idle ones by
    event-time timeout. State size ~ concurrent users, independent of
    stream length — the property the batch window-sort formulation lacks.
    ``gap_minutes`` matches :func:`sessionize_batch`'s parameter.

    Stream/batch equivalence contract: exact when each user's events are
    nondecreasing in event time ACROSS micro-batches (within a batch any
    order is fine — the fold sorts). A cross-batch late arrival inside
    the watermark folds into the open session, widening its span
    (``start`` moves back); the (start, last, n) state cannot
    retroactively re-split a session the way the batch oracle would —
    the standard one-pass trade for state bounded by live sessions
    rather than buffered events."""
    import functools

    fn = functools.partial(_session_fn, gap_ms=gap_minutes * 60 * 1000)
    return (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp_ltz"))
        .withWatermark(ts_col, watermark)
        # _session_fn reads pdf["ts"]: alias so non-default ts_col works
        .select("user_id", F.col(ts_col).alias("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Batch twin: window-function sessionization (new session when the
    gap to the previous event exceeds the threshold). Used as the
    correctness oracle for :func:`sessionize`; SQL-portable.
    ``tiebreak_col`` makes the per-user ordering total when timestamps can
    tie (cross-engine window determinism)."""
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy("user_id").orderBy(*order)
    # NTZ-safe epoch seconds (session tz is UTC): TIMESTAMP_NTZ refuses a
    # direct long cast in Spark 4
    # MILLISECOND gaps, same resolution as the streaming fold — second-
    # truncated epochs disagreed with the stream on sub-second data
    # (10:00:00.000 vs 10:30:00.500 is > a 30-min gap in ms, not in s)
    ep = F.unix_millis(F.col(ts_col).cast("timestamp_ltz"))
    gap = ep - F.lag(ep).over(w)
    keep = ["user_id"] + order
    with_flag = events.select(*keep).withColumn(
        "_new",
        F.when(gap.isNull() | (gap > gap_minutes * 60_000), 1).otherwise(0),
    )
    with_sid = with_flag.withColumn("_sid", F.sum("_new").over(w))
    return (
        with_sid.groupBy("user_id", "_sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("int").alias("n_events"),
        )
        .drop("_sid")
    )
