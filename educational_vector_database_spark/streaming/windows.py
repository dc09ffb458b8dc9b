"""Event-time streaming analytics: watermarks, windows, custom state.

Nothing in the reference is event-time aware (its server is synchronous
request/response); these are the Structured Streaming operators a pipeline at
scale needs, driven by the ``events`` testdata shape
(event_id, user_id, event_type, ts, value, props).

- ``hourly_counts``: tumbling event-time window + watermark. Late rows beyond
  the watermark are dropped and window state is evicted — bounded state on an
  unbounded stream.
- ``sliding_value_avg``: overlapping windows (each row lands in
  window/slide buckets).
- ``sessionize_stateful``: gap-based sessions via
  ``applyInPandasWithState`` — the custom-stateful-operator escape hatch for
  semantics (session gap logic) that built-in windows cannot express.
  State per user is one (session_id, last_ts, n_events) triple.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_US = 1800 * 1_000_000  # 30 min, matches the batch sessionize query


def with_event_time(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Expose a proper event-time timestamp column from either on-disk
    flavor of ``ts`` (int64 nanos via nanosAsLong, or native timestamp —
    see session.ts_micros)."""
    from educational_vector_database_spark.session import ts_micros

    return events.withColumn("event_time", F.timestamp_micros(ts_micros(events, ts_col)))


def hourly_counts(
    events: DataFrame, watermark: str = "2 hours", window: str = "1 hour"
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data bound.

    On a stream, the watermark is the state-eviction contract: a window
    closes (and its state frees) once event time passes window_end +
    watermark. The same expression runs in batch (watermark is a no-op)."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_value_avg(
    events: DataFrame, window: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    return (
        events.withWatermark("event_time", "2 hours")
        .groupBy(F.window("event_time", window, slide).alias("w"), "event_type")
        .agg(F.avg("value").alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "avg_value")
    )


_SESSION_OUT_DDL = (
    "user_id bigint, session_id int, n_events bigint, start_us bigint, end_us bigint"
)
_SESSION_STATE_DDL = "session_id int, last_ts long, n_events long, start_us long"


def _make_session_fn(timeout_ms: int | None):
    def _session_fn(key, pdfs, state: GroupState):
        """Per-user session accumulator. Emits CLOSED sessions; the open
        session lives in state (one small tuple per user — bounded by active
        users, the scale contract of stateful streaming)."""
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                sid, last_ts, n, start = state.get
                state.remove()
                yield pd.DataFrame(
                    [(user_id, sid, n, start, last_ts)],
                    columns=["user_id", "session_id", "n_events", "start_us", "end_us"],
                )
            return

        if state.exists:
            sid, last_ts, n, start = state.get
        else:
            sid, last_ts, n, start = 0, None, 0, None

        closed = []
        # pdfs is an iterator of Arrow CHUNKS of this group's micro-batch
        # rows; sorting per chunk would mis-order timestamps that straddle a
        # chunk boundary. Buffer the micro-batch's rows for this key (bounded
        # by per-key batch volume, not total state) and sort once.
        chunks = [pdf[["ts_us"]] for pdf in pdfs]
        batch = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame({"ts_us": []})
        )
        for ts in batch.sort_values("ts_us")["ts_us"]:
            ts = int(ts)
            if last_ts is not None and ts - last_ts > SESSION_GAP_US:
                closed.append((user_id, sid, n, start, last_ts))
                sid, n, start = sid + 1, 0, None
            if start is None:
                start = ts
            last_ts = ts
            n += 1
        state.update((sid, last_ts, n, start))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_id", "n_events", "start_us", "end_us"],
            )

    return _session_fn


def sessionize_stateful(events: DataFrame, flush_timeout_ms: int | None = None) -> DataFrame:
    """Gap-based sessionization with explicit state (applyInPandasWithState).

    Expects columns (user_id, ts_us). Emits one row per CLOSED session. With
    ``flush_timeout_ms`` set, idle users' open sessions also flush on a
    processing-time timeout — the continuous-operation mode. Leave it None
    for drain-style (availableNow) runs: a pending timeout keeps the drain
    alive until it fires, so a bounded run would block on the timer.

    This is the streaming equivalent of the batch window/lag sessionize query
    — same gap constant, but incremental with O(active users) state."""
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if flush_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(flush_timeout_ms),
            outputStructType=_SESSION_OUT_DDL,
            stateStructType=_SESSION_STATE_DDL,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )
