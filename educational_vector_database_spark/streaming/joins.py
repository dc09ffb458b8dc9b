"""Stream-stream joins (Structured Streaming's two-sided stateful operator).

The reference engine is a single-process batch store with no streaming surface
(reference src/vectordb/api.py — every operation is call/return), so this
module is part of the mandated scale extension, not parity: the event-time
interval join every attribution / impression-to-conversion pipeline needs.

Semantics and state contract (the 100 TB design points):

- Both sides carry a watermark; the join condition bounds the other side's
  event time relative to this side's (``left.ts >= right.ts - maxDelay AND
  left.ts < right.ts`` — the upper bound is STRICT: a touch at exactly the
  conversion instant is not a prior touch, matching the oracle and unit
  test). Spark derives a state-eviction horizon from BOTH bounds,
  so each side's buffered state is O(rows within the interval + watermark
  slack) — never the whole stream.
- The join key (``user_id``) hashes both streams to the same shuffle
  partition, so matching is partition-local: one Exchange per side, then a
  streaming symmetric hash join.
- INNER join emits a pair the moment both rows are present — results don't
  wait for the watermark (only state cleanup does). Outer variants would
  hold unmatched rows until the horizon passes; we expose inner, the
  attribution case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .windows import with_event_time


def attribution_pairs(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_type: str = "view",
    max_delay: str = "30 minutes",
    user_col: str = "user_id",
) -> DataFrame:
    """Pair every *conversion* event with each prior *touch* event by the same
    user within ``max_delay`` — the classic view→purchase attribution join.

    Input: a STREAMING events frame with columns (event_id, ts, user_id,
    event_type). Output: (purchase_id, view_id, user_id, gap_us) in append
    mode; downstream typically aggregates per conversion in the sink.
    """
    e = with_event_time(events)
    conv = (
        e.filter(F.col("event_type") == conversion_type)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col(user_col).alias("p_user"),
            F.col("event_time").alias("p_time"),
        )
        .withWatermark("p_time", max_delay)
    )
    touch = (
        e.filter(F.col("event_type") == touch_type)
        .select(
            F.col("event_id").alias("view_id"),
            F.col(user_col).alias("v_user"),
            F.col("event_time").alias("v_time"),
        )
        .withWatermark("v_time", max_delay)
    )
    joined = conv.join(
        touch,
        F.expr(
            "p_user = v_user AND "
            f"v_time >= p_time - INTERVAL {max_delay} AND v_time < p_time"
        ),
        "inner",
    )
    return joined.select(
        "purchase_id",
        "view_id",
        F.col("p_user").alias("user_id"),
        (F.unix_micros("p_time") - F.unix_micros("v_time")).alias("gap_us"),
    )
