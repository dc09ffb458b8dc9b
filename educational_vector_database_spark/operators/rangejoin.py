"""Range (interval) joins: fact value against dimension [lo, hi) bands.

The reference has no non-equi join (its only joins are the kNN score joins,
ref: src/vectordb/index.py); a training-data pipeline needs one constantly —
score -> quality tier, length -> bucket, timestamp -> billing period. Two
physical strategies, same semantics:

- ``broadcast_range_join``: BroadcastNestedLoopJoin with the raw interval
  predicate. Right for dimension-sized band tables (tens..thousands of
  rows): every executor holds the bands, the fact side streams through
  scan-side with no shuffle at all. At 100 TB of facts this is the plan you
  want — the cost is |facts| x |bands| PREDICATE EVALUATIONS, not a shuffle.

- ``bucketed_range_join``: the scale path when the band table itself is
  large (millions of intervals, e.g. IP->geo). Quantize: explode each band
  into the fixed-width buckets it overlaps, join fact rows to candidates on
  the equi bucket id, re-check the exact predicate. Turns the nested loop
  into an ordinary shuffled equi-join whose fan-out is bounded by
  interval_width / bucket_width + 1 candidates per fact row.

Both require half-open, non-overlapping bands for unique assignment (the
caller's contract; overlapping bands produce one row per match, exactly like
SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_range_join(
    facts: DataFrame,
    bands: DataFrame,
    value: Column,
    lo: str = "lo",
    hi: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """facts x bands on lo <= value < hi, bands explicitly broadcast.

    The broadcast hint is load-bearing: without it Catalyst may pick a
    cartesian product with a post-filter, which shuffles the fact side.
    """
    b = F.broadcast(bands)
    return facts.join(b, (value >= b[lo]) & (value < b[hi]), how)


def bucketed_range_join(
    facts: DataFrame,
    bands: DataFrame,
    value: Column,
    bucket_width: float,
    lo: str = "lo",
    hi: str = "hi",
) -> DataFrame:
    """Equi-join rewrite of the interval join for LARGE band tables.

    Each band replicates into ceil((hi-lo)/w) bucket rows; each fact row
    computes its single bucket id scan-side. The join is then a plain
    (bucket-id) equi-join — broadcastable or shuffled, AQE's choice — with
    the exact interval predicate re-applied to the candidates.
    """
    w = float(bucket_width)
    bands_b = bands.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / w).cast("long"),
                # hi is exclusive: a band ending exactly on a bucket edge
                # does not overlap the next bucket, so the last bucket is
                # ceil(hi/w) - 1 (== floor(hi/w) when hi is off-edge)
                (F.ceil(F.col(hi) / w) - F.lit(1)).cast("long"),
            )
        ),
    )
    facts_b = facts.withColumn("__bucket", F.floor(value / w).cast("long"))
    joined = facts_b.join(bands_b, "__bucket").where(
        (value >= F.col(lo)) & (value < F.col(hi))
    )
    return joined.drop("__bucket")
