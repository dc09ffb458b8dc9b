"""As-of join: match each left row to the most recent right row at or before
it (per key). Spark has no built-in; this is the standard union+window
re-expression — one shuffle on (key), one sort, zero row explosion.

Why not the naive formulation (`l JOIN r ON l.key = r.key AND r.ts <= l.ts`
then windowed top-1): that materializes every (left, earlier-right) pair
before pruning — O(n·m) per key, quadratic on active keys. The union trick is
O(n+m) log-sorted:

    tag left/right -> union -> window per key ordered by (ts, right-first)
    -> last non-null right payload carried forward -> keep left rows

At 100 TB both inputs shuffle once on the key (co-partitionable / bucketable)
and the window is a single pass per key group. This matches DuckDB/kdb ASOF
JOIN semantics (ties: a right row AT the left timestamp matches).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.ts <= left.ts`` for the same key.

    ``right_payload`` are the right columns carried onto the result (they
    appear with their own names; make them distinct from left's). ``how``:
    ``inner`` drops unmatched left rows, ``left`` keeps them with nulls.
    """
    keys = [key] if isinstance(key, str) else list(key)
    lcols = [c for c in left.columns if c not in keys and c != left_ts]

    # one unioned stream: right rows sort BEFORE left rows at equal ts so a
    # right row exactly at the left timestamp is visible to it (ASOF <= tie)
    r_struct = F.struct(*[F.col(c) for c in right_payload])
    l_struct = F.struct(*[F.col(c) for c in lcols])

    lu = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        l_struct.alias("__l"),
        F.lit(None).cast(right.select(r_struct.alias("x")).schema["x"].dataType).alias("__r"),
    )
    ru = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left.select(l_struct.alias("x")).schema["x"].dataType).alias("__l"),
        r_struct.alias("__r"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.asc("__ts"), F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = lu.unionByName(ru).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    matched = merged.filter(F.col("__side") == 1)
    # matchedness is the carried STRUCT being non-null — a matched right row
    # whose payload fields are all NULL still counts as a match (filtering on
    # a payload column instead would wrongly drop it)
    if how == "inner":
        matched = matched.filter(F.col("__match").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join supports how in ('inner','left'), got {how!r}")
    return matched.select(
        *keys,
        F.col("__ts").alias(left_ts),
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__match.{c}").alias(c) for c in right_payload],
    )
