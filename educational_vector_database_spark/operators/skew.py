"""Skew mitigation: salted joins and hot-key isolation.

AQE's skew-join splitting (on by default, session.py) handles most skew at
runtime by splitting oversized sort-merge partitions. These helpers cover the
cases AQE cannot: broadcast-ineligible joins against a SMALL-but-replicable
dimension where one key dominates (the classic web-corpus "host = cdn.com"
problem), and deliberate salt-based repartitioning when writing a hot-keyed
dataset.

Technique: add a salt in [0, n_salts) to the big side (random — it only
distributes rows, never affects results), replicate the small side once per
salt value, join on (key, salt). The hot key's rows now spread over
``n_salts`` tasks instead of one straggler.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def with_salt(df: DataFrame, n_salts: int, seed: int = 42) -> DataFrame:
    """Uniform random salt column in [0, n_salts). Random is correct here:
    the salt never reaches results, it only spreads a hot key's rows across
    tasks; a content-derived salt would re-concentrate identical rows."""
    return df.withColumn(SALT, (F.rand(seed) * n_salts).cast("int"))


def replicate_for_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Explode the (small) side once per salt value: n_salts× its size —
    cheap when the side is dimension-sized, and what makes the salted join
    an ordinary equi-join."""
    return df.withColumn(SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str] | str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join where ``big`` has skewed join keys and ``small`` is modest
    but above the broadcast threshold. Result is identical to
    ``big.join(small, on, how)`` (tested); only the task-size distribution
    changes: the hottest key's work fans out over ``n_salts`` tasks."""
    keys = [on] if isinstance(on, str) else list(on)
    return (
        with_salt(big, n_salts, seed)
        .join(replicate_for_salt(small, n_salts), [*keys, SALT], how)
        .drop(SALT)
    )


def hot_keys(df: DataFrame, key_cols: Sequence[str], top_n: int = 20) -> DataFrame:
    """Diagnostic: heaviest join/group keys with their row counts — feed the
    output into a decision between broadcast, salting, or key isolation.
    Ties break on the key columns so the top-N boundary is deterministic
    (engine-independent — the property the oracle gate checks)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n_rows"))
        .orderBy(F.desc("n_rows"), *[F.asc(k) for k in key_cols])
        .limit(top_n)
    )
