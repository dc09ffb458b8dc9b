"""SparkSession construction tuned for this engine.

Local testing runs ``local[N]`` single-JVM; the configuration below is chosen
so the same logical plans scale to a multi-executor cluster:

- AQE on (runtime partition coalescing + skew-join splitting) so shuffle
  partition counts self-tune between the 6k-row smoke scale and a 100 TB run.
- Arrow enabled for the (few) pandas-UDF hops.
- ``spark.sql.shuffle.partitions`` small for local runs; on a real cluster AQE
  scales it up from ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "educational-vector-database-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet stores TIMESTAMP(NANOS); read as int64 nanos
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one testdata table (TESTDATA.md: one parquet file per table).

    Self-sufficient under any SparkSession: some generations of
    ``events.parquet`` store TIMESTAMP(NANOS), which vanilla Spark rejects
    (PARQUET_TYPE_ILLEGAL). ``spark.sql.legacy.parquet.nanosAsLong`` is a
    runtime SQL conf, so we set it here (not only in :func:`get_spark`) — a
    user's stock session then reads ``events`` with ``ts`` as int64
    nanoseconds; micro-precision generations read as TIMESTAMP_NTZ.
    :func:`ts_micros` normalizes either representation.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # ts_micros maps TIMESTAMP_NTZ -> epoch micros through the session
        # timezone; pin it to UTC (DuckDB's epoch_us treats naive values as
        # UTC) so the mapping is right under a stock session too, not just
        # ours (get_spark already sets it).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def ts_micros(df, ts_col: str = "ts"):
    """Epoch-microseconds Column for an event-time column of EITHER on-disk
    flavor the testdata has shipped with:

    - int64 TIMESTAMP(NANOS) read via ``nanosAsLong`` → integer ``div 1000``
      (reproduces DuckDB's nanos→micros truncation bit-exactly);
    - native TIMESTAMP / TIMESTAMP_NTZ (timestamp[us] parquet) →
      ``unix_micros``; the session timezone is pinned to UTC (get_spark), so
      the NTZ→instant cast is the identity mapping DuckDB's ``epoch_us(ts)``
      uses.

    Keeping the conversion in ONE place means every batch/stream consumer
    (and its DuckDB oracle) agrees on the instant regardless of which
    generator produced the files."""
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get(ts_col)
    if dt == "bigint":
        return F.expr(f"{ts_col} div 1000")
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def events_stream_schema(spark: SparkSession, sf_dir: str) -> str:
    """DDL schema string for ``readStream`` over events.parquet, with the
    ``ts`` type matching what is actually on disk (readStream requires an
    explicit schema; a bigint/timestamp mismatch is a read error)."""
    ts_type = (
        load_table(spark, sf_dir, "events").schema["ts"].dataType.simpleString()
    )
    return (
        f"event_id bigint, ts {ts_type}, user_id bigint, "
        "event_type string, value double, props string"
    )
