"""Skew rehearsal: measured evidence for the hot-key mitigation story.

The scale notes promise two answers to skewed keys (SURVEY §6, the salted
aggregation query, AQE skew-join): this tool MEASURES them instead of
asserting them. It builds a deliberately skewed join workload — one user
owns half of an 8M-row event table, the dimension is 10k users — and times
three plans for the same join + aggregate:

  1. baseline: sort-merge join, AQE off — the hot key lands in ONE task,
     wall-clock is bounded by that task;
  2. aqe_skew: AQE on with skew-join handling — the optimizer splits the
     oversized partition at runtime (the zero-code fix);
  3. salted: the dimension exploded 16x on a salt column, the fact side
     salted uniformly — the manual rewrite for engines/operators AQE can't
     reach.

All three must return identical results (asserted on the aggregate), and
the skewed plans must beat the baseline. Deterministic data (hash-based
skew assignment, no RNG). Writes SKEW_REHEARSAL.json.

Broadcast is disabled throughout: at 10k rows the dimension would
broadcast and hide the skew entirely (which is itself the FIRST mitigation
— this rehearsal exercises what happens when the build side is too big for
that).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

_LOG4J = os.path.join(REPO, "tools", "log4j2-quiet.properties")
if os.path.exists(_LOG4J):
    opt = f"-Dlog4j2.configurationFile=file:{_LOG4J}"
    os.environ["SPARK_SUBMIT_OPTS"] = (
        os.environ.get("SPARK_SUBMIT_OPTS", "") + " " + opt
    ).strip()

from pyspark.sql import SparkSession, functions as F  # noqa: E402

N_EVENTS = 8_000_000
N_USERS = 10_000
HOT_USER = 0
SALT_N = 16
ROOT = "/tmp/skew_rehearsal"


def _session() -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    s = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("skew_rehearsal")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def gen(spark: SparkSession) -> None:
    # half the rows hash to the hot user, the rest spread uniformly;
    # md5-derived assignment keeps the fixture deterministic
    e = spark.range(N_EVENTS).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, F.lit(HOT_USER))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_USERS)))
        .alias("user_id"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100000)) / 100.0).alias("value"),
    )
    e.repartition(32).write.mode("overwrite").parquet(f"{ROOT}/events")
    d = spark.range(N_USERS).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("tier_"), F.pmod(F.col("id"), F.lit(5))).alias("tier"),
    )
    d.repartition(4).write.mode("overwrite").parquet(f"{ROOT}/users")


def _confs(spark, aqe: bool):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())
    # the fixture's hot partition (~4M rows, ~100 MB) must exceed the skew
    # thresholds or AQE won't split it at this toy scale
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")


def _agg(df):
    return (
        df.groupBy("tier")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .orderBy("tier")
    )


def run(spark: SparkSession) -> dict:
    # fresh reads per timed run: a re-collected DataFrame instance skips its
    # already-computed shuffle stages (map output survives per-RDD), which
    # would time stage-skipping instead of the join
    def tables():
        return (
            spark.read.parquet(f"{ROOT}/events"),
            spark.read.parquet(f"{ROOT}/users"),
        )

    # session warm-up: file listing + codegen, outside every measurement
    e0, d0 = tables()
    e0.count(), d0.count()

    results, timings = {}, {}

    def timed(name, build, repeats=3):
        samples = []
        for _ in range(repeats):
            df = build()
            t0 = time.monotonic()
            rows = df.collect()
            samples.append(time.monotonic() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 2)
        results[name] = [tuple(r) for r in rows]

    def plain():
        e, d = tables()
        return _agg(e.join(d, "user_id"))

    def salted():
        e, d = tables()
        sd = d.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_N - 1)))
        )
        se = e.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_N)))
        return _agg(se.join(sd, ["user_id", "salt"]))

    _confs(spark, aqe=False)
    timed("baseline_smj", plain)

    _confs(spark, aqe=True)
    timed("aqe_skew_join", plain)

    _confs(spark, aqe=False)
    timed("manual_salt", salted)

    assert results["baseline_smj"] == results["aqe_skew_join"] == results["manual_salt"]
    return timings


def main() -> int:
    spark = _session()
    if not os.path.isdir(f"{ROOT}/events"):
        gen(spark)
    timings = run(spark)
    out = {
        "n_events": N_EVENTS,
        "n_users": N_USERS,
        "hot_user_share": 0.5,
        "salt_n": SALT_N,
        "timings_s": timings,
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(REPO, "SKEW_REHEARSAL.json"), "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
