"""Generate a scaled-up test dataset by deterministic replication of sf0.1.

Scale rehearsal support (VERDICT r3 item 4): the driver ships sf{0.001,0.01,0.1};
to exercise posting-list caps, AQE skew handling, and shuffle sizing at 10x the
bench scale we synthesize an "sf1" directory under /tmp from sf0.1.

Replication scheme (replica r in 0..N-1, r=0 is the untouched original):
  - keys shift by r*10_000_000 consistently across fact/dim tables, so all
    TPC-H joins stay referentially intact per replica.
  - documents: r in 1..4 are NEAR-DUPLICATES of the original (tail suffix
    appended -> high Jaccard/minhash collision, realistic dup clusters of
    size 5); r in 5..9 are DISTINCT (char-reversed text -> disjoint shingles).
    This makes the dedup family's candidate-pair volume scale realistically
    instead of exploding (pure 10x copies would put every doc in a 10-clique).
  - embeddings: r in 1..4 perturb each component by a tiny index-dependent
    epsilon (cosine near-dups); r in 5..9 sign-flip alternating components
    (roughly orthogonal -> new mass, not duplicates).
  - events: id shift only; timestamps/value/props untouched so windowed
    aggregates see 10x density, the worst case for state size.

Everything is expression-level (no UDFs, no RNG): the output is bit-for-bit
deterministic, so rehearsal timings are comparable across rounds.

Usage: python tools/gen_sfN.py [--out /tmp/sf1] [--replicas 10]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

SRC = "/root/testdata/sf0.1"
KEY_SHIFT = 10_000_000

# key columns that must shift together to keep joins referentially intact
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
}
COPY_ONLY = ["region", "nation"]


def _replicas(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(n).select(F.col("id").cast("int").alias("r"))


def _shift_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    for k in keys:
        df = df.withColumn(k, F.col(k) + F.col("r").cast("long") * F.lit(KEY_SHIFT))
    return df.drop("r")


def gen(out: str, n: int) -> None:
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("gen_sfN")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    reps = _replicas(spark, n)

    for t in COPY_ONLY:
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet").crossJoin(F.broadcast(reps))
        _shift_keys(df, keys).repartition(32).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )

    docs = spark.read.parquet(f"{SRC}/documents.parquet").crossJoin(F.broadcast(reps))
    docs = docs.withColumn(
        "text",
        F.when(F.col("r") == 0, F.col("text"))
        .when(F.col("r") < 5, F.concat(F.col("text"), F.lit(" tailvariant "), F.col("r")))
        .otherwise(F.reverse(F.col("text"))),
    )
    docs = (
        docs.withColumn("doc_id", F.col("doc_id") + F.col("r").cast("long") * F.lit(KEY_SHIFT))
        .withColumn("n_chars", F.length("text"))
        .drop("r")
    )
    docs.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet").crossJoin(F.broadcast(reps))
    eps = "0.002 * double(r) * double((i % 7) - 3)"
    emb = emb.withColumn(
        "embedding",
        F.when(F.col("r") == 0, F.col("embedding"))
        .when(
            F.col("r") < 5,
            F.expr(f"transform(embedding, (x, i) -> float(x + {eps}))"),
        )
        .otherwise(
            F.expr(
                "transform(embedding, (x, i) -> float(CASE WHEN (i + r) % 2 = 0"
                " THEN x ELSE -x END))"
            )
        ),
    )
    emb = emb.withColumn(
        "vec_id", F.col("vec_id") + F.col("r").cast("long") * F.lit(KEY_SHIFT)
    ).drop("r")
    emb.repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    for t in list(KEYED) + ["documents", "embeddings"]:
        print(t, spark.read.parquet(f"{out}/{t}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--replicas", type=int, default=10)
    a = ap.parse_args()
    gen(a.out, a.replicas)
