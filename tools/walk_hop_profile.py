"""Per-hop cost breakdown of the batched beam walk (VERDICT r7 #1 support).

The sf10 two-level walk measured 186s for 256 queries at ~12 total hops —
~15s/hop, far above any plausible join cost on a 100 MB cached corpus.
This instruments ONE walk: per hop, time (a) the candidate expansion join
against the edge list, (b) the scoring join against the corpus, (c) the
anti-join/distinct bookkeeping and localCheckpoint materializations, by
materializing each stage separately. Also reports the physical join
strategies chosen (broadcast vs shuffle) so the fix — explicit broadcast
hints, persisted hash-partitioned sides — targets the real cost.

Usage: python tools/walk_hop_profile.py [--dir /tmp/sf10] [--n-queries 128]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

_LOG4J = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "log4j2-quiet.properties",
)
if os.path.exists(_LOG4J):
    opt = f"-Dlog4j2.configurationFile=file:{_LOG4J}"
    os.environ["SPARK_SUBMIT_OPTS"] = (
        os.environ.get("SPARK_SUBMIT_OPTS", "") + " " + opt
    ).strip()

from pyspark.sql import SparkSession, Window, functions as F  # noqa: E402

from educational_vector_database_spark.operators import ann as A  # noqa: E402
from educational_vector_database_spark.functions import vector as V  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf10")
    ap.add_argument("--n-queries", type=int, default=128)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--beam", type=int, default=128)
    ap.add_argument("--hops", type=int, default=6)
    a = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("walk_hop_profile")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.read.parquet(os.path.join(a.dir, "embeddings.parquet")) \
        .select("vec_id", "embedding").persist()
    n = corpus.count()
    dim = len(corpus.head().embedding)
    n_planes = max(3, math.ceil(math.log2(max(2.0, n / 400))))
    ps = [A.hyperplanes(dim, n_planes, seed=A.LSH_SEED + r) for r in range(4)]
    t0 = time.monotonic()
    lg = A.knn_graph(corpus, ps, m=a.m).persist()
    n_edges = lg.count()
    print(f"n={n} edges={n_edges} build={time.monotonic() - t0:.1f}s",
          flush=True)

    hubs = A.graph_hub_entries(lg, 64)
    step = max(1, n // a.n_queries)
    queries = corpus.filter(F.col("vec_id") % step == 0).limit(a.n_queries) \
        .select(F.col("vec_id").alias("qid"),
                F.col("embedding").alias("qv")).persist()
    nq = queries.count()

    q = queries.select("qid", V.as_double("qv").alias("qv"))
    nodes = corpus.select(F.col("vec_id").alias("id"),
                          V.as_double("embedding").alias("nv"))
    edges = lg.select("src", "dst")

    def score(cand):
        return (
            cand.join(nodes, "id")
            .join(q, "qid")
            .select("qid", "id",
                    V.similarity("cosine", "nv", "qv").alias("score"))
        )

    seed = q.select("qid").crossJoin(
        nodes.select("id").filter(F.col("id").isin(hubs)))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))

    t0 = time.monotonic()
    visited = score(seed).localCheckpoint()
    frontier = visited
    print(f"seed scored in {time.monotonic() - t0:.2f}s", flush=True)

    prof = []
    for h in range(a.hops):
        rec = {"hop": h}
        t0 = time.monotonic()
        expanded = (
            frontier.select("qid", F.col("id").alias("src"))
            .join(edges, "src")
            .select("qid", F.col("dst").alias("id"))
            .distinct()
        ).localCheckpoint()
        rec["expand_s"] = round(time.monotonic() - t0, 2)
        rec["expand_rows"] = expanded.count()

        t0 = time.monotonic()
        cand_ids = expanded.join(
            visited.select("qid", "id"), ["qid", "id"], "left_anti"
        ).localCheckpoint()
        rec["anti_s"] = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        cand = score(cand_ids).localCheckpoint()
        rec["score_s"] = round(time.monotonic() - t0, 2)
        rec["cand_rows"] = cand.count()

        t0 = time.monotonic()
        visited = visited.unionByName(cand).localCheckpoint()
        rec["union_s"] = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        frontier = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= a.beam).drop("rn")
        ).localCheckpoint()
        rec["beam_s"] = round(time.monotonic() - t0, 2)
        prof.append(rec)
        print(json.dumps(rec), flush=True)

    # which join strategy did the scorer get?
    plan = score(frontier)._jdf.queryExecution().executedPlan().toString()
    bhj = plan.count("BroadcastHashJoin")
    smj = plan.count("SortMergeJoin")
    print(f"score-join plan: BroadcastHashJoin={bhj} SortMergeJoin={smj}",
          flush=True)
    total = sum(sum(v for k, v in r.items() if k.endswith("_s")) for r in prof)
    print(json.dumps({"total_hops_s": round(total, 1), "prof": prof}),
          flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
