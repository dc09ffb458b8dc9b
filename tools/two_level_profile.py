"""Phase-split profile of the batched two-level serve at the 10M rung
(round-11 forensics): the try3 A/B read `two_level` at 622 s median while
`flat` over the SAME lower graph read 95 s and touched MORE rows/query
(TWO_LEVEL_AB_10M.json) — an execution anomaly, not a walk-size one.

Reuses the materialized artifacts of the A/B run (corpus parquet + the
bucketed-merge `final/` edge parquet) so no rebuild is paid; rebuilds only
the small upper layer. Times each phase of the two-level serve separately:

  upper_build   upper_layer + one-shot knn_graph at n/16
  upper_walk    _beam_visited_batch over the upper graph (hub seeds)
  descent       the per-query top-n_descend window over the upper visited
  lower_walk    _beam_visited_batch over the lower graph (descent seeds)
  flat_walk     the same lower walk from hub seeds (the control)

Writes TWO_LEVEL_PROFILE_10M.json (or --out).
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

LEVEL_MULT = 16


def plane_sets_for(rows: int, dim: int) -> list:
    n_planes = max(3, math.ceil(math.log2(max(2.0, rows / 400))))
    return [A.hyperplanes(dim, n_planes, seed=A.LSH_SEED + r)
            for r in range(4)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/ab_big10m/embeddings.parquet")
    ap.add_argument("--final-edges",
                    default="/tmp/ab_big10m/lower_waves/final")
    ap.add_argument("--n-queries", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--beam-up", type=int, default=64)
    ap.add_argument("--hops-up", type=int, default=6)
    ap.add_argument("--n-descend", type=int, default=32)
    ap.add_argument("--beam", type=int, default=128)
    ap.add_argument("--hops", type=int, default=8)
    ap.add_argument("--flat-beam", type=int, default=128)
    ap.add_argument("--flat-hops", type=int, default=14)
    ap.add_argument("--m-upper", type=int, default=32)
    ap.add_argument("--driver-mem", default="64g")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TWO_LEVEL_PROFILE_10M.json"))
    a = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("two_level_profile")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", a.driver_mem)
        .config("spark.cleaner.periodicGC.interval", "90s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"phases_s": {}}
    P = out["phases_s"]

    def timed(name, fn):
        t0 = time.monotonic()
        r = fn()
        P[name] = round(time.monotonic() - t0, 1)
        print(f"  {name}: {P[name]}s", flush=True)
        return r

    corpus = (spark.read.parquet(a.corpus)
              .select("vec_id", "embedding").persist())
    n = corpus.count()
    dim = len(corpus.head().embedding)
    out["corpus_rows"] = n
    print(f"== corpus n={n} dim={dim}", flush=True)

    lg = (spark.read.parquet(a.final_edges)
          .select("src", "dst", "score").persist())
    timed("lg_cache", lg.count)
    out["lower_edges"] = lg.count()

    upper = A.upper_layer(corpus, LEVEL_MULT).persist()
    n_up = upper.count()
    ug = timed("upper_build", lambda: A.knn_graph(
        upper, plane_sets_for(n_up, dim), m=a.m_upper).persist())
    out["upper_edges"] = timed("ug_cache", ug.count)

    hubs_up = A.graph_hub_entries(ug, 64)
    hubs_lo = A.graph_hub_entries(lg, 64)

    step = max(1, n // a.n_queries)
    queries = (corpus.filter(F.col("vec_id") % step == 0)
               .limit(a.n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_vec")).persist())
    queries.count()

    q = queries.select(F.col("query_id").alias("qid"),
                       F.col("query_vec").alias("qv"))
    nodes = corpus.select(F.col("vec_id").alias("id"),
                          F.col("embedding").alias("nv"))

    # ---- upper walk (hub seeds), timed alone
    seed_up = q.select("qid").crossJoin(
        nodes.select("id").filter(F.col("id").isin(hubs_up)))
    v_up = timed("upper_walk", lambda: A._beam_visited_batch(
        q, nodes, ug, seed_up, a.beam_up, a.hops_up, "cosine", True))
    out["upper_visited"] = v_up.count()

    # ---- descent cut, timed alone
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    seeds = (v_up.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") <= a.n_descend).select("qid", "id"))
    timed("descent", lambda: seeds.localCheckpoint())
    seeds = seeds.localCheckpoint()

    # ---- lower walk from descent seeds, timed alone
    v_lo = timed("lower_walk_descent_seeds", lambda: A._beam_visited_batch(
        q, nodes, lg, seeds, a.beam, a.hops, "cosine", True))
    out["lower_visited"] = v_lo.count()

    # ---- the control: the same lower walk from hub seeds (flat shape)
    seed_flat = q.select("qid").crossJoin(
        nodes.select("id").filter(F.col("id").isin(hubs_lo)))
    v_flat = timed("flat_walk", lambda: A._beam_visited_batch(
        q, nodes, lg, seed_flat, a.flat_beam, a.flat_hops, "cosine", True))
    out["flat_visited"] = v_flat.count()

    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
