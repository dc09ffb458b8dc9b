"""Recall-buyback sweep for the two-level walk at 2M rows (round-8 A/B
follow-up).

TWO_LEVEL_AB.json measured the descent 6.7x faster than brute at 2M x 64
but at recall 0.53 under the budget frozen from 200k. This prices the
walk knobs that buy recall back: one graph build + one exact truth pass,
then the batch descent at increasing (beam_up, n_descend, beam, hops)
budgets, recording recall@k, wall-clock, and rows-touched per query —
the cost curve a user picks an operating point from.

Writes TWO_LEVEL_RECALL_SWEEP.json (or --out).
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
from educational_vector_database_spark.operators import knn as K  # noqa: E402

LEVEL_MULT = 16

BUDGETS = [
    # (beam_up, hops_up, n_descend, beam, hops) — the AB point first
    (64, 5, 32, 128, 8),
    (128, 5, 64, 256, 10),
    (192, 6, 96, 384, 12),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/ab_big")
    ap.add_argument("--n-queries", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TWO_LEVEL_RECALL_SWEEP.json"))
    a = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("two_level_recall_sweep")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "64g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.read.parquet(os.path.join(a.dir, "embeddings.parquet")) \
        .select("vec_id", "embedding").persist()
    n = corpus.count()
    dim = len(corpus.head().embedding)
    print(f"corpus n={n} dim={dim}", flush=True)

    def planes_for(rows):
        np_ = max(3, math.ceil(math.log2(max(2.0, rows / 400))))
        return [A.hyperplanes(dim, np_, seed=A.LSH_SEED + r) for r in range(4)]

    t0 = time.monotonic()
    upper = A.upper_layer(corpus, LEVEL_MULT).persist()
    n_up = upper.count()
    ug = A.knn_graph(upper, planes_for(n_up), m=a.m).persist()
    ug.count()
    lg = A.knn_graph(corpus, planes_for(n), m=a.m).persist()
    lg.count()
    build_s = time.monotonic() - t0
    hubs = A.graph_hub_entries(ug, 64)
    print(f"built in {build_s:.1f}s", flush=True)

    step = max(1, n // a.n_queries)
    queries = corpus.filter(F.col("vec_id") % step == 0).limit(a.n_queries) \
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec")).persist()
    nq = queries.count()

    t0 = time.monotonic()
    truth_rows = K.knn_join(corpus, queries, k=a.k).select(
        "query_id", "vec_id").collect()
    brute_s = time.monotonic() - t0
    truth: dict = {}
    for r in truth_rows:
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    print(f"brute truth: {brute_s:.1f}s", flush=True)

    q = queries.select(F.col("query_id").alias("qid"),
                       F.col("query_vec").alias("qv"))
    nodes = corpus.select(F.col("vec_id").alias("id"),
                          F.col("embedding").alias("nv"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))

    points = []
    for beam_up, hops_up, n_descend, beam, hops in BUDGETS:
        t0 = time.monotonic()
        rows = A.graph_two_level_search_batch(
            ug, lg, corpus, queries, hubs,
            beam_up=beam_up, hops_up=hops_up, n_descend=n_descend,
            beam=beam, hops=hops, k=a.k,
        ).collect()
        walk_s = time.monotonic() - t0
        got: dict = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.vec_id)
        hits = sum(len(got.get(qid, set()) & want)
                   for qid, want in truth.items())
        recall = hits / sum(len(want) for want in truth.values())
        # rows-touched, untimed: re-run the recurrences and count
        seed_up = q.select("qid").crossJoin(
            nodes.select("id").filter(F.col("id").isin(hubs)))
        v_up = A._beam_visited_batch(q, nodes, ug, seed_up, beam_up,
                                     hops_up, "cosine", True)
        seeds = (v_up.withColumn("rn", F.row_number().over(w))
                 .filter(F.col("rn") <= n_descend).select("qid", "id"))
        v_lo = A._beam_visited_batch(q, nodes, lg, seeds, beam, hops,
                                     "cosine", True)
        touched = (v_up.count() + v_lo.count()) / nq
        pt = {
            "beam_up": beam_up, "hops_up": hops_up, "n_descend": n_descend,
            "beam": beam, "hops": hops,
            "walk_s": round(walk_s, 1),
            "speedup_vs_brute": round(brute_s / walk_s, 2),
            "recall_at_k": round(recall, 3),
            "rows_touched_per_query": round(touched, 1),
        }
        points.append(pt)
        print(json.dumps(pt), flush=True)

    out = {
        "corpus_rows": n, "dim": dim, "n_queries": nq, "k": a.k,
        "m": a.m, "level_mult": LEVEL_MULT,
        "build_s": round(build_s, 1),
        "brute_s": round(brute_s, 1),
        "points": points,
    }
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
