"""BUILD-side recall sweep for the two-level walk at 2M x 64 (round-9,
VERDICT r8 next-round #1).

The round-8 walk-side sweep (TWO_LEVEL_RECALL_SWEEP.json) topped out at
recall 0.877: every knob it moved was walk budget on the SAME m=32/R=4
graph, and the LSH direct-capture rate bounds what any walk can reach.
This sweep moves the BUILD: NN-descent refinement rounds
(operators/ann.py knn_graph_refine) on both layers, then prices walk
budgets on each refined graph. Goal: a >=0.95-recall point at >2x brute.

Writes TWO_LEVEL_BUILD_SWEEP.json incrementally after every point.
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

# walk budgets: the r8 AB point, the r8 sweep's best, and one mid point
BUDGETS = [
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
    ap.add_argument("--expand", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--skip-base-walks", action="store_true",
                    help="base graph still builds (refine input) but its "
                         "walk points are not re-measured (r8 sweep + this "
                         "round's first attempt already have them)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TWO_LEVEL_BUILD_SWEEP.json"))
    a = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("two_level_build_sweep")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "44g")
        .config("spark.local.dir", "/tmp/spark_build_sweep")
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

    out = {
        "corpus_rows": n, "dim": dim, "n_queries": a.n_queries, "k": a.k,
        "m": a.m, "level_mult": LEVEL_MULT, "expand": a.expand,
        "graphs": [],
    }

    def dump():
        with open(a.out, "w") as f:
            json.dump(out, f, indent=1)

    # ---- base graphs (round 8 configuration) ----
    t0 = time.monotonic()
    upper = A.upper_layer(corpus, LEVEL_MULT).persist()
    n_up = upper.count()
    ug = A.knn_graph(upper, planes_for(n_up), m=a.m).persist()
    ug.count()
    lg = A.knn_graph(corpus, planes_for(n), m=a.m).persist()
    lg.count()
    base_build_s = time.monotonic() - t0
    print(f"base build {base_build_s:.1f}s (upper {n_up})", flush=True)

    # ---- truth ----
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
    out["brute_s"] = round(brute_s, 1)
    print(f"brute truth {brute_s:.1f}s", flush=True)

    q = queries.select(F.col("query_id").alias("qid"),
                       F.col("query_vec").alias("qv"))
    nodes = corpus.select(F.col("vec_id").alias("id"),
                          F.col("embedding").alias("nv"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))

    def sweep(tag, ug_, lg_, build_s):
        hubs = A.graph_hub_entries(ug_, 64)
        entry = {"tag": tag, "build_s": round(build_s, 1), "points": []}
        out["graphs"].append(entry)
        for beam_up, hops_up, n_descend, beam, hops in BUDGETS:
            t0 = time.monotonic()
            rows = A.graph_two_level_search_batch(
                ug_, lg_, corpus, queries, hubs,
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
            # rows-touched, untimed re-run of the recurrence
            seed_up = q.select("qid").crossJoin(
                nodes.select("id").filter(F.col("id").isin(hubs)))
            v_up = A._beam_visited_batch(q, nodes, ug_, seed_up, beam_up,
                                         hops_up, "cosine", True)
            seeds = (v_up.withColumn("rn", F.row_number().over(w))
                     .filter(F.col("rn") <= n_descend).select("qid", "id"))
            v_lo = A._beam_visited_batch(q, nodes, lg_, seeds, beam, hops,
                                         "cosine", True)
            touched = (v_up.count() + v_lo.count()) / nq
            pt = {
                "beam_up": beam_up, "hops_up": hops_up,
                "n_descend": n_descend, "beam": beam, "hops": hops,
                "walk_s": round(walk_s, 1),
                "speedup_vs_brute": round(brute_s / walk_s, 2),
                "recall_at_k": round(recall, 3),
                "rows_touched_per_query": round(touched, 1),
            }
            entry["points"].append(pt)
            print(f"[{tag}] {json.dumps(pt)}", flush=True)
            dump()

    if not a.skip_base_walks:
        sweep("base_m32_R4", ug, lg, base_build_s)

    # ---- NN-descent rounds on both layers ----
    ug_r, lg_r = ug, lg
    total_refine_s = base_build_s
    for rd in range(1, a.rounds + 1):
        t0 = time.monotonic()
        ug_n = A.knn_graph_refine(ug_r, upper, m=a.m, expand=a.expand)
        ug_n = ug_n.persist()
        ug_n.count()
        lg_n = A.knn_graph_refine(lg_r, corpus, m=a.m, expand=a.expand)
        lg_n = lg_n.persist()
        lg_n.count()
        refine_s = time.monotonic() - t0
        total_refine_s += refine_s
        print(f"refine round {rd}: {refine_s:.1f}s", flush=True)
        if ug_r is not ug:
            ug_r.unpersist()
            lg_r.unpersist()
        ug_r, lg_r = ug_n, lg_n
        sweep(f"refined_x{rd}", ug_r, lg_r, total_refine_s)

    dump()
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
