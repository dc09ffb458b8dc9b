"""Two-level walk recall at 2M x 64 over k-means-cell-built graphs
(round-9, VERDICT r8 next-round #1 — the structural fix).

REFINE_CONVERGENCE.json pinned the wall: LSH-built edges at 2M have 2.9%
direct capture of true top-10 neighbors and NN-descent can't climb out
(+0.1pp/round). knn_graph_cells swaps the candidate generator for top-A
k-means cells (data-adaptive). This experiment prices the full stack on
the same corpus/queries/truth as the sym sweep:

  leg 1  capture of the cells-built lower graph (the build-quality gate)
  leg 2  one NN-descent round on top (converges when edges are real)
  leg 3  + degree-capped symmetrization (navigability matters once
         edges point somewhere meaningful)
  walks  two-level descent at the standard budgets per graph variant

Graphs cached as parquet under --cache; reuses the sym sweep's corpus,
queries, truth, and the IVF sweep's trained centroids.

Writes GRAPH_CELLS_2M.json incrementally.
"""

from __future__ import annotations

import argparse
import json
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
    (64, 5, 32, 128, 8),
    (128, 5, 64, 256, 10),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/ab_big")
    ap.add_argument("--cache", default="/tmp/sym_exp")
    ap.add_argument("--n-cells", type=int, default=1414)
    ap.add_argument("--assigns", type=int, default=2)
    ap.add_argument("--n-queries", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--expand", type=int, default=8)
    ap.add_argument("--m-rev", type=int, default=16)
    ap.add_argument("--legs", default="cells,refined,sym",
                    help="comma subset of cells,refined,sym")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "GRAPH_CELLS_2M.json"))
    a = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("graph_cells_2m")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "44g")
        .config("spark.local.dir", "/tmp/spark_gcells_2m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.read.parquet(os.path.join(a.dir, "embeddings.parquet")) \
        .select("vec_id", "embedding").persist()
    n = corpus.count()
    dim = len(corpus.head().embedding)
    print(f"corpus n={n} dim={dim}", flush=True)

    os.makedirs(a.cache, exist_ok=True)
    build_s: dict = {}

    def cached(name, builder):
        path = os.path.join(a.cache, name)
        if not os.path.isdir(path):
            t0 = time.monotonic()
            builder().write.mode("overwrite").parquet(path)
            build_s[name] = round(time.monotonic() - t0, 1)
            print(f"built {name} in {build_s[name]}s", flush=True)
        df = spark.read.parquet(path).persist()
        df.count()
        return df

    cents = spark.read.parquet(
        os.path.join(a.cache, f"ivf_cents_k{a.n_cells}"))
    upper = cached("upper", lambda: A.upper_layer(corpus, LEVEL_MULT))

    step = max(1, n // a.n_queries)
    queries = corpus.filter(F.col("vec_id") % step == 0).limit(a.n_queries) \
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec")).persist()
    nq = queries.count()
    truth_df = cached(f"truth_k{a.k}_q{a.n_queries}",
                      lambda: K.knn_join(corpus, queries, k=a.k)
                      .select("query_id", "vec_id"))
    truth: dict = {}
    for r in truth_df.collect():
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    t_pairs = truth_df.filter(F.col("query_id") != F.col("vec_id")).persist()
    n_pairs = t_pairs.count()

    t0 = time.monotonic()
    K.knn_join(corpus, queries, k=a.k).select("query_id", "vec_id").collect()
    brute_s = time.monotonic() - t0
    print(f"brute (warm) {brute_s:.1f}s", flush=True)

    out = {"corpus_rows": n, "dim": dim, "n_cells": a.n_cells,
           "assigns": a.assigns, "m": a.m, "level_mult": LEVEL_MULT,
           "n_queries": nq, "k": a.k, "brute_s": round(brute_s, 1),
           "build_s": build_s, "graphs": []}

    def dump():
        out["build_s"] = build_s
        with open(a.out, "w") as f:
            json.dump(out, f, indent=1)

    def capture(g):
        cap = t_pairs.join(
            g, (t_pairs.query_id == g.src) & (t_pairs.vec_id == g.dst),
            "left_semi").count()
        return round(cap / n_pairs, 4)

    q = queries.select(F.col("query_id").alias("qid"),
                       F.col("query_vec").alias("qv"))
    nodes = corpus.select(F.col("vec_id").alias("id"),
                          F.col("embedding").alias("nv"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))

    def sweep(tag, ug_, lg_):
        hubs = A.graph_hub_entries(ug_, 64)
        entry = {"tag": tag, "edge_capture": capture(lg_), "points": []}
        out["graphs"].append(entry)
        print(f"[{tag}] capture={entry['edge_capture']}", flush=True)
        dump()
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
            seed_up = q.select("qid").crossJoin(
                nodes.select("id").filter(F.col("id").isin(hubs)))
            v_up = A._beam_visited_batch(q, nodes, ug_, seed_up, beam_up,
                                         hops_up, "cosine", True).persist()
            n_up_vis = v_up.count()
            seeds = (v_up.withColumn("rn", F.row_number().over(w))
                     .filter(F.col("rn") <= n_descend).select("qid", "id"))
            v_lo = A._beam_visited_batch(q, nodes, lg_, seeds, beam, hops,
                                         "cosine", True)
            touched = (n_up_vis + v_lo.count()) / nq
            v_up.unpersist()
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

    legs = [x for x in a.legs.split(",") if x]
    kc = f"k{a.n_cells}_a{a.assigns}_m{a.m}"
    ug_c = cached(f"ugc_{kc}", lambda: A.knn_graph_cells(
        upper, cents, m=a.m, assigns=a.assigns))
    lg_c = cached(f"lgc_{kc}", lambda: A.knn_graph_cells(
        corpus, cents, m=a.m, assigns=a.assigns))
    if "cells" in legs:
        sweep("cells", ug_c, lg_c)
    ug_r, lg_r = ug_c, lg_c
    if "refined" in legs or "sym" in legs:
        ug_r = cached(f"ugc_{kc}_r1", lambda: A.knn_graph_refine(
            ug_c, upper, m=a.m, expand=a.expand))
        lg_r = cached(f"lgc_{kc}_r1", lambda: A.knn_graph_refine(
            lg_c, corpus, m=a.m, expand=a.expand))
    if "refined" in legs:
        sweep("cells_refined_x1", ug_r, lg_r)
    if "sym" in legs:
        ug_s = cached(f"ugc_{kc}_r1_sym{a.m_rev}", lambda: A.symmetrize_edges(
            ug_r, m_rev=a.m_rev))
        lg_s = cached(f"lgc_{kc}_r1_sym{a.m_rev}", lambda: A.symmetrize_edges(
            lg_r, m_rev=a.m_rev))
        sweep(f"cells_refined_x1_sym{a.m_rev}", ug_s, lg_s)

    dump()
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
