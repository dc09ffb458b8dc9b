"""Clustered-corpus serving operating point at SCALE (round 10,
VERDICT r9 next-round #5): extend the 2M Zipf-GMM measurement one rung to
5M x 64 with the INTERLEAVED protocol (the discipline that corrected the
round-8 clone-pipeline claim): brute, IVF multi-probe (nprobe 4/8) and the
centroid-routed graph walk run interleaved with rotating order, one warm
session, median of --repeats — so a host-contention window inflates every
leg equally instead of whichever leg it lands on.

Corpus: the STRUCTURED_RECALL_2M recipe scaled — seeded standard-normal
centers, Zipf(0.5)-skewed populations, sigma*noise; clusters scale with n
(default n/1000, the 2M run's density). Index sizing comes from
recommend_index(n, clustered=True): K ~ sqrt(n) cells, nprobe=4 — the
auto router's 5M verdict is exactly what this tool prices.

The routed leg's graph is built with the round-10 WAVED cells build
(bounded in-flight shuffle) — the first at-scale exercise of the path.

Writes STRUCTURED_RECALL_5M.json (or --out) incrementally.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
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

from educational_vector_database_spark.functions import vector as V  # noqa: E402
from educational_vector_database_spark.operators import ann as A  # noqa: E402
from educational_vector_database_spark.operators import knn as K  # noqa: E402
from structured_recall_2m import gen_gmm_corpus  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/gmm_5m")
    ap.add_argument("--cache", default="/tmp/gmm5_exp")
    ap.add_argument("--n", type=int, default=5_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--clusters", type=int, default=0,
                    help="0 -> n/1000 (the 2M run's cluster density)")
    ap.add_argument("--sigma", type=float, default=0.5)
    ap.add_argument("--n-cells", type=int, default=0,
                    help="0 -> recommend_index's K ~ sqrt(n)")
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--assigns", type=int, default=2)
    ap.add_argument("--build-waves", type=int, default=8)
    ap.add_argument("--n-queries", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--nprobes", default="4,8")
    ap.add_argument("--routed", default="8,2,128,6",
                    help="nprobe_seed,seeds_per_cell,beam,hops")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STRUCTURED_RECALL_5M.json"))
    a = ap.parse_args()

    clusters = a.clusters or max(2, a.n // 1000)
    rec = A.recommend_index(a.n, clustered=True)
    n_cells = a.n_cells or rec["params"]["n_cells"]

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("structured_recall_scale")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "44g")
        .config("spark.local.dir", "/tmp/spark_gmm_5m")
        .config("spark.cleaner.periodicGC.interval", "90s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import numpy as np

    path = os.path.join(a.dir, "embeddings.parquet")
    if not os.path.isdir(path):
        t0 = time.monotonic()
        gen_gmm_corpus(spark, path, a.n, a.dim, clusters, a.sigma)
        print(f"generated GMM {a.n}x{a.dim} c={clusters} sigma={a.sigma} "
              f"in {time.monotonic() - t0:.1f}s", flush=True)
    corpus = spark.read.parquet(path).select("vec_id", "embedding").persist()
    n = corpus.count()

    os.makedirs(a.cache, exist_ok=True)
    build_s: dict = {}

    def cached(name, builder):
        p = os.path.join(a.cache, name)
        if not os.path.isdir(p):
            t0 = time.monotonic()
            builder().write.mode("overwrite").parquet(p)
            build_s[name] = round(time.monotonic() - t0, 1)
            print(f"built {name} in {build_s[name]}s", flush=True)
        df = spark.read.parquet(p).persist()
        df.count()
        return df

    train = corpus.filter(
        F.pmod(F.xxhash64("vec_id", F.lit("gmm5m")), 10) < 1)
    cents = cached(f"cents_k{n_cells}",
                   lambda: A.train_ivf_centroids(train, n_cells))
    cells = cached(f"cells_k{n_cells}",
                   lambda: A.ivf_assign_gemm(corpus, cents))
    lg_c = cached(
        f"lgc_k{n_cells}_a{a.assigns}_m{a.m}",
        lambda: A.knn_graph_cells(
            corpus, cents, m=a.m, assigns=a.assigns,
            n_waves=a.build_waves,
            work_dir=os.path.join(a.cache, "_lgc_waves"),
            score_tier="gemm",  # throughput tier — rehearsal, not oracle
        ))

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
    total_truth = sum(len(v) for v in truth.values())

    # driver-side probe ranking for the IVF legs (same as the 2M tool)
    cent_rows = sorted(cents.collect(), key=lambda r: r.centroid_id)
    C = np.array([r.centroid for r in cent_rows], dtype=np.float64)
    q_rows = queries.collect()
    Q = np.array([r.query_vec for r in q_rows], dtype=np.float64)
    qids = [int(r.query_id) for r in q_rows]
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    probe_rank = np.argsort(-(Qn @ Cn.T), axis=1)
    score = V.similarity("cosine", V.as_double("v"),
                         V.as_double("query_vec"))
    w_ivf = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("vec_id"))

    def leg_brute():
        return K.knn_join(corpus, queries, k=a.k).select(
            "query_id", "vec_id").collect()

    def make_leg_ivf(nprobe):
        plist = [(qids[i], [int(c) for c in probe_rank[i, :nprobe]])
                 for i in range(nq)]
        probes = spark.createDataFrame(
            plist, "query_id bigint, pcells array<int>"
        ).join(queries, "query_id") \
         .select("query_id", "query_vec", F.explode("pcells").alias("pcell"))

        def leg():
            return (
                cells.join(F.broadcast(probes),
                           cells.centroid_id == probes.pcell)
                .select("query_id", "vec_id", score.alias("score"))
                .withColumn("rn", F.row_number().over(w_ivf))
                .filter(F.col("rn") <= a.k)
                .select("query_id", "vec_id").collect()
            )
        return leg

    r_np, r_spc, r_beam, r_hops = [int(x) for x in a.routed.split(",")]

    def leg_routed():
        return A.graph_cells_route_search_batch(
            lg_c, cells, cents, queries, k=a.k, nprobe=r_np,
            seeds_per_cell=r_spc, beam=r_beam, hops=r_hops,
        ).select("query_id", "vec_id").collect()

    nprobes = [int(x) for x in a.nprobes.split(",") if x]
    legs: dict = {"brute": leg_brute,
                  "routed": leg_routed}
    for np_ in nprobes:
        legs[f"ivf_np{np_}"] = make_leg_ivf(np_)
    order = ["brute"] + [f"ivf_np{x}" for x in nprobes] + ["routed"]

    times: dict[str, list[float]] = {name: [] for name in order}
    recalls: dict[str, float] = {}
    for rep in range(a.repeats):
        rot = order[rep % len(order):] + order[:rep % len(order)]
        for name in rot:
            t0 = time.monotonic()
            rows = legs[name]()
            dt = time.monotonic() - t0
            times[name].append(dt)
            if name not in recalls:
                got: dict = {}
                for r in rows:
                    got.setdefault(r.query_id, set()).add(r.vec_id)
                hits = sum(len(got.get(qid, set()) & want)
                           for qid, want in truth.items())
                recalls[name] = round(hits / total_truth, 3)
            print(f"  rep {rep} {name}: {dt:.1f}s "
                  f"(recall {recalls[name]})", flush=True)

    # rows touched per query, untimed
    census = {int(r.centroid_id): int(r.c) for r in
              cells.groupBy("centroid_id").agg(F.count("*").alias("c"))
              .collect()}
    touched = {"brute": float(n)}
    for np_ in nprobes:
        touched[f"ivf_np{np_}"] = round(sum(
            census.get(int(c), 0)
            for i in range(nq) for c in probe_rank[i, :np_]) / nq, 1)
    q = queries.select(F.col("query_id").alias("qid"),
                       F.col("query_vec").alias("qv"))
    nodes = corpus.select(F.col("vec_id").alias("id"),
                          F.col("embedding").alias("nv"))
    w_route = Window.partitionBy("qid").orderBy(
        F.col("cdist").asc(), F.col("cid").asc())
    cents_n = cents.select(F.col("centroid_id").cast("int").alias("cid"),
                           V.as_double("centroid").alias("cv"))
    probes_r = (q.crossJoin(F.broadcast(cents_n))
                .select("qid", "cid", V.euclidean_distance(
                    F.col("qv"), F.col("cv")).alias("cdist"))
                .withColumn("rn", F.row_number().over(w_route))
                .filter(F.col("rn") <= r_np).select("qid", "cid"))
    memb = cells.select(F.col("vec_id").alias("id"),
                        F.col("centroid_id").cast("int").alias("cid"))
    w_seed = Window.partitionBy("qid", "cid").orderBy(F.col("id").asc())
    seeds = (memb.join(F.broadcast(probes_r), "cid")
             .withColumn("rn", F.row_number().over(w_seed))
             .filter(F.col("rn") <= r_spc).select("qid", "id"))
    touched["routed"] = round(A._beam_visited_batch(
        q, nodes, lg_c, seeds, r_beam, r_hops, "cosine", True
    ).count() / nq, 1)

    med = {name: round(statistics.median(v), 1)
           for name, v in times.items()}
    out = {
        "protocol": "interleaved legs, rotating order, one warm session, "
                    f"median of {a.repeats}",
        "corpus": "gmm", "corpus_rows": n, "dim": a.dim,
        "clusters": clusters, "sigma": a.sigma,
        "n_cells": n_cells, "assigns": a.assigns, "m": a.m,
        "build_waves": a.build_waves,
        "recommend_index": rec,
        "n_queries": nq, "k": a.k, "build_s": build_s,
        "routed_params": {"nprobe_seed": r_np, "seeds_per_cell": r_spc,
                          "beam": r_beam, "hops": r_hops},
        "times_s": {name: [round(x, 1) for x in v]
                    for name, v in times.items()},
        "median_s": med,
        "recall_at_k": recalls,
        "speedup_vs_brute": {
            name: round(med["brute"] / med[name], 2)
            for name in order if name != "brute"},
        "rows_touched_per_query": touched,
        "scan_frac": {name: round(t / n, 4)
                      for name, t in touched.items()},
    }
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in (
        "median_s", "recall_at_k", "speedup_vs_brute",
        "rows_touched_per_query")}, indent=1), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
