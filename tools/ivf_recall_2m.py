"""IVF multi-probe recall/latency sweep at 2M x 64 (round-9, VERDICT r8
next-round #1 — the data-adaptive leg).

The capture diagnostic (REFINE_CONVERGENCE.json, BASELINE.md round-9)
located the graph family's recall wall: data-OBLIVIOUS sign-LSH planes
capture a ~0.6-cosine true-neighbor pair with p ~ (1-theta/pi)^planes,
and planes grow with n, so direct edge capture was 2.9% at 2M — no walk
budget recovers from that. K-means cells are data-ADAPTIVE: the cell
boundaries move to the data, so a true neighbor is in one of the query's
nearest nprobe cells with probability that rises steeply in nprobe,
independent of n (the IVF recall law every FAISS deployment tunes).

One warm session: train KMeans on a deterministic sample, assign cells
with the gated blocked-GEMM tier (ivf_assign_gemm), then for each nprobe
serve the same 128 gated queries as the graph sweeps — probe list via
numpy against the broadcast centroids (K x dim is driver-small), one
equi-join on centroid_id, exact rescore, top-k. Reports recall@10,
rows-touched/query (= summed probed-cell populations), wall per nprobe,
and a warm brute leg in the SAME session for the speedup denominator.

Writes IVF_RECALL_2M.json incrementally.
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

from educational_vector_database_spark.functions import vector as V  # noqa: E402
from educational_vector_database_spark.operators import ann as A  # noqa: E402
from educational_vector_database_spark.operators import knn as K  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/ab_big")
    ap.add_argument("--cache", default="/tmp/sym_exp")
    ap.add_argument("--n-cells", type=int, default=1414,
                    help="~sqrt(n) — the FAISS rule of thumb")
    ap.add_argument("--train-sample", type=int, default=200_000)
    ap.add_argument("--n-queries", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nprobes", default="8,16,32,64,96")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "IVF_RECALL_2M.json"))
    a = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ivf_recall_2m")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "44g")
        .config("spark.local.dir", "/tmp/spark_ivf_2m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import numpy as np

    corpus = spark.read.parquet(os.path.join(a.dir, "embeddings.parquet")) \
        .select("vec_id", "embedding").persist()
    n = corpus.count()
    dim = len(corpus.head().embedding)
    print(f"corpus n={n} dim={dim}", flush=True)

    os.makedirs(a.cache, exist_ok=True)

    def cached(name, builder):
        path = os.path.join(a.cache, name)
        if not os.path.isdir(path):
            t0 = time.monotonic()
            builder().write.mode("overwrite").parquet(path)
            print(f"built {name} in {time.monotonic() - t0:.1f}s", flush=True)
        df = spark.read.parquet(path)
        return df

    # --- train on a deterministic hash-sample, assign via blocked GEMM ----
    t_build0 = time.monotonic()
    sample_frac = min(1.0, a.train_sample / n)
    train = corpus.filter(
        F.pmod(F.xxhash64("vec_id", F.lit("ivf2m")), 1_000_000)
        < int(sample_frac * 1_000_000)
    )
    cents = cached(f"ivf_cents_k{a.n_cells}",
                   lambda: A.train_ivf_centroids(train, a.n_cells))
    cent_rows = cents.collect()
    C = np.array([r.centroid for r in
                  sorted(cent_rows, key=lambda r: r.centroid_id)],
                 dtype=np.float64)
    cells = cached(
        f"ivf_cells_k{a.n_cells}",
        lambda: A.ivf_assign_gemm(corpus, cents),
    ).persist()
    n_assigned = cells.count()
    assert n_assigned == n, (n_assigned, n)
    build_s = time.monotonic() - t_build0
    census = {int(r.centroid_id): int(r.c) for r in
              cells.groupBy("centroid_id").agg(F.count("*").alias("c"))
              .collect()}
    print(f"build (train+assign) {build_s:.1f}s; cells={len(census)}",
          flush=True)

    # --- queries + truth (same protocol as the graph sweeps) --------------
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

    q_rows = queries.collect()
    Q = np.array([r.query_vec for r in q_rows], dtype=np.float64)
    qids = [int(r.query_id) for r in q_rows]
    # cosine probe ranking: normalized dot against centroids
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    probe_rank = np.argsort(-(Qn @ Cn.T), axis=1)  # (nq, K)

    t0 = time.monotonic()
    K.knn_join(corpus, queries, k=a.k).select("query_id", "vec_id").collect()
    brute_s = time.monotonic() - t0
    print(f"brute (warm) {brute_s:.1f}s", flush=True)

    out = {"corpus_rows": n, "dim": dim, "n_cells": a.n_cells,
           "train_sample": a.train_sample, "n_queries": nq, "k": a.k,
           "build_s": round(build_s, 1), "brute_s": round(brute_s, 1),
           "points": []}

    def dump():
        with open(a.out, "w") as f:
            json.dump(out, f, indent=1)

    # the assignment parquet's vector column is "v" (ivf_assign_gemm output)
    score = V.similarity("cosine", V.as_double("v"),
                         V.as_double("query_vec"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("vec_id"))
    total_truth = sum(len(v) for v in truth.values())

    for nprobe in [int(x) for x in a.nprobes.split(",") if x]:
        plist = [(qids[i], [int(c) for c in probe_rank[i, :nprobe]])
                 for i in range(nq)]
        probes = spark.createDataFrame(
            plist, "query_id bigint, pcells array<int>"
        ).join(queries, "query_id") \
         .select("query_id", "query_vec", F.explode("pcells").alias("pcell"))
        t0 = time.monotonic()
        rows = (
            cells.join(F.broadcast(probes),
                       cells.centroid_id == probes.pcell)
            .select("query_id", "vec_id", score.alias("score"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= a.k)
            .select("query_id", "vec_id")
            .collect()
        )
        serve_s = time.monotonic() - t0
        got: dict = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.vec_id)
        hits = sum(len(got.get(qid, set()) & want)
                   for qid, want in truth.items())
        touched = sum(census.get(c, 0) for _, cs in plist for c in cs) / nq
        pt = {"nprobe": nprobe,
              "serve_s": round(serve_s, 1),
              "speedup_vs_brute": round(brute_s / serve_s, 2),
              "recall_at_k": round(hits / total_truth, 3),
              "rows_touched_per_query": round(touched, 1),
              "scan_frac": round(touched / n, 4)}
        out["points"].append(pt)
        print(json.dumps(pt), flush=True)
        dump()

    dump()
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
