"""Interleaved serving A/B for the dedup-then-hierarchy pipeline on the
clone corpus (round-9, VERDICT r8 What's-wrong #3 / next-round #3).

CLONES_PIPELINE_RECALL.json's "serve 40.9s vs brute 74.6s" came from
one-shot timings; the repo's own protocol (tools/two_level_ab.py) is
interleaved legs in one warm session with rotating order and medians —
the round-8 A/B measured the same binary's brute leg ranging 8.3-176.5s
across windows, so a one-shot comparison proves nothing. This re-measures
the claim under that protocol:

  brute      exact K.knn_join over the FULL clone corpus
  pipeline   two-level walk over dedup REPRESENTATIVES -> expand winners
             to cluster members -> exact rescore (serve only; the
             contraction + builds happen once, untimed — index-build cost)
  two_level  two-level walk over the FULL clone corpus's own graphs
             (the hierarchy without contraction — r7's 0.89-recall leg)

Writes CLONES_PIPELINE_AB.json (or --out).
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
from educational_vector_database_spark.operators import dedup as D  # noqa: E402
from educational_vector_database_spark.operators import knn as K  # noqa: E402

LEVEL_MULT = 16


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf10_clones")
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--n-queries", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--threshold", type=float, default=0.85)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--refine-rounds", type=int, default=0)
    ap.add_argument("--beam-up", type=int, default=64)
    ap.add_argument("--hops-up", type=int, default=4)
    ap.add_argument("--n-descend", type=int, default=32)
    ap.add_argument("--beam", type=int, default=128)
    ap.add_argument("--hops", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CLONES_PIPELINE_AB.json"))
    a = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("clones_pipeline_ab")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "44g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = os.path.join(a.dir, "embeddings.parquet")
    if not os.path.isdir(path):
        from serving_crossover import gen_embeddings

        print(f"generating clone corpus at {path}...", flush=True)
        gen_embeddings(spark, a.dir, a.replicas)

    corpus = spark.read.parquet(path).select("vec_id", "embedding").persist()
    n = corpus.count()
    dim = len(corpus.head().embedding)
    print(f"clone corpus: n={n} dim={dim}", flush=True)

    def plane_sets(rows):
        np_ = max(3, math.ceil(math.log2(max(2.0, rows / 400))))
        return [A.hyperplanes(dim, np_, seed=A.LSH_SEED + r) for r in range(4)]

    def maybe_refine(g, df):
        for _ in range(a.refine_rounds):
            prev = g.persist()
            prev.count()
            g = A.knn_graph_refine(prev, df, m=a.m, expand=8)
        return g

    # --- contraction + rep graphs (untimed: index-build cost) --------------
    t0 = time.monotonic()
    planes = A.hyperplanes(
        dim, max(3, math.ceil(math.log2(max(2.0, n / 400)))), seed=A.LSH_SEED
    )
    pairs = D.embedding_near_dup_bucketed(
        corpus, planes, threshold=a.threshold
    ).select("id_a", "id_b")
    cc = D.connected_components(pairs).persist()
    labeled = corpus.join(cc, corpus.vec_id == cc.id, "left").select(
        corpus.vec_id, "embedding",
        F.coalesce("cluster_id", corpus.vec_id).alias("cid"),
    ).persist()
    reps = labeled.filter(F.col("vec_id") == F.col("cid")) \
        .select("vec_id", "embedding").persist()
    n_reps = reps.count()
    upper_r = A.upper_layer(reps, LEVEL_MULT).persist()
    ug_r = maybe_refine(A.knn_graph(upper_r, plane_sets(upper_r.count()), m=a.m),
                        upper_r).persist()
    lg_r = maybe_refine(A.knn_graph(reps, plane_sets(n_reps), m=a.m),
                        reps).persist()
    ug_r.count(); lg_r.count()
    hubs_r = A.graph_hub_entries(ug_r, 64)
    build_pipe_s = time.monotonic() - t0
    print(f"contraction {n}->{n_reps} + rep graphs in {build_pipe_s:.1f}s",
          flush=True)

    # --- full-corpus two-level graphs (untimed) -----------------------------
    t0 = time.monotonic()
    upper_f = A.upper_layer(corpus, LEVEL_MULT).persist()
    ug_f = maybe_refine(A.knn_graph(upper_f, plane_sets(upper_f.count()), m=a.m),
                        upper_f).persist()
    lg_f = maybe_refine(A.knn_graph(corpus, plane_sets(n), m=a.m),
                        corpus).persist()
    ug_f.count(); lg_f.count()
    hubs_f = A.graph_hub_entries(ug_f, 64)
    build_full_s = time.monotonic() - t0
    print(f"full-corpus graphs in {build_full_s:.1f}s", flush=True)

    # --- queries + truth (untimed) ------------------------------------------
    import numpy as np

    base_rows = corpus.filter(F.col("vec_id") < 10_000_000) \
        .orderBy("vec_id").limit(a.n_queries).collect()
    rng = np.random.default_rng(42)
    qvecs = [
        [float(x) for x in
         (np.array(r.embedding, dtype=np.float64)
          + rng.normal(0, 0.05, size=dim))]
        for r in base_rows
    ]
    queries = spark.createDataFrame(
        [(i, q) for i, q in enumerate(qvecs)],
        "query_id bigint, query_vec array<double>",
    ).persist()
    nq = queries.count()
    truth_rows = K.knn_join(corpus, queries, k=a.k).select(
        "query_id", "vec_id").collect()
    truth: dict = {}
    for r in truth_rows:
        truth.setdefault(r.query_id, set()).add(r.vec_id)

    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    q_b = F.broadcast(queries.select(F.col("query_id").alias("qid"),
                                     V.as_double("query_vec").alias("qv")))

    def leg_brute():
        return [(r.query_id, r.vec_id) for r in
                K.knn_join(corpus, queries, k=a.k)
                .select("query_id", "vec_id").collect()]

    def leg_pipeline():
        walk = A.graph_two_level_search_batch(
            ug_r, lg_r, reps, queries, hubs_r,
            beam_up=a.beam_up, hops_up=a.hops_up, n_descend=a.n_descend,
            beam=a.beam, hops=a.hops, k=a.k,
        ).select(F.col("query_id").alias("qid"), F.col("vec_id").alias("cid"))
        expanded = walk.join(
            labeled.select("vec_id", "embedding", "cid"), "cid"
        ).select("qid", "vec_id", "embedding")
        scored = expanded.join(q_b, "qid").select(
            "qid", "vec_id",
            V.similarity("cosine", V.as_double("embedding"),
                         F.col("qv")).alias("score"),
        )
        return [(r.qid, r.vec_id) for r in
                scored.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= a.k).select("qid", "vec_id").collect()]

    def leg_two_level():
        return [(r.query_id, r.vec_id) for r in
                A.graph_two_level_search_batch(
                    ug_f, lg_f, corpus, queries, hubs_f,
                    beam_up=a.beam_up, hops_up=a.hops_up,
                    n_descend=a.n_descend, beam=a.beam, hops=a.hops, k=a.k,
                ).select("query_id", "vec_id").collect()]

    legs = {"brute": leg_brute, "pipeline": leg_pipeline,
            "two_level": leg_two_level}
    order = ["brute", "pipeline", "two_level"]
    times: dict[str, list[float]] = {name: [] for name in order}
    recalls: dict[str, float] = {}
    for rep in range(a.repeats):
        rotated = order[rep % 3:] + order[:rep % 3]
        for name in rotated:
            t0 = time.monotonic()
            rows = legs[name]()
            dt = time.monotonic() - t0
            times[name].append(dt)
            if name not in recalls:
                got: dict = {}
                for qid, vid in rows:
                    got.setdefault(qid, set()).add(vid)
                hits = sum(len(got.get(q_, set()) & w_)
                           for q_, w_ in truth.items())
                recalls[name] = hits / sum(len(w_) for w_ in truth.values())
            print(f"  rep {rep} {name}: {dt:.1f}s", flush=True)

    med = {k_: round(statistics.median(v), 1) for k_, v in times.items()}
    out = {
        "protocol": "interleaved legs, rotating order, one warm session, "
                    "median of repeats (two_level_ab protocol)",
        "corpus_rows": n, "dim": dim, "n_queries": nq, "k": a.k,
        "repeats": a.repeats, "threshold": a.threshold,
        "n_reps": n_reps, "contraction_ratio": round(n / n_reps, 1),
        "refine_rounds": a.refine_rounds,
        "build_pipeline_s": round(build_pipe_s, 1),
        "build_full_graphs_s": round(build_full_s, 1),
        "params": {"m": a.m, "level_mult": LEVEL_MULT,
                   "beam_up": a.beam_up, "hops_up": a.hops_up,
                   "n_descend": a.n_descend, "beam": a.beam, "hops": a.hops},
        "times_s": {k_: [round(x, 1) for x in v] for k_, v in times.items()},
        "median_s": med,
        "recall_at_k": {k_: round(v, 3) for k_, v in recalls.items()},
        "speedup_vs_brute": {
            "pipeline": round(med["brute"] / med["pipeline"], 2),
            "two_level": round(med["brute"] / med["two_level"], 2),
        },
    }
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
