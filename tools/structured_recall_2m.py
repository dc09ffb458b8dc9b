"""Recall operating points at 2M x 64 on a CLUSTERED corpus (round-9,
VERDICT r8 next-round #1 — the answer).

The round-9 forensics chain on the iid-Gaussian 2M corpus established a
data wall, not an index wall: direct edge capture of LSH-built graphs is
2.9% (REFINE_CONVERGENCE.json), NN-descent climbs +0.1pp/round, degree-
capped symmetrization moves recall <0.02 (TWO_LEVEL_SYM_SWEEP.json), and
data-ADAPTIVE k-means cells fare no better at serving time (IVF_RECALL_2M
.json: recall 0.567 at 4.5% scan) — on isotropic data every sublinear
method degrades toward linear scan (the ANN no-free-lunch; hnswlib's own
high-recall regime assumes clustered embeddings). Real embedding corpora
are clustered: text/image encoders map semantically-similar items to
tight neighborhoods on a low-dimensional manifold. This tool measures the
SAME operators on a deterministic GMM corpus (2,000 seeded Gaussian
centers, Zipf-skewed populations, sigma chosen so in-cluster cosine ~0.8
vs cross-cluster ~0.1 — clearly clustered, NOT degenerate-duplicate like
the clone corpus) and pins the >=0.95-recall operating point:

  brute      exact K.knn_join (the denominator, warm, same session)
  two_level  descent over knn_graph_cells-built layers (+refine +sym)
  ivf        multi-probe cell serving, nprobe swept

Writes STRUCTURED_RECALL_2M.json incrementally.
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

LEVEL_MULT = 16

BUDGETS = [
    (64, 5, 32, 128, 8),
    (128, 5, 64, 256, 10),
]


def gen_gmm_corpus(spark, path: str, n: int, dim: int, n_clusters: int,
                   sigma: float, seed: int = 7) -> None:
    """Deterministic clustered corpus: cluster centers are seeded standard
    normals; row -> cluster via a Zipf(0.5)-skewed alias draw from a
    per-partition rng (rows are assigned to partitions by id range, so the
    stream is reproducible at any parallelism — the gen_gaussian_corpus
    discipline); point = center + sigma * noise."""
    import numpy as np
    import pandas as pd

    parts = 64
    per = n // parts
    rng_c = np.random.default_rng(seed)
    centers = rng_c.standard_normal((n_clusters, dim))
    w = 1.0 / np.sqrt(np.arange(1, n_clusters + 1))
    w /= w.sum()

    def make(batches):
        for pdf in batches:
            for pid in pdf["pid"]:
                pid = int(pid)
                lo = pid * per
                hi = n if pid == parts - 1 else lo + per
                rng = np.random.default_rng(seed * 1_000_003 + pid)
                cnt = hi - lo
                cids = rng.choice(n_clusters, size=cnt, p=w)
                X = centers[cids] + sigma * rng.standard_normal((cnt, dim))
                yield pd.DataFrame({
                    "vec_id": np.arange(lo, hi, dtype=np.int64),
                    "cluster_id": cids.astype(np.int32),
                    "embedding": [row.astype(np.float64).tolist()
                                  for row in X],
                })

    pids = spark.range(parts).select(F.col("id").alias("pid")) \
        .repartition(parts, "pid")
    df = pids.mapInPandas(
        make, "vec_id bigint, cluster_id int, embedding array<double>")
    df.write.mode("overwrite").parquet(path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/gmm_2m")
    ap.add_argument("--cache", default="/tmp/gmm_exp")
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--clusters", type=int, default=2000)
    ap.add_argument("--sigma", type=float, default=0.5)
    ap.add_argument("--n-cells", type=int, default=1414)
    ap.add_argument("--assigns", type=int, default=2)
    ap.add_argument("--n-queries", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--m-rev", type=int, default=16)
    ap.add_argument("--expand", type=int, default=8)
    ap.add_argument("--nprobes", default="4,8,16,32")
    ap.add_argument("--legs", default="cells,sym,ivf",
                    help="comma subset of cells,refined,sym,ivf")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STRUCTURED_RECALL_2M.json"))
    a = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("structured_recall_2m")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "44g")
        .config("spark.local.dir", "/tmp/spark_gmm_2m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import numpy as np

    path = os.path.join(a.dir, "embeddings.parquet")
    if not os.path.isdir(path):
        t0 = time.monotonic()
        gen_gmm_corpus(spark, path, a.n, a.dim, a.clusters, a.sigma)
        print(f"generated GMM {a.n}x{a.dim} c={a.clusters} sigma={a.sigma} "
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

    # centroids trained on a deterministic hash-sample
    train = corpus.filter(
        F.pmod(F.xxhash64("vec_id", F.lit("gmm2m")), 10) < 1)
    cents = cached(f"cents_k{a.n_cells}",
                   lambda: A.train_ivf_centroids(train, a.n_cells))

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
    total_truth = sum(len(v) for v in truth.values())

    t0 = time.monotonic()
    K.knn_join(corpus, queries, k=a.k).select("query_id", "vec_id").collect()
    brute_s = time.monotonic() - t0
    print(f"brute (warm) {brute_s:.1f}s", flush=True)

    out = {"corpus": "gmm", "corpus_rows": n, "dim": a.dim,
           "clusters": a.clusters, "sigma": a.sigma,
           "n_cells": a.n_cells, "assigns": a.assigns, "m": a.m,
           "level_mult": LEVEL_MULT, "n_queries": nq, "k": a.k,
           "brute_s": round(brute_s, 1), "build_s": build_s,
           "graphs": [], "ivf_points": []}

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
                "recall_at_k": round(hits / total_truth, 3),
                "rows_touched_per_query": round(touched, 1),
            }
            entry["points"].append(pt)
            print(f"[{tag}] {json.dumps(pt)}", flush=True)
            dump()

    legs = [x for x in a.legs.split(",") if x]
    kc = f"k{a.n_cells}_a{a.assigns}_m{a.m}"
    upper = cached("upper", lambda: A.upper_layer(corpus, LEVEL_MULT))
    ug_c = lg_c = None
    if {"cells", "refined", "sym", "routed"} & set(legs):
        ug_c = cached(f"ugc_{kc}", lambda: A.knn_graph_cells(
            upper, cents, m=a.m, assigns=a.assigns))
        lg_c = cached(f"lgc_{kc}", lambda: A.knn_graph_cells(
            corpus, cents, m=a.m, assigns=a.assigns))
    if "cells" in legs:
        sweep("cells", ug_c, lg_c)
    ug_r, lg_r = ug_c, lg_c
    if {"refined", "sym"} & set(legs):
        ug_r = cached(f"ugc_{kc}_r1", lambda: A.knn_graph_refine(
            ug_c, upper, m=a.m, expand=a.expand))
        lg_r = cached(f"lgc_{kc}_r1", lambda: A.knn_graph_refine(
            lg_c, corpus, m=a.m, expand=a.expand))
    if "refined" in legs:
        sweep("cells_refined_x1", ug_r, lg_r)
    if "sym" in legs:
        ug_s = cached(f"ugc_{kc}_r1_sym{a.m_rev}",
                      lambda: A.symmetrize_edges(ug_r, m_rev=a.m_rev))
        lg_s = cached(f"lgc_{kc}_r1_sym{a.m_rev}",
                      lambda: A.symmetrize_edges(lg_r, m_rev=a.m_rev))
        sweep(f"cells_refined_x1_sym{a.m_rev}", ug_s, lg_s)

    cells = None
    if {"routed", "ivf"} & set(legs):
        cells = cached(f"cells_k{a.n_cells}",
                       lambda: A.ivf_assign_gemm(corpus, cents))

    if "routed" in legs and lg_c is not None:
        # centroid-routed walk: coarse quantizer routes, in-cluster kNN
        # edges polish — the connectivity fix for the disjoint components
        # a pure kNN graph has on clustered data
        for nprobe_s, spc, beam, hops in [(4, 2, 64, 4), (8, 2, 128, 6)]:
            t0 = time.monotonic()
            rows = A.graph_cells_route_search_batch(
                lg_c, cells, cents, queries, k=a.k, nprobe=nprobe_s,
                seeds_per_cell=spc, beam=beam, hops=hops,
            ).collect()
            serve_s = time.monotonic() - t0
            got = {}
            for r in rows:
                got.setdefault(r.query_id, set()).add(r.vec_id)
            hits = sum(len(got.get(qid, set()) & want)
                       for qid, want in truth.items())
            # untimed rows-touched through the same recurrence
            probes_w = Window.partitionBy("qid").orderBy(
                F.col("cdist").asc(), F.col("cid").asc())
            cents_n = cents.select(
                F.col("centroid_id").cast("int").alias("cid"),
                V.as_double("centroid").alias("cv"))
            probes = (q.crossJoin(F.broadcast(cents_n))
                      .select("qid", "cid", V.euclidean_distance(
                          F.col("qv"), F.col("cv")).alias("cdist"))
                      .withColumn("rn", F.row_number().over(probes_w))
                      .filter(F.col("rn") <= nprobe_s).select("qid", "cid"))
            memb = cells.select(F.col("vec_id").alias("id"),
                                F.col("centroid_id").cast("int").alias("cid"))
            w_seed = Window.partitionBy("qid", "cid").orderBy(
                F.col("id").asc())
            seeds = (memb.join(F.broadcast(probes), "cid")
                     .withColumn("rn", F.row_number().over(w_seed))
                     .filter(F.col("rn") <= spc).select("qid", "id"))
            touched = A._beam_visited_batch(
                q, nodes, lg_c, seeds, beam, hops, "cosine", True
            ).count() / nq
            pt = {"tag": "routed", "nprobe_seed": nprobe_s,
                  "seeds_per_cell": spc, "beam": beam, "hops": hops,
                  "serve_s": round(serve_s, 1),
                  "speedup_vs_brute": round(brute_s / serve_s, 2),
                  "recall_at_k": round(hits / total_truth, 3),
                  "rows_touched_per_query": round(touched, 1)}
            out.setdefault("routed_points", []).append(pt)
            print(json.dumps(pt), flush=True)
            dump()

    if "ivf" in legs:
        census = {int(r.centroid_id): int(r.c) for r in
                  cells.groupBy("centroid_id").agg(F.count("*").alias("c"))
                  .collect()}
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
        for nprobe in [int(x) for x in a.nprobes.split(",") if x]:
            plist = [(qids[i], [int(c) for c in probe_rank[i, :nprobe]])
                     for i in range(nq)]
            probes = spark.createDataFrame(
                plist, "query_id bigint, pcells array<int>"
            ).join(queries, "query_id") \
             .select("query_id", "query_vec",
                     F.explode("pcells").alias("pcell"))
            t0 = time.monotonic()
            rows = (
                cells.join(F.broadcast(probes),
                           cells.centroid_id == probes.pcell)
                .select("query_id", "vec_id", score.alias("score"))
                .withColumn("rn", F.row_number().over(w_ivf))
                .filter(F.col("rn") <= a.k)
                .select("query_id", "vec_id")
                .collect()
            )
            serve_s = time.monotonic() - t0
            got = {}
            for r in rows:
                got.setdefault(r.query_id, set()).add(r.vec_id)
            hits = sum(len(got.get(qid, set()) & want)
                       for qid, want in truth.items())
            touched = sum(census.get(c, 0)
                          for _, cs in plist for c in cs) / nq
            pt = {"nprobe": nprobe, "serve_s": round(serve_s, 1),
                  "speedup_vs_brute": round(brute_s / serve_s, 2),
                  "recall_at_k": round(hits / total_truth, 3),
                  "rows_touched_per_query": round(touched, 1),
                  "scan_frac": round(touched / n, 4)}
            out["ivf_points"].append(pt)
            print(json.dumps(pt), flush=True)
            dump()

    dump()
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
