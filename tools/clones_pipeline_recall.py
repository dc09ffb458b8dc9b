"""End-to-end recall of the dedup-then-hierarchy pipeline on the clone
corpus (VERDICT r7 next-round #7).

Round-7 facts: on the 100-replica clone corpus every flat graph degree
scores ~0 recall@10 (hub entries collapse into clone clusters) and the
two-level hierarchy ALONE scores 0.89. The production answer for
duplicate-heavy corpora is the composition gated this round as
`knn_two_level_dedup_reps`: near-dup contraction -> two-level graphs over
REPRESENTATIVES -> batch descent -> expand winners to cluster members ->
exact rescore. This measures that pipeline's recall@k against exact brute
force on the full clone corpus. Target: >= 0.95.

Corpus: serving_crossover.gen_embeddings (sf0.1 x replicas; r%10 in 1..4
epsilon near-dups of the base, 5..9 alternating sign flips — which form
two 25-member clone clusters of their own, so contraction collapses
200k rows to ~6k representatives).

Writes CLONES_PIPELINE_RECALL.json (or --out).
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
from educational_vector_database_spark.operators import dedup as D  # noqa: E402
from educational_vector_database_spark.operators import knn as K  # noqa: E402
from educational_vector_database_spark.functions import vector as V  # noqa: E402

LEVEL_MULT = 16


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf10_clones")
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--n-queries", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--threshold", type=float, default=0.85,
                    help="near-dup cosine threshold for contraction")
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--beam-up", type=int, default=64)
    ap.add_argument("--hops-up", type=int, default=4)
    ap.add_argument("--n-descend", type=int, default=32)
    ap.add_argument("--beam", type=int, default=128)
    ap.add_argument("--hops", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CLONES_PIPELINE_RECALL.json"))
    a = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("clones_pipeline_recall")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "64g")
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

    # --- contraction: near-dup pairs -> CC -> min-id representatives -------
    t0 = time.monotonic()
    n_planes = max(3, math.ceil(math.log2(max(2.0, n / 400))))
    planes = A.hyperplanes(dim, n_planes, seed=A.LSH_SEED)
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
    contract_s = time.monotonic() - t0
    print(f"contraction: {n} -> {n_reps} reps in {contract_s:.1f}s", flush=True)

    # --- two-level graphs over the representatives -------------------------
    t0 = time.monotonic()
    ps = [A.hyperplanes(dim, max(3, math.ceil(math.log2(max(2.0, n_reps / 400)))),
                        seed=A.LSH_SEED + r) for r in range(4)]
    upper = A.upper_layer(reps, LEVEL_MULT).persist()
    ug = A.knn_graph(upper, ps, m=a.m).persist()
    lg = A.knn_graph(reps, ps, m=a.m).persist()
    n_up_edges = ug.count()
    n_lo_edges = lg.count()
    build_s = time.monotonic() - t0
    hubs = A.graph_hub_entries(ug, 64)
    print(f"graphs: upper {n_up_edges} + lower {n_lo_edges} edges "
          f"in {build_s:.1f}s", flush=True)

    # --- queries: epsilon-perturbed copies of base vectors ------------------
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

    # ground truth: exact brute on the FULL clone corpus
    t0 = time.monotonic()
    truth_rows = K.knn_join(corpus, queries, k=a.k).select(
        "query_id", "vec_id").collect()
    brute_s = time.monotonic() - t0
    truth: dict = {}
    for r in truth_rows:
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    print(f"brute truth: {brute_s:.1f}s", flush=True)

    # --- pipeline serve: rep walk -> expand -> exact rescore ----------------
    t0 = time.monotonic()
    walk = A.graph_two_level_search_batch(
        ug, lg, reps, queries, hubs,
        beam_up=a.beam_up, hops_up=a.hops_up, n_descend=a.n_descend,
        beam=a.beam, hops=a.hops, k=a.k,
    ).select(F.col("query_id").alias("qid"), F.col("vec_id").alias("cid"))
    expanded = walk.join(
        labeled.select("vec_id", "embedding", "cid"), "cid"
    ).select("qid", "vec_id", "embedding")
    scored = expanded.join(
        F.broadcast(queries.select(F.col("query_id").alias("qid"),
                                   V.as_double("query_vec").alias("qv"))),
        "qid",
    ).select(
        "qid", "vec_id",
        V.similarity("cosine", V.as_double("embedding"), F.col("qv")).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    res = scored.withColumn("rn", F.row_number().over(w)) \
        .filter(F.col("rn") <= a.k).select("qid", "vec_id").collect()
    pipe_s = time.monotonic() - t0
    got: dict = {}
    for r in res:
        got.setdefault(r.qid, set()).add(r.vec_id)
    hits = sum(len(got.get(q, set()) & want) for q, want in truth.items())
    tot = sum(len(want) for want in truth.values())
    recall = hits / tot
    print(f"pipeline: {pipe_s:.1f}s recall@{a.k}={recall:.3f}", flush=True)

    out = {
        "corpus_rows": n, "dim": dim, "n_queries": nq, "k": a.k,
        "threshold": a.threshold,
        "n_reps": n_reps,
        "contraction_ratio": round(n / n_reps, 1),
        "contract_s": round(contract_s, 1),
        "edges": {"upper": n_up_edges, "lower": n_lo_edges},
        "build_s": round(build_s, 1),
        "params": {"m": a.m, "level_mult": LEVEL_MULT,
                   "beam_up": a.beam_up, "hops_up": a.hops_up,
                   "n_descend": a.n_descend, "beam": a.beam, "hops": a.hops},
        "brute_s": round(brute_s, 1),
        "pipeline_serve_s": round(pipe_s, 1),
        "recall_at_k": round(recall, 3),
        "two_level_alone_reference": {
            "source": "TWO_LEVEL_SF10_CLONES.json (round 7)",
            "recall_at_k": 0.890,
        },
        "flat_graph_reference": {
            "source": "BASELINE.md round-7 clone table",
            "recall_at_k": 0.004,
        },
    }
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()
    return 0 if recall >= 0.95 else 1


if __name__ == "__main__":
    raise SystemExit(main())
