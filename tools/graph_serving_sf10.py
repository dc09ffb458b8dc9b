"""Graph-ANN serving at sf10 (200k x 64): where the BATCHED beam walk beats
the batched brute-force kNN join — the graph-family answer to the
reference's ANN-beats-brute claim (reference README.md:22-25), measured the
way SERVING_SF10.json measured it for IVF.

Why batched: Spark serving amortizes per-job overhead across queries, and
the walk's job count is O(hops) regardless of query count
(graph_beam_search_batch), while brute work grows as queries x corpus. The
graph is built with the DEGREE-LAW parameters for n=200k (BASELINE.md
round-6 table: m=64, beam=128, hops=9) and corpus-scaled planes (bucket
population ~400 via 9 planes/set, the documented plane-scaling discipline).
Recall is measured against the brute results on the SAME queries.

Writes GRAPH_SERVING_SF10.json. Usage:
  python tools/graph_serving_sf10.py [--dir /tmp/sf10] [--n-queries 256]
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

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from educational_vector_database_spark.operators import ann as A  # noqa: E402
from educational_vector_database_spark.operators import knn as K  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf10")
    ap.add_argument("--n-queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "GRAPH_SERVING_SF10.json"))
    a = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("graph_serving_sf10")
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
    print(f"corpus n={n} dim={dim}", flush=True)

    # degree-law walk params + corpus-scaled planes (bucket pop ~400)
    p = A.graph_params_for(n)
    n_planes = max(4, math.ceil(math.log2(n / 400)))
    plane_sets = [A.hyperplanes(dim, n_planes, seed=A.LSH_SEED + r)
                  for r in range(4)]
    blocks = max(1, (n // (2 ** n_planes)) // 400)
    print(f"params: {p} planes/set={n_planes} blocks={blocks}", flush=True)

    t0 = time.monotonic()
    graph = A.knn_graph(
        corpus, plane_sets, m=p["m"], blocks_per_bucket=blocks
    ).persist()
    n_edges = graph.count()
    build_s = time.monotonic() - t0
    print(f"graph: {n_edges} edges in {build_s:.1f}s", flush=True)

    t0 = time.monotonic()
    entries = A.graph_hub_entries(graph, max(64, p["n_entry_cells"] // 4))
    entries_s = time.monotonic() - t0
    print(f"hub entries: {len(entries)} in {entries_s:.1f}s", flush=True)

    step = max(1, n // a.n_queries)
    queries = corpus.filter((F.col("vec_id") % step == 0)) \
        .limit(a.n_queries) \
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec")).persist()
    nq = queries.count()

    # batched brute force: ONE broadcast join + per-query window
    t0 = time.monotonic()
    brute = K.knn_join(corpus, queries, k=a.k).select(
        "query_id", "vec_id").collect()
    brute_s = time.monotonic() - t0
    brute_sets: dict = {}
    for r in brute:
        brute_sets.setdefault(r.query_id, set()).add(r.vec_id)
    print(f"brute batch: {nq} queries in {brute_s:.1f}s "
          f"({1000 * brute_s / nq:.0f} ms/query amortized)", flush=True)

    # batched graph walk: O(hops) jobs for ALL queries
    t0 = time.monotonic()
    walk = A.graph_beam_search_batch(
        graph, corpus, queries, entries,
        beam=p["beam"], hops=p["hops"], k=a.k,
    ).collect()
    walk_s = time.monotonic() - t0
    hits = tot = 0
    walk_sets: dict = {}
    for r in walk:
        walk_sets.setdefault(r.query_id, set()).add(r.vec_id)
    for qid, want in brute_sets.items():
        hits += len(walk_sets.get(qid, set()) & want)
        tot += len(want)
    recall = hits / tot
    print(f"graph batch: {nq} queries in {walk_s:.1f}s "
          f"({1000 * walk_s / nq:.0f} ms/query amortized) "
          f"recall@{a.k}={recall:.3f}", flush=True)

    out = {
        "corpus_rows": n,
        "dim": dim,
        "n_queries": nq,
        "k": a.k,
        "graph": {"m": p["m"], "beam": p["beam"], "hops": p["hops"],
                  "planes_per_set": n_planes, "plane_sets": 4,
                  "n_edges": n_edges, "build_s": round(build_s, 1),
                  "hub_entries": len(entries),
                  "entries_s": round(entries_s, 1)},
        "brute_batch": {"total_s": round(brute_s, 1),
                        "ms_per_query": round(1000 * brute_s / nq, 1)},
        "graph_batch": {"total_s": round(walk_s, 1),
                        "ms_per_query": round(1000 * walk_s / nq, 1),
                        "recall_at_k": round(recall, 3)},
        "speedup_vs_brute": round(brute_s / walk_s, 2),
    }
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
