"""Two-level coarse-to-fine graph serving at sf10 (200k x 64) — the
hierarchy-vs-degree measurement (VERDICT r6 What's-missing #2).

The flat graph at n=200k needs m=64 / beam=128 / hops=9 (the degree law:
m doubles per 10x corpus). The two-level design builds an upper graph
over a deterministic ~1/16 hash sample (12.5k nodes), walks it from hub
entries, and descends into the full graph — entry quality from the
hierarchy instead of from degree.

Measured results (BASELINE.md round-7 table): at EQUAL edge budget
(m=32/32, ~6.8M edges vs flat m=32's 6.4M) recall parity on iid data
(0.923 vs 0.918) and within 0.06 of the law-degree flat graph at HALF
its edges; on the duplicate-heavy clone corpus the hierarchy scores 0.89
where EVERY flat degree scores ~0 (hub entries collapse into clone
clusters; the hash-sampled upper layer thins them and stays navigable).
Wall-clock on this host is contention-noisy (identical configs 68-186 s)
— recall and structural cost carry the claims.

Writes TWO_LEVEL_SF10.json (or --out) with the measured
build/walk/recall and the flat-graph reference numbers alongside.

Usage: python tools/two_level_sf10.py [--dir /tmp/graph_sf10_iid]
       [--m-lower 32] [--m-upper 32] [--hops-up 4] [--hops 8] ...
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

LEVEL_MULT = 16


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf10")
    ap.add_argument("--n-queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--m-lower", type=int, default=32)
    ap.add_argument("--m-upper", type=int, default=16)
    ap.add_argument("--beam-up", type=int, default=64)
    ap.add_argument("--hops-up", type=int, default=6)
    ap.add_argument("--n-descend", type=int, default=16)
    ap.add_argument("--beam", type=int, default=128)
    ap.add_argument("--hops", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TWO_LEVEL_SF10.json"))
    a = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("two_level_sf10")
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

    # bucket-pop-~400 plane scaling per layer, derived blocking everywhere
    def plane_sets_for(rows: int) -> list:
        n_planes = max(3, math.ceil(math.log2(max(2.0, rows / 400))))
        return [A.hyperplanes(dim, n_planes, seed=A.LSH_SEED + r)
                for r in range(4)]

    t0 = time.monotonic()
    upper = A.upper_layer(corpus, LEVEL_MULT).persist()
    n_up = upper.count()
    ug = A.knn_graph(upper, plane_sets_for(n_up), m=a.m_upper).persist()
    n_up_edges = ug.count()
    up_build_s = time.monotonic() - t0
    print(f"upper: {n_up} nodes, {n_up_edges} edges in {up_build_s:.1f}s",
          flush=True)

    t0 = time.monotonic()
    lg = A.knn_graph(corpus, plane_sets_for(n), m=a.m_lower).persist()
    n_lo_edges = lg.count()
    lo_build_s = time.monotonic() - t0
    print(f"lower: {n_lo_edges} edges in {lo_build_s:.1f}s", flush=True)

    t0 = time.monotonic()
    entries = A.graph_hub_entries(ug, 64)
    entries_s = time.monotonic() - t0

    step = max(1, n // a.n_queries)
    queries = corpus.filter((F.col("vec_id") % step == 0)) \
        .limit(a.n_queries) \
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec")).persist()
    nq = queries.count()

    t0 = time.monotonic()
    brute = K.knn_join(corpus, queries, k=a.k).select(
        "query_id", "vec_id").collect()
    brute_s = time.monotonic() - t0
    brute_sets: dict = {}
    for r in brute:
        brute_sets.setdefault(r.query_id, set()).add(r.vec_id)
    print(f"brute batch: {nq} queries in {brute_s:.1f}s", flush=True)

    t0 = time.monotonic()
    walk = A.graph_two_level_search_batch(
        ug, lg, corpus, queries, entries,
        beam_up=a.beam_up, hops_up=a.hops_up, n_descend=a.n_descend,
        beam=a.beam, hops=a.hops, k=a.k,
    ).collect()
    walk_s = time.monotonic() - t0
    walk_sets: dict = {}
    for r in walk:
        walk_sets.setdefault(r.query_id, set()).add(r.vec_id)
    hits = tot = 0
    for qid, want in brute_sets.items():
        hits += len(walk_sets.get(qid, set()) & want)
        tot += len(want)
    recall = hits / tot
    print(f"two-level batch: {nq} queries in {walk_s:.1f}s "
          f"({1000 * walk_s / nq:.0f} ms/query) recall@{a.k}={recall:.3f}",
          flush=True)

    out = {
        "corpus_rows": n,
        "dim": dim,
        "n_queries": nq,
        "k": a.k,
        "two_level": {
            "m_lower": a.m_lower, "m_upper": a.m_upper,
            "level_mult": LEVEL_MULT,
            "upper_nodes": n_up, "upper_edges": n_up_edges,
            "lower_edges": n_lo_edges,
            "total_edges": n_up_edges + n_lo_edges,
            "build_s": round(up_build_s + lo_build_s, 1),
            "hub_entries": len(entries), "entries_s": round(entries_s, 1),
            "beam_up": a.beam_up, "hops_up": a.hops_up,
            "n_descend": a.n_descend, "beam": a.beam, "hops": a.hops,
            "walk_s": round(walk_s, 1),
            "ms_per_query": round(1000 * walk_s / nq, 1),
            "recall_at_k": round(recall, 3),
        },
        "brute_batch": {"total_s": round(brute_s, 1),
                        "ms_per_query": round(1000 * brute_s / nq, 1)},
        "speedup_vs_brute": round(brute_s / walk_s, 2),
        "flat_graph_reference": {
            "source": "GRAPH_SERVING_SF10_IID.json (round 6)",
            "m": 64, "n_edges": 12_800_000, "build_s": 191.5,
            "walk_s": 81.4, "recall_at_k": 0.98,
        },
    }
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
