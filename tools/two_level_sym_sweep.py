"""Symmetrized-walk recall sweep at 2M x 64 (round-9, VERDICT r8
next-round #1, second lever).

The build sweep (TWO_LEVEL_BUILD_SWEEP.json) shows NN-descent refinement
barely moves recall at constant walk budget (0.53 -> 0.55, 0.758 -> 0.756):
edge QUALITY is not the limiter. The remaining suspect is NAVIGABILITY —
the walk traverses out-edges only, and a top-m digraph concentrates
in-degree on hubs, leaving most nodes reachable only via edges that point
away from them. HNSW's links are bidirectional (hnswlib add_point inserts
reverse links); operators/ann.py symmetrize_edges is the batch analog
(degree-capped reversal). This sweep prices that lever: each graph variant
(refined x0/x1, sym m_rev 0/16/32, both layers) x the standard walk
budgets, recall / wall / rows-touched per point.

Graphs + truth are cached as parquet under --cache so variants iterate
without rebuilding (base build ~280s, refine ~230s/round at 2M).

Writes TWO_LEVEL_SYM_SWEEP.json incrementally after every point.
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
    (64, 5, 32, 128, 8),
    (128, 5, 64, 256, 10),
    (192, 6, 96, 384, 12),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/ab_big")
    ap.add_argument("--cache", default="/tmp/sym_exp")
    ap.add_argument("--big-n", type=int, default=2_000_000,
                    help="corpus rows to generate if --dir is missing")
    ap.add_argument("--n-queries", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--expand", type=int, default=8)
    ap.add_argument("--refine", type=int, default=1,
                    help="NN-descent rounds applied before symmetrizing")
    ap.add_argument("--m-rev", default="16,32",
                    help="comma list of reverse-edge caps to sweep (0 = off)")
    ap.add_argument("--budgets", default="",
                    help="optional 'i,j' indices into BUDGETS (default all)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TWO_LEVEL_SYM_SWEEP.json"))
    a = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("two_level_sym_sweep")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "44g")
        .config("spark.local.dir", "/tmp/spark_sym_sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    big_path = os.path.join(a.dir, "embeddings.parquet")
    if not os.path.isdir(big_path):
        from tools.two_level_ab import gen_gaussian_corpus
        t0 = time.monotonic()
        gen_gaussian_corpus(spark, big_path, a.big_n, 64)
        print(f"generated {a.big_n} x 64 in {time.monotonic() - t0:.1f}s",
              flush=True)
    corpus = spark.read.parquet(big_path) \
        .select("vec_id", "embedding").persist()
    n = corpus.count()
    dim = len(corpus.head().embedding)
    print(f"corpus n={n} dim={dim}", flush=True)

    def planes_for(rows):
        np_ = max(3, math.ceil(math.log2(max(2.0, rows / 400))))
        return [A.hyperplanes(dim, np_, seed=A.LSH_SEED + r) for r in range(4)]

    os.makedirs(a.cache, exist_ok=True)

    def cached(name, builder):
        """Build-once parquet cache; returns a persisted DataFrame."""
        path = os.path.join(a.cache, name)
        if not os.path.isdir(path):
            t0 = time.monotonic()
            builder().write.mode("overwrite").parquet(path)
            print(f"built {name} in {time.monotonic() - t0:.1f}s", flush=True)
        df = spark.read.parquet(path).persist()
        df.count()
        return df

    upper = cached("upper", lambda: A.upper_layer(corpus, LEVEL_MULT))
    n_up = upper.count()

    ug = cached(f"ug_m{a.m}", lambda: A.knn_graph(upper, planes_for(n_up), m=a.m))
    lg = cached(f"lg_m{a.m}", lambda: A.knn_graph(corpus, planes_for(n), m=a.m))
    for rd in range(1, a.refine + 1):
        ug = cached(f"ug_m{a.m}_r{rd}",
                    lambda: A.knn_graph_refine(ug, upper, m=a.m, expand=a.expand))
        lg = cached(f"lg_m{a.m}_r{rd}",
                    lambda: A.knn_graph_refine(lg, corpus, m=a.m, expand=a.expand))

    # ---- queries + truth (cached) ----
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
    # one warm brute leg for the speedup denominator (interleaved-median
    # protocol lives in two_level_ab.py; this is a recall sweep)
    t0 = time.monotonic()
    K.knn_join(corpus, queries, k=a.k).select("query_id", "vec_id").collect()
    brute_s = time.monotonic() - t0
    print(f"brute (warm) {brute_s:.1f}s", flush=True)

    out = {
        "corpus_rows": n, "dim": dim, "n_queries": nq, "k": a.k,
        "m": a.m, "level_mult": LEVEL_MULT, "expand": a.expand,
        "refine": a.refine, "brute_s": round(brute_s, 1), "graphs": [],
    }

    def dump():
        with open(a.out, "w") as f:
            json.dump(out, f, indent=1)

    q = queries.select(F.col("query_id").alias("qid"),
                       F.col("query_vec").alias("qv"))
    nodes = corpus.select(F.col("vec_id").alias("id"),
                          F.col("embedding").alias("nv"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))

    budget_idx = ([int(x) for x in a.budgets.split(",") if x != ""]
                  if a.budgets else range(len(BUDGETS)))

    def sweep(tag, ug_, lg_):
        hubs = A.graph_hub_entries(ug_, 64)
        entry = {"tag": tag, "points": []}
        out["graphs"].append(entry)
        for bi in budget_idx:
            beam_up, hops_up, n_descend, beam, hops = BUDGETS[bi]
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
            # persist the upper visited frame: seeds AND the count both
            # consume it, and without the pin the lower walk re-runs the
            # entire upper recurrence (the untimed rows-touched pass was
            # ~3x the timed walk — why the r9 wave-2 sweep crawled)
            v_up = A._beam_visited_batch(q, nodes, ug_, seed_up, beam_up,
                                         hops_up, "cosine", True).persist()
            n_up_visited = v_up.count()
            seeds = (v_up.withColumn("rn", F.row_number().over(w))
                     .filter(F.col("rn") <= n_descend).select("qid", "id"))
            v_lo = A._beam_visited_batch(q, nodes, lg_, seeds, beam, hops,
                                         "cosine", True)
            touched = (n_up_visited + v_lo.count()) / nq
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

    for m_rev in [int(x) for x in a.m_rev.split(",") if x != ""]:
        if m_rev <= 0:
            sweep(f"refined_x{a.refine}", ug, lg)
            continue
        tag = f"refined_x{a.refine}_sym{m_rev}"
        ug_s = cached(f"ug_m{a.m}_r{a.refine}_sym{m_rev}",
                      lambda: A.symmetrize_edges(ug, m_rev=m_rev))
        lg_s = cached(f"lg_m{a.m}_r{a.refine}_sym{m_rev}",
                      lambda: A.symmetrize_edges(lg, m_rev=m_rev))
        sweep(tag, ug_s, lg_s)
        ug_s.unpersist()
        lg_s.unpersist()

    dump()
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
