"""Controlled two-level-vs-flat-vs-brute serving A/B (VERDICT r7 #1).

The round-7 sf10 measurement left the hierarchy's latency claim resting on
"host contention exceeds the effect size" (the brute leg ranged 15.7-118 s
across runs). This tool settles it with the protocol that killed the
round-5 contention ghosts:

- ONE SparkSession, all legs warm (graphs persisted, corpus persisted);
- the three legs run INTERLEAVED with the order ROTATING each repeat, so a
  host-contention window inflates every leg equally instead of whichever
  leg it lands on;
- median of ``--repeats`` (default 5) per leg;
- recall for both walk legs against the brute ground truth (computed once,
  untimed);
- rows-touched-per-query measured (untimed ``visited`` counts through the
  same recurrence) — the SCALE claim: brute touches n rows/query by
  construction, the walks touch O(beam*m*hops) regardless of n.

Legs:
  brute      K.knn_join (broadcast-NLJ + per-query window top-k)
  two_level  A.graph_two_level_search_batch over (upper, lower) graphs
  flat       A.graph_beam_search_batch over the SAME lower graph (equal
             edge budget — the lower graph IS a flat m=m_lower graph) with
             the law-degree walk params

Optionally (--big-n N) generates/reuses a deterministic N-row x dim
Gaussian corpus at --big-dir and repeats the whole A/B there — the scale
where brute's n-rows-per-query cost should dominate the walks' fixed
per-hop overhead, if the hierarchy's latency story is real.

Writes TWO_LEVEL_AB.json (or --out).
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

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from educational_vector_database_spark.operators import ann as A  # noqa: E402
from educational_vector_database_spark.operators import knn as K  # noqa: E402

LEVEL_MULT = 16


def plane_sets_for(rows: int, dim: int) -> list:
    n_planes = max(3, math.ceil(math.log2(max(2.0, rows / 400))))
    return [A.hyperplanes(dim, n_planes, seed=A.LSH_SEED + r)
            for r in range(4)]


def gen_gaussian_corpus(spark, path: str, n: int, dim: int) -> None:
    """Deterministic n x dim Gaussian corpus via a seeded per-partition
    numpy stream (seed = partition index) — reproducible at any parallelism
    because rows are assigned to partitions by id range."""
    import numpy as np
    import pandas as pd

    parts = 64

    def make(batches):
        for pdf in batches:
            for pid in pdf["pid"]:
                pid = int(pid)
                lo = pid * n // parts
                hi = (pid + 1) * n // parts
                rng = np.random.RandomState(100_000 + pid)
                vecs = rng.randn(hi - lo, dim)
                yield pd.DataFrame({
                    "vec_id": np.arange(lo, hi, dtype=np.int64),
                    "embedding": [[float(x) for x in row] for row in vecs],
                })

    spark.range(parts).select(F.col("id").alias("pid")) \
        .repartition(parts, "pid") \
        .mapInPandas(make, "vec_id long, embedding array<double>") \
        .write.mode("overwrite").parquet(path)


def run_ab(spark, corpus_path: str, n_queries: int, repeats: int, k: int,
           m_lower: int, m_upper: int, beam_up: int, hops_up: int,
           n_descend: int, beam: int, hops: int,
           flat_beam: int, flat_hops: int,
           build_waves: int = 0, waves_dir: str = "") -> dict:
    corpus = (
        spark.read.parquet(corpus_path)
        .select("vec_id", "embedding").persist()
    )
    n = corpus.count()
    dim = len(corpus.head().embedding)
    print(f"== corpus {corpus_path}: n={n} dim={dim}", flush=True)

    t0 = time.monotonic()
    upper = A.upper_layer(corpus, LEVEL_MULT).persist()
    n_up = upper.count()
    ug = A.knn_graph(upper, plane_sets_for(n_up, dim), m=m_upper).persist()
    n_up_edges = ug.count()
    # the LOWER build is the spill wall at 10M+ (BASELINE round-9 notes:
    # ~63 GB in-flight shuffle at 20M) — route it through the round-10
    # waved build when asked; identical edges, bounded in-flight shuffle
    lw = dict(n_waves=build_waves,
              work_dir=os.path.join(waves_dir, "lower_waves"),
              score_tier="gemm",
              # the final merge is its own disk wall at 10M+ (93 of 94 GB
              # measured): bucket it to the same in-flight bound as the waves
              merge_buckets=build_waves) \
        if build_waves > 1 else {}
    lg = A.knn_graph(corpus, plane_sets_for(n, dim), m=m_lower,
                     **lw).persist()
    n_lo_edges = lg.count()
    build_s = time.monotonic() - t0
    print(f"built upper({n_up} nodes/{n_up_edges} edges) + "
          f"lower({n_lo_edges} edges) in {build_s:.1f}s", flush=True)

    hubs_up = A.graph_hub_entries(ug, 64)
    hubs_lo = A.graph_hub_entries(lg, 64)

    step = max(1, n // n_queries)
    queries = corpus.filter(F.col("vec_id") % step == 0).limit(n_queries) \
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec")).persist()
    nq = queries.count()

    # ground truth, untimed
    truth_rows = K.knn_join(corpus, queries, k=k).select(
        "query_id", "vec_id").collect()
    truth: dict = {}
    for r in truth_rows:
        truth.setdefault(r.query_id, set()).add(r.vec_id)

    def leg_brute() -> list:
        return K.knn_join(corpus, queries, k=k).select(
            "query_id", "vec_id").collect()

    def leg_two_level() -> list:
        return A.graph_two_level_search_batch(
            ug, lg, corpus, queries, hubs_up,
            beam_up=beam_up, hops_up=hops_up, n_descend=n_descend,
            beam=beam, hops=hops, k=k,
        ).collect()

    def leg_flat() -> list:
        return A.graph_beam_search_batch(
            lg, corpus, queries, hubs_lo,
            beam=flat_beam, hops=flat_hops, k=k,
        ).collect()

    legs = {"brute": leg_brute, "two_level": leg_two_level, "flat": leg_flat}
    order = ["brute", "two_level", "flat"]
    times: dict[str, list[float]] = {name: [] for name in order}
    recalls: dict[str, float] = {}
    for rep in range(repeats):
        rotated = order[rep % 3:] + order[:rep % 3]
        for name in rotated:
            t0 = time.monotonic()
            rows = legs[name]()
            dt = time.monotonic() - t0
            times[name].append(dt)
            if name not in recalls:
                got: dict = {}
                for r in rows:
                    got.setdefault(r.query_id, set()).add(r.vec_id)
                hits = sum(len(got.get(q, set()) & w) for q, w in truth.items())
                recalls[name] = hits / sum(len(w) for w in truth.values())
            print(f"  rep {rep} {name}: {dt:.1f}s", flush=True)

    # rows-touched per query, untimed: run the walk recurrences once more
    # and COUNT the visited frames — the scale claim (brute touches n
    # rows/query by construction).
    q = queries.select(F.col("query_id").alias("qid"),
                       F.col("query_vec").alias("qv"))
    nodes = corpus.select(F.col("vec_id").alias("id"),
                          F.col("embedding").alias("nv"))
    seed_up = q.select("qid").crossJoin(
        nodes.select("id").filter(F.col("id").isin(hubs_up)))
    v_up = A._beam_visited_batch(q, nodes, ug, seed_up, beam_up, hops_up,
                                 "cosine", True)
    from pyspark.sql import Window
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    seeds = (v_up.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") <= n_descend).select("qid", "id"))
    v_lo = A._beam_visited_batch(q, nodes, lg, seeds, beam, hops,
                                 "cosine", True)
    touched_up = v_up.count()
    touched_lo = v_lo.count()
    seed_flat = q.select("qid").crossJoin(
        nodes.select("id").filter(F.col("id").isin(hubs_lo)))
    v_flat = A._beam_visited_batch(q, nodes, lg, seed_flat, flat_beam,
                                   flat_hops, "cosine", True)
    touched_flat = v_flat.count()

    med = {name: round(statistics.median(v), 1) for name, v in times.items()}
    out = {
        "corpus_rows": n, "dim": dim, "n_queries": nq, "k": k,
        "repeats": repeats,
        "build_s": round(build_s, 1),
        "edges": {"upper": n_up_edges, "lower": n_lo_edges},
        "params": {
            "m_lower": m_lower, "m_upper": m_upper, "level_mult": LEVEL_MULT,
            "beam_up": beam_up, "hops_up": hops_up, "n_descend": n_descend,
            "beam": beam, "hops": hops,
            "flat_beam": flat_beam, "flat_hops": flat_hops,
        },
        "times_s": {name: [round(x, 1) for x in v]
                    for name, v in times.items()},
        "median_s": med,
        "recall_at_k": {name: round(r, 3) for name, r in recalls.items()},
        "speedup_vs_brute": {
            "two_level": round(med["brute"] / med["two_level"], 2),
            "flat": round(med["brute"] / med["flat"], 2),
        },
        "rows_touched_per_query": {
            "brute": n,
            "two_level": round((touched_up + touched_lo) / nq, 1),
            "flat": round(touched_flat / nq, 1),
        },
    }
    corpus.unpersist(); upper.unpersist(); ug.unpersist(); lg.unpersist()
    queries.unpersist()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf10")
    ap.add_argument("--n-queries", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--m-lower", type=int, default=32)
    ap.add_argument("--m-upper", type=int, default=32)
    ap.add_argument("--beam-up", type=int, default=64)
    ap.add_argument("--hops-up", type=int, default=4)
    ap.add_argument("--n-descend", type=int, default=32)
    ap.add_argument("--beam", type=int, default=128)
    ap.add_argument("--hops", type=int, default=8)
    ap.add_argument("--flat-beam", type=int, default=128)
    ap.add_argument("--flat-hops", type=int, default=9)
    ap.add_argument("--big-n", type=int, default=0,
                    help="also run at a generated corpus of this many rows")
    ap.add_argument("--big-dir", default="/tmp/ab_big")
    ap.add_argument("--big-queries", type=int, default=32)
    ap.add_argument("--big-repeats", type=int, default=3)
    ap.add_argument("--build-waves", type=int, default=0,
                    help=">1: route the lower-graph build through the "
                         "round-10 waved builder (bounded in-flight "
                         "shuffle — the 10M/20M single-box enabler)")
    ap.add_argument("--skip-base", action="store_true")
    ap.add_argument("--driver-mem", default="64g",
                    help="Spark driver heap; raise for >=20M-row corpora "
                         "so persisted edge frames spill less")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TWO_LEVEL_AB.json"))
    a = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("two_level_ab")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", a.driver_mem)
        # reclaim shuffle dirs from completed jobs promptly — big-corpus
        # graph builds spill tens of GB and a large, idle driver heap
        # otherwise never GCs the shuffle deps that pin those files
        .config("spark.cleaner.periodicGC.interval", "90s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"protocol": "interleaved legs, rotating order, one warm "
                             "session, median of repeats"}
    if not a.skip_base:
        out["base"] = run_ab(
            spark, os.path.join(a.dir, "embeddings.parquet"),
            a.n_queries, a.repeats, a.k, a.m_lower, a.m_upper,
            a.beam_up, a.hops_up, a.n_descend, a.beam, a.hops,
            a.flat_beam, a.flat_hops)
        with open(a.out, "w") as f:
            json.dump(out, f, indent=1)

    if a.big_n > 0:
        big_path = os.path.join(a.big_dir, "embeddings.parquet")
        if not os.path.isdir(big_path):
            t0 = time.monotonic()
            gen_gaussian_corpus(spark, big_path, a.big_n, 64)
            print(f"generated {a.big_n} x 64 in "
                  f"{time.monotonic() - t0:.0f}s", flush=True)
        # law-degree flat params for the big corpus: m doubles per 10x
        out["big"] = run_ab(
            spark, big_path, a.big_queries, a.big_repeats, a.k,
            a.m_lower, a.m_upper, a.beam_up, a.hops_up + 1, a.n_descend,
            a.beam, a.hops, a.flat_beam, a.flat_hops + 2,
            build_waves=a.build_waves, waves_dir=a.big_dir)

    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
