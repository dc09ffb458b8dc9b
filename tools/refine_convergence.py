"""NN-descent convergence experiment at 2M x 64 (round-9, VERDICT r8
next-round #1 — third lever, after walk budgets and symmetrization).

The capture diagnostic on the cached 2M graph showed the real limiter:
DIRECT EDGE CAPTURE of true top-10 neighbors is 2.9% after LSH build +
one NN-descent round (2-hop: 5%). The walk's 0.53-0.77 recall was coming
from exhaustively scoring its visited set, not from graph structure —
which is why beam/hops/sym/refine-x1 all moved nothing. The math agrees:
a ~0.6-cosine true-neighbor pair collides under one 13-hyperplane sign-LSH
set with p ~ (1 - theta/pi)^13 ~ 1%, ~4% across R=4 sets, and planes grow
with n, so capture DECAYS with scale. Dong et al. (WWW 2011) run NN-descent
to CONVERGENCE (4-7 rounds on 64-d data), each round compounding the
neighbors-of-neighbors exploration; we had run exactly one.

This measures, per refine round r=1..R over the cached 2M graph:
  - direct edge capture of the 128 gated queries' true top-10,
  - walk recall@10 + wall at the standard budgets,
reusing the sym-sweep parquet cache so rounds persist across runs.

Writes REFINE_CONVERGENCE.json incrementally.
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

BUDGETS = [
    (64, 5, 32, 128, 8),
    (128, 5, 64, 256, 10),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/ab_big")
    ap.add_argument("--cache", default="/tmp/sym_exp")
    ap.add_argument("--n-queries", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--expand", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--walk-from", type=int, default=3,
                    help="first round to also measure walk recall at")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "REFINE_CONVERGENCE.json"))
    a = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("refine_convergence")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "44g")
        .config("spark.local.dir", "/tmp/spark_refine_conv")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.read.parquet(os.path.join(a.dir, "embeddings.parquet")) \
        .select("vec_id", "embedding").persist()
    n = corpus.count()
    dim = len(corpus.head().embedding)

    def planes_for(rows):
        np_ = max(3, math.ceil(math.log2(max(2.0, rows / 400))))
        return [A.hyperplanes(dim, np_, seed=A.LSH_SEED + r) for r in range(4)]

    os.makedirs(a.cache, exist_ok=True)

    def cached(name, builder):
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
    # non-self pairs for the capture metric
    t_pairs = truth_df.filter(F.col("query_id") != F.col("vec_id")).persist()
    n_pairs = t_pairs.count()

    out = {"corpus_rows": n, "dim": dim, "n_queries": nq, "k": a.k,
           "m": a.m, "expand": a.expand, "level_mult": LEVEL_MULT,
           "rounds": []}
    if os.path.exists(a.out):
        try:
            prev = json.load(open(a.out))
            if prev.get("m") == a.m and prev.get("expand") == a.expand:
                out = prev
        except Exception:
            pass
    done_rounds = {r["round"] for r in out["rounds"]}

    def dump():
        with open(a.out, "w") as f:
            json.dump(out, f, indent=1)

    def capture(g):
        cap = t_pairs.join(
            g, (t_pairs.query_id == g.src) & (t_pairs.vec_id == g.dst),
            "left_semi").count()
        return cap / n_pairs

    def walk_points(ug_, lg_):
        hubs = A.graph_hub_entries(ug_, 64)
        pts = []
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
            pts.append({
                "beam_up": beam_up, "hops_up": hops_up,
                "n_descend": n_descend, "beam": beam, "hops": hops,
                "walk_s": round(walk_s, 1),
                "recall_at_k": round(
                    hits / sum(len(w) for w in truth.values()), 3),
            })
            print(f"  walk {pts[-1]}", flush=True)
        return pts

    ug = cached(f"ug_m{a.m}", lambda: A.knn_graph(upper, planes_for(n_up),
                                                  m=a.m))
    lg = cached(f"lg_m{a.m}", lambda: A.knn_graph(corpus, planes_for(n),
                                                  m=a.m))
    if 0 not in done_rounds:
        out["rounds"].append({"round": 0, "edge_capture": round(capture(lg), 4)})
        print(f"round 0: {out['rounds'][-1]}", flush=True)
        dump()
    for rd in range(1, a.rounds + 1):
        prev_ug, prev_lg = ug, lg
        ug = cached(f"ug_m{a.m}_r{rd}",
                    lambda: A.knn_graph_refine(prev_ug, upper, m=a.m,
                                               expand=a.expand))
        lg = cached(f"lg_m{a.m}_r{rd}",
                    lambda: A.knn_graph_refine(prev_lg, corpus, m=a.m,
                                               expand=a.expand))
        prev_ug.unpersist()
        prev_lg.unpersist()
        if rd in done_rounds:
            continue
        entry = {"round": rd, "edge_capture": round(capture(lg), 4)}
        if rd >= a.walk_from:
            entry["walks"] = walk_points(ug, lg)
        out["rounds"].append(entry)
        print(f"round {rd}: {json.dumps(entry)}", flush=True)
        dump()

    dump()
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
