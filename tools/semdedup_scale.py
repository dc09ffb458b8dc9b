"""SemDeDup at paper-scale cell counts through the join-assignment path
(VERDICT r7 next-round #5).

Round 7 closed the centroid-literal seam with ivf_assign_join (broadcast
argmin, one Exchange keyed on the id) and parity-tested it bit-identical to
the literal path — but only at K<=500. The SemDeDup paper's setup is 50k
clusters for LAION; this rehearsal validates the seam at real cell counts:

1. sf1 (/tmp/sf1, 20k x 64): train MLlib KMeans at --n-cells (default
   5000), run semantic_dedup over the assignment path picked by
   --paper-path (default gemm = ivf_assign_gemm, the blocked-matmul
   throughput path; join = ivf_assign_join, the bit-exact expression
   path — measured 2,230 s at this shape in round 8, which is WHY the
   GEMM path exists), record wall time + broadcast size + label census.
   The literal path CANNOT run here (5000 chained whens stop
   JIT-compiling) — that is the point of the seam.
2. Parity spot check at a K where the literal path still runs (default
   256, sf0.1): labels (centroid_id, cluster_id, keep) must be
   bit-identical literal-vs-join, and identical literal-vs-gemm on the
   continuous fixture (GEMM float op order differs; pytest covers both).

Writes SEMDEDUP_SCALE.json (or --out).
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

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from educational_vector_database_spark.operators import ann as A  # noqa: E402
from educational_vector_database_spark.operators import dedup as D  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1")
    ap.add_argument("--n-cells", type=int, default=5000)
    ap.add_argument("--parity-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--parity-cells", type=int, default=256)
    ap.add_argument("--eps", type=float, default=0.45)
    ap.add_argument("--kmeans-iters", type=int, default=5)
    ap.add_argument("--paper-path", choices=("gemm", "join"), default="gemm")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SEMDEDUP_SCALE.json"))
    a = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("semdedup_scale")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {}

    # --- phase 1: paper-scale cells via the chosen assignment path ----------------------
    e = spark.read.parquet(os.path.join(a.dir, "embeddings.parquet")) \
        .select("vec_id", "embedding").persist()
    n = e.count()
    print(f"corpus {a.dir}: n={n}, n_cells={a.n_cells}", flush=True)

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    t0 = time.monotonic()
    feat = e.select(array_to_vector(
        F.col("embedding").cast("array<double>")).alias("features"))
    model = KMeans(k=a.n_cells, seed=A.LSH_SEED,
                   maxIter=a.kmeans_iters).fit(feat)
    centers = model.clusterCenters()
    cents_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "centroid_id int, centroid array<double>",
    )
    train_s = time.monotonic() - t0
    # broadcast payload: K x dim doubles
    bcast_mb = len(centers) * len(centers[0]) * 8 / 1e6
    print(f"kmeans: {len(centers)} centers in {train_s:.1f}s "
          f"(broadcast ~{bcast_mb:.1f} MB)", flush=True)

    t0 = time.monotonic()
    assign_fn = A.ivf_assign_gemm if a.paper_path == "gemm" else A.ivf_assign_join
    assigned = assign_fn(e, cents_df, with_cosine=True)
    labels = D.semantic_dedup(e, [], eps=a.eps, assigned=assigned).persist()
    n_rows = labels.count()
    dedup_s = time.monotonic() - t0
    census = labels.agg(
        F.count("*").alias("rows"),
        F.countDistinct("cluster_id").alias("clusters"),
        F.sum(F.col("keep").cast("int")).alias("kept"),
        F.countDistinct("centroid_id").alias("cells_used"),
    ).collect()[0]
    print(f"semantic_dedup({a.paper_path} path): {n_rows} rows in {dedup_s:.1f}s; "
          f"kept={census.kept} clusters={census.clusters} "
          f"cells_used={census.cells_used}", flush=True)
    out["paper_scale"] = {
        "dir": a.dir, "rows": n, "n_cells": a.n_cells,
        "assignment_path": a.paper_path,
        "join_path_reference_s": 2230.1,  # round-8 measured, same shape
        "kmeans_iters": a.kmeans_iters, "train_s": round(train_s, 1),
        "broadcast_mb": round(bcast_mb, 1),
        "dedup_s": round(dedup_s, 1),
        "kept": int(census.kept), "clusters": int(census.clusters),
        "cells_used": int(census.cells_used),
    }
    labels.unpersist(); e.unpersist()

    # --- phase 2: parity spot check at a literal-feasible K ----------------
    e2 = spark.read.parquet(
        os.path.join(a.parity_dir, "embeddings.parquet")) \
        .select("vec_id", "embedding").persist()
    n2 = e2.count()
    feat2 = e2.select(array_to_vector(
        F.col("embedding").cast("array<double>")).alias("features"))
    model2 = KMeans(k=a.parity_cells, seed=A.LSH_SEED,
                    maxIter=a.kmeans_iters).fit(feat2)
    cents2 = [[float(x) for x in c] for c in model2.clusterCenters()]
    cents2_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents2)],
        "centroid_id int, centroid array<double>",
    )
    t0 = time.monotonic()
    lit = {
        int(r.vec_id): (int(r.centroid_id), int(r.cluster_id), bool(r.keep))
        for r in D.semantic_dedup(e2, cents2, eps=a.eps).collect()
    }
    lit_s = time.monotonic() - t0
    t0 = time.monotonic()
    joined = {
        int(r.vec_id): (int(r.centroid_id), int(r.cluster_id), bool(r.keep))
        for r in D.semantic_dedup(
            e2, [], eps=a.eps,
            assigned=A.ivf_assign_join(e2, cents2_df, with_cosine=True),
        ).collect()
    }
    join_s = time.monotonic() - t0
    identical = joined == lit
    print(f"parity at K={a.parity_cells}, n={n2}: identical={identical} "
          f"(literal {lit_s:.1f}s, join {join_s:.1f}s)", flush=True)
    out["parity"] = {
        "dir": a.parity_dir, "rows": n2, "n_cells": a.parity_cells,
        "labels_identical": identical,
        "literal_s": round(lit_s, 1), "join_s": round(join_s, 1),
    }
    e2.unpersist()

    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")), flush=True)
    spark.stop()
    return 0 if identical else 1


if __name__ == "__main__":
    raise SystemExit(main())
