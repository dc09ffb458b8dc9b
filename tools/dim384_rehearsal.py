"""Real-embedding-dimension rehearsal (VERDICT r6 #7): every family is
tuned/tested at dim=64, but the reference's production model is 384-dim
MiniLM (reference src/vectordb/embeddings.py:37). This tool runs the
dim-sensitive families — PQ (n_sub=8 divides 384 into 48-wide subspaces),
BQ (384 bits = 6 int64 words), graph (384-dim hyperplanes + block GEMM),
IVF (384-dim centroid literals) — on a seeded 20k x 384 corpus and
validates the dim-dependent constants:

- ``ann.estimate_corpus_rows``'s bytes-per-row model (6 B/element) against
  the ACTUAL parquet bytes of an incompressible 384-dim float corpus
  (the estimator drives the self-scaling block salts; a bad constant
  means wrong block counts at exactly the dim production uses);
- ADC table shape (n_sub x k_codes distances, independent of dim) and the
  PQ shortlist->exact-rerank self-hit at 48-wide subvectors;
- BQ word packing at 6 words and Hamming self-hit;
- graph build under DERIVED plane/block params (graph_params_for) with
  the per-block row cap live at 384-dim GEMM batch widths
  (4096 rows x 384 dims x 8 B = ~12.6 MB per block side), plus a beam
  walk self-hit;
- IVF train/assign at 384-dim centroid literals with a probe self-hit.

The corpus is expression-generated (xxhash64 per (row, axis), uniform in
[-0.5, 0.5)) — fully deterministic, no RNG state, engine-independent.

Writes DIM384_REHEARSAL.json at the repo root. All checks are hard
assertions; timings are informational (this is a shape/constants gate,
not a benchmark).

Usage: python tools/dim384_rehearsal.py [--rows 20000] [--dim 384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

_LOG4J = os.path.join(REPO, "tools", "log4j2-quiet.properties")
if os.path.exists(_LOG4J):
    opt = f"-Dlog4j2.configurationFile=file:{_LOG4J}"
    os.environ["SPARK_SUBMIT_OPTS"] = (
        os.environ.get("SPARK_SUBMIT_OPTS", "") + " " + opt
    ).strip()

from pyspark.sql import functions as F  # noqa: E402

from educational_vector_database_spark.operators import ann as A  # noqa: E402
from educational_vector_database_spark.operators import bq as B  # noqa: E402
from educational_vector_database_spark.operators import knn as K  # noqa: E402
from educational_vector_database_spark.operators import pq as P  # noqa: E402
from educational_vector_database_spark.session import get_spark  # noqa: E402

QUERY_ID = 7


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--out-dir", default="/tmp/evdb_dim384")
    args = ap.parse_args()
    rows, dim = args.rows, args.dim

    spark = get_spark(app_name="evd-dim384")
    path = os.path.join(args.out_dir, "embeddings.parquet")
    if not os.path.isdir(path):
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id"), j), F.lit(1_000_000))
                / F.lit(1_000_000.0)
                - F.lit(0.5)
            ).cast("float"),
        )
        spark.range(rows).select(
            F.col("id").alias("vec_id"), vec.alias("embedding")
        ).repartition(16).write.mode("overwrite").parquet(path)
    e = spark.read.parquet(path).select("vec_id", "embedding")
    report: dict = {"rows": rows, "dim": dim}

    # ---- estimator constant vs real 384-dim parquet bytes ----
    est = A.estimate_corpus_rows(e, dim=dim)
    total_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    true_bpr = total_bytes / rows
    model_bpr = max(64, 6 * dim)
    report["estimator"] = {
        "estimated_rows": est,
        "true_bytes_per_row": round(true_bpr, 1),
        "model_bytes_per_row": model_bpr,
        "rows_ratio": round(est / rows, 3),
    }
    # within 3x either way: the salt derivation tolerates that (an
    # underestimate only makes blocks LARGER, and the per-group cap in
    # _salted_pack bounds them regardless)
    assert 1 / 3 <= est / rows <= 3, (
        f"bytes-per-row model off at dim={dim}: est {est} vs true {rows}")

    qv = [float(x) for x in
          e.filter(F.col("vec_id") == QUERY_ID).head()[1]]

    # ---- PQ: n_sub=8 -> 48-wide subspaces; ADC shape; rerank self-hit ----
    t0 = time.perf_counter()
    sample = e.filter(F.col("vec_id") % 10 == 0)
    cbs = P.train_pq_codebooks(sample, n_sub=8, k_codes=16)
    assert len(cbs) == 8 and all(len(cb[0]) == dim // 8 for cb in cbs)
    dt = P.adc_table(qv, cbs)
    assert len(dt) == 8 and all(len(row) == 16 for row in dt)
    codes = e.select(
        "vec_id", P.pq_encode_expr("embedding", cbs).alias("pq_code")
    ).persist()
    codes.count()
    top = P.knn_pq_rerank(e, qv, cbs, k=10, shortlist=50, codes=codes).collect()
    assert top[0].vec_id == QUERY_ID, f"PQ rerank top-1 {top[0].vec_id}"
    report["pq"] = {
        "n_sub": 8, "sub_dim": dim // 8, "adc_shape": [len(dt), len(dt[0])],
        "self_hit": True, "sec": round(time.perf_counter() - t0, 2),
    }
    codes.unpersist()

    # ---- BQ: 384 bits = 6 words; Hamming self-hit ----
    t0 = time.perf_counter()
    words = B.n_words(dim)
    if dim == 384:
        assert words == 6, f"384 bits must pack to 6 words, got {words}"
    bcodes = B.bq_encode(e, dim).persist()
    bcodes.count()
    btop = B.knn_hamming(e, qv, k=10, codes=bcodes).collect()
    assert btop[0].vec_id == QUERY_ID, f"BQ top-1 {btop[0].vec_id}"
    report["bq"] = {
        "words": words, "self_hit": True,
        "sec": round(time.perf_counter() - t0, 2),
    }
    bcodes.unpersist()

    # ---- graph: derived params at 384-dim GEMM widths; walk self-hit ----
    t0 = time.perf_counter()
    params = A.graph_params_for(rows)
    planes = [
        A.hyperplanes(dim, n_planes=params["n_planes"], seed=A.LSH_SEED + r)
        for r in range(params["n_plane_sets"])
    ]
    g = A.knn_graph(
        e, planes, m=params["m"],
        blocks_per_bucket=params["blocks_per_bucket"],
        row_cap=params["row_cap"],
    ).persist()
    n_edges = g.count()
    hubs = A.graph_hub_entries(g, 4)
    walk = A.graph_beam_search(
        g, e, qv, hubs, beam=params["beam"], hops=params["hops"], k=10
    ).collect()
    assert walk[0].vec_id == QUERY_ID, f"graph walk top-1 {walk[0].vec_id}"
    report["graph"] = {
        "params": {k: v for k, v in params.items()},
        "edges": n_edges,
        "block_bytes_per_side": params["row_cap"] * dim * 8,
        "self_hit": True,
        "sec": round(time.perf_counter() - t0, 2),
    }
    g.unpersist()

    # ---- IVF: 384-dim centroid literals; probe self-hit ----
    t0 = time.perf_counter()
    cents_df = A.train_ivf_centroids(e, n_cells=32)
    assigned = A.ivf_assign(e, cents_df).persist()
    assigned.count()
    qcell = A.ivf_assign(
        spark.createDataFrame(
            [(QUERY_ID, qv)], "vec_id long, embedding array<double>"
        ),
        cents_df,
    ).head().centroid_id
    probe = K.knn(
        assigned.filter(F.col("centroid_id") == qcell), qv, k=10
    ).collect()
    assert probe[0].vec_id == QUERY_ID, f"IVF probe top-1 {probe[0].vec_id}"
    report["ivf"] = {
        "n_cells": 32, "self_hit": True,
        "sec": round(time.perf_counter() - t0, 2),
    }
    assigned.unpersist()

    report["pass"] = True
    with open(os.path.join(REPO, "DIM384_REHEARSAL.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
