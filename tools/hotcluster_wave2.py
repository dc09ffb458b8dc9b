"""Adversarial-cluster rehearsal for the curation wave (VERDICT r6 #6):
``dedup_spans`` / ``docs_span_mask`` / ``dedup_semantic`` under a 10k-copy
pathological duplicate cluster, mirroring tools/hotcluster_rehearsal.py
(which covers minhash).

Span family (shared_span_pairs + span_mask_stats): the hot corpus is sf1
documents plus 10,000 VERBATIM copies of one document — every shingle of
that document's text lands in a posting of 10,001 docs, far over
``max_posting=50``. Contract under the cap (operators/dedup.py
shared_span_pairs docstring): dropped hot shingles cost span RECALL on the
hot cluster only, never false positives and never changed base-corpus
answers — postings keep the LOWEST ids, hot ids sit at 900M+, so every
base-base posting (and hence every base-base pair and every base doc's
mask except the seed's own) is bit-identical with the cluster present.

Semantic family (semantic_dedup): the hot corpus is sf1 embeddings plus
10,000 copies of ONE far-from-corpus synthetic unit vector — they all
assign to the same k-means cell (a maximally hot cell) and form one
cosine=1.0 duplicate group. Guards measured: the population-derived
per-cell salting (ann._salted_pack row_cap) keeps every aggregated GEMM
block bounded, and connected_components' contraction absorbs the ~50M-edge
clique. Checks: all 10k copies resolve to ONE cluster with ONE keeper;
base-row verdicts (cluster_id, keep) are IDENTICAL with and without the
hot cluster (the synthetic vector is >eps-far from every corpus row).

Budget: each hot run must stay within HOT_BUDGET x its plain-sf1 run.

Writes HOTCLUSTER_WAVE2.json at the repo root.

Usage: python tools/hotcluster_wave2.py [--sf1-dir /tmp/sf1]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
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

from educational_vector_database_spark.operators import dedup as D  # noqa: E402
from educational_vector_database_spark.session import get_spark, load_table  # noqa: E402

HOT_COPIES = 10_000
HOT_BASE_ID = 900_000_000
HOT_BUDGET = 3.0
N_CENTROIDS = 16
SEM_EPS = 0.85


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1-dir", default="/tmp/sf1")
    args = ap.parse_args()

    if not os.path.isdir(args.sf1_dir):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "gen_sfN.py"),
             "--out", args.sf1_dir],
            check=True,
        )

    spark = get_spark(app_name="evd-hotcluster-w2")
    report: dict = {"hot_copies": HOT_COPIES, "sf1_dir": args.sf1_dir}

    # ---------------- span family ----------------
    docs = load_table(spark, args.sf1_dir, "documents").select("doc_id", "text")
    seed_text = docs.orderBy("doc_id").select("text").head()[0]
    hot = spark.range(HOT_COPIES).select(
        (F.lit(HOT_BASE_ID) + F.col("id")).alias("doc_id"),
        F.lit(seed_text).alias("text"),
    )
    hot_docs = docs.unionByName(hot)

    t0 = time.perf_counter()
    plain_pairs = D.shared_span_pairs(docs).localCheckpoint()
    n_plain_pairs = plain_pairs.count()
    plain_mask = D.span_mask_stats(docs).localCheckpoint()
    plain_mask.count()
    t_span_plain = time.perf_counter() - t0
    spark.catalog.clearCache()

    t0 = time.perf_counter()
    hot_pairs = D.shared_span_pairs(hot_docs).localCheckpoint()
    n_hot_pairs = hot_pairs.count()
    hot_mask = D.span_mask_stats(hot_docs).localCheckpoint()
    hot_mask.count()
    t_span_hot = time.perf_counter() - t0
    spark.catalog.clearCache()

    # base-base pairs bit-identical (posting caps keep LOWEST ids; hot ids
    # never evict a base id): symmetric difference must be empty
    base_hot_pairs = hot_pairs.filter(
        (F.col("id_a") < HOT_BASE_ID) & (F.col("id_b") < HOT_BASE_ID)
    )
    n_diff = (
        base_hot_pairs.exceptAll(plain_pairs)
        .unionByName(plain_pairs.exceptAll(base_hot_pairs))
        .count()
    )
    assert n_diff == 0, f"hot cluster changed {n_diff} base-corpus span pairs"

    # base docs' masks identical too, except possibly the seed doc itself
    seed_id = docs.orderBy("doc_id").select("doc_id").head()[0]
    pm = plain_mask.filter(F.col("doc_id") != seed_id)
    hm = hot_mask.filter(
        (F.col("doc_id") < HOT_BASE_ID) & (F.col("doc_id") != seed_id)
    )
    n_mask_diff = (
        hm.exceptAll(pm).unionByName(pm.exceptAll(hm)).count()
    )
    assert n_mask_diff == 0, (
        f"hot cluster changed {n_mask_diff} base-doc span masks")

    # recall degrades gracefully, not to zero: SOME hot copies are caught
    # (the cap keeps the seed + the first ~max_posting-1 copies per posting)
    n_hot_masked = hot_mask.filter(
        (F.col("doc_id") >= HOT_BASE_ID) & (F.col("n_masked") > 0)
    ).count()
    assert n_hot_masked > 0, "cap degraded hot-cluster span recall to zero"

    span_ratio = t_span_hot / max(t_span_plain, 1e-9)
    report["span"] = {
        "plain_pairs": n_plain_pairs,
        "plain_sec": round(t_span_plain, 2),
        "hot_pairs": n_hot_pairs,
        "hot_sec": round(t_span_hot, 2),
        "base_pairs_identical": True,
        "base_masks_identical": True,
        "hot_copies_masked": n_hot_masked,
        "hot_over_plain_ratio": round(span_ratio, 2),
        "pass": span_ratio <= HOT_BUDGET,
    }
    assert report["span"]["pass"], (
        f"span hot run {t_span_hot:.1f}s vs plain {t_span_plain:.1f}s "
        f"exceeds {HOT_BUDGET}x")

    # ---------------- semantic family ----------------
    emb = load_table(spark, args.sf1_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    cents = [
        r.embedding
        for r in emb.orderBy("vec_id").limit(N_CENTROIDS).collect()
    ]
    dim = len(cents[0])
    # synthetic hot vector: alternating unit signs — dummy corpus vectors
    # are ~N(0,1)/sqrt(dim) per axis, so |cos| vs any corpus row stays well
    # under SEM_EPS while the 10k copies are cosine-1.0 to each other
    u = [1.0 / math.sqrt(dim) if i % 2 == 0 else -1.0 / math.sqrt(dim)
         for i in range(dim)]
    hot_vecs = spark.range(HOT_COPIES).select(
        (F.lit(HOT_BASE_ID) + F.col("id")).alias("vec_id"),
        F.array(*[F.lit(float(x)) for x in u])
        .cast("array<float>")
        .alias("embedding"),
    )
    hot_emb = emb.unionByName(hot_vecs)

    t0 = time.perf_counter()
    plain_sem = D.semantic_dedup(emb, cents, eps=SEM_EPS).localCheckpoint()
    plain_sem.count()
    t_sem_plain = time.perf_counter() - t0
    spark.catalog.clearCache()

    t0 = time.perf_counter()
    hot_sem = D.semantic_dedup(hot_emb, cents, eps=SEM_EPS).localCheckpoint()
    hot_sem.count()
    t_sem_hot = time.perf_counter() - t0
    spark.catalog.clearCache()

    # the 10k copies form ONE cluster with ONE keeper
    hot_rows = hot_sem.filter(F.col("vec_id") >= HOT_BASE_ID)
    n_hot_clusters = hot_rows.select("cluster_id").distinct().count()
    n_hot_keep = hot_rows.filter("keep").count()
    assert n_hot_clusters == 1, f"hot clique split into {n_hot_clusters}"
    assert n_hot_keep == 1, f"hot clique kept {n_hot_keep} members"

    # base-row verdicts bit-identical with the hot cluster present
    base_cols = ["vec_id", "centroid_id", "cluster_id", "keep"]
    hb = hot_sem.filter(F.col("vec_id") < HOT_BASE_ID).select(base_cols)
    pb = plain_sem.select(base_cols)
    n_sem_diff = hb.exceptAll(pb).unionByName(pb.exceptAll(hb)).count()
    assert n_sem_diff == 0, (
        f"hot cluster changed {n_sem_diff} base-row semantic verdicts")

    sem_ratio = t_sem_hot / max(t_sem_plain, 1e-9)
    report["semantic"] = {
        "plain_sec": round(t_sem_plain, 2),
        "hot_sec": round(t_sem_hot, 2),
        "hot_clusters": n_hot_clusters,
        "hot_keepers": n_hot_keep,
        "base_verdicts_identical": True,
        "hot_over_plain_ratio": round(sem_ratio, 2),
        "pass": sem_ratio <= HOT_BUDGET,
    }
    assert report["semantic"]["pass"], (
        f"semantic hot run {t_sem_hot:.1f}s vs plain {t_sem_plain:.1f}s "
        f"exceeds {HOT_BUDGET}x")

    report["budget"] = HOT_BUDGET
    report["pass"] = report["span"]["pass"] and report["semantic"]["pass"]
    with open(os.path.join(REPO, "HOTCLUSTER_WAVE2.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
