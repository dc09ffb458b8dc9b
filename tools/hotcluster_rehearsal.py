"""Adversarial-cluster rehearsal: dedup resolution with ONE giant dup cluster.

VERDICT r4 item 4: `dedup_survivors`' sf1 ratio was the closest row to the
scale gate, and its workload grows with dup-cluster size² by construction.
This tool builds the pathological input directly — the sf1 documents table
plus 10,000 near-identical copies of one document — and measures the two
guards added in round 5:

- minhash over-cap buckets degrade to min-id STAR candidates (O(bucket)
  pairs), so the giant cluster yields ~10k candidate edges instead of
  either 50M all-pairs or (the old behavior) zero;
- connected_components contracts the edge list once it exceeds
  `contract_above`, so per-round join work tracks the shrinking contracted
  graph; pointer-jumping resolves the dropped interiors.

Checks (hard assertions, not just timings):
- every one of the 10k copies resolves to the same cluster representative;
- contraction ON and OFF produce IDENTICAL labels;
- end-to-end wall time with the hot cluster stays within HOT_BUDGET x the
  plain-sf1 run (the "no round superlinear" gate).

Writes HOTCLUSTER_REHEARSAL.json at the repo root.

Usage: python tools/hotcluster_rehearsal.py [--sf1-dir /tmp/sf1]
"""

from __future__ import annotations

import argparse
import json
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
HOT_BUDGET = 3.0  # hot run may cost at most this multiple of the plain run


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

    spark = get_spark(app_name="evd-hotcluster")
    docs = load_table(spark, args.sf1_dir, "documents")

    # 10k near-identical copies of one document: same body, a tiny numeric
    # suffix per copy (J stays ~1; every minhash band bucket holds the whole
    # cluster and therefore exceeds any sane posting cap)
    seed_text = docs.orderBy("doc_id").select("text").head()[0]
    hot = spark.range(HOT_COPIES).select(
        (F.lit(HOT_BASE_ID) + F.col("id")).alias("doc_id"),
        F.concat(F.lit(seed_text), F.lit(" copy "), F.col("id").cast("string")
                 ).alias("text"),
    )
    base_cols = docs.select("doc_id", "text")
    hot_docs = base_cols.unionByName(hot)

    report: dict = {"hot_copies": HOT_COPIES, "sf1_dir": args.sf1_dir}

    # plain sf1 baseline (same code path, no hot cluster)
    t0 = time.perf_counter()
    plain_pairs = D.minhash_near_dup(base_cols).localCheckpoint()
    n_plain_pairs = plain_pairs.count()
    plain_labels = D.dedup_clusters(base_cols, plain_pairs)
    n_plain_survivors = plain_labels.filter("is_survivor").count()
    t_plain = time.perf_counter() - t0
    spark.catalog.clearCache()
    report["plain"] = {
        "pairs": n_plain_pairs,
        "survivors": n_plain_survivors,
        "sec": round(t_plain, 2),
    }

    # hot run: pairs once, CC with contraction ON and OFF
    t0 = time.perf_counter()
    hot_pairs = D.minhash_near_dup(hot_docs).localCheckpoint()
    n_hot_pairs = hot_pairs.count()
    t_pairs = time.perf_counter() - t0
    spark.catalog.clearCache()

    t0 = time.perf_counter()
    cc_on = D.connected_components(
        hot_pairs, contract_above=50_000).localCheckpoint()
    cc_on.count()
    t_cc_on = time.perf_counter() - t0

    t0 = time.perf_counter()
    cc_off = D.connected_components(
        hot_pairs, contract_above=None).localCheckpoint()
    cc_off.count()
    t_cc_off = time.perf_counter() - t0

    # identical labels either way
    n_diff = (
        cc_on.alias("x")
        .join(cc_off.alias("y"), "id")
        .filter(F.col("x.cluster_id") != F.col("y.cluster_id"))
        .count()
    )
    assert n_diff == 0, f"contraction changed {n_diff} labels"

    # the whole hot cluster resolves to one representative
    hot_members = cc_on.filter(
        (F.col("id") >= HOT_BASE_ID)
        & (F.col("id") < HOT_BASE_ID + HOT_COPIES)
    )
    reps = [r[0] for r in
            hot_members.select("cluster_id").distinct().collect()]
    n_members = hot_members.count()
    assert n_members == HOT_COPIES, (
        f"only {n_members}/{HOT_COPIES} hot copies entered the graph")
    assert len(reps) == 1, f"hot cluster split into {len(reps)} components"

    t_hot = t_pairs + t_cc_on
    report["hot"] = {
        "pairs": n_hot_pairs,
        "pairs_sec": round(t_pairs, 2),
        "cc_contraction_sec": round(t_cc_on, 2),
        "cc_plain_sec": round(t_cc_off, 2),
        "total_sec": round(t_hot, 2),
        "hot_cluster_representative": reps[0],
        "labels_identical_on_off": True,
    }
    ratio = t_hot / max(t_plain, 1e-9)
    report["hot_over_plain_ratio"] = round(ratio, 2)
    report["budget"] = HOT_BUDGET
    report["pass"] = ratio <= HOT_BUDGET
    assert report["pass"], (
        f"hot run {t_hot:.1f}s vs plain {t_plain:.1f}s exceeds "
        f"{HOT_BUDGET}x budget")

    with open(os.path.join(REPO, "HOTCLUSTER_REHEARSAL.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
