"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The per-query numbers anchor BASELINE.md (the reference publishes no
benchmark figures — see BASELINE.md). Each query is executed exactly the way
the driver does: build the DataFrame via __spark_entry__.queries()[name] and
fully materialize it with a count-style action.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

import __spark_entry__ as entrymod  # noqa: E402
from educational_vector_database_spark.session import get_spark  # noqa: E402

# Headline set: the load-bearing operators, one per family (exact kNN, batch
# kNN join, ANN bucket search, document pipeline, dedup, relational agg/join,
# window/sessionize, text analysis).
HEADLINE = [
    "knn_cosine",
    "knn_join_topk",
    "knn_lsh_bucket",
    "knn_ivf",
    "search_text_topk",
    "chunk_documents",
    "embed_dummy",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_ngram",
    "neardup_embedding",
    "doc_fingerprint",
    "tpch_q1_pricing",
    "orders_by_nation",
    "top_customers_per_nation",
    "events_hourly",
    "events_sessionize",
    "events_tumbling",
    "doc_quality",
    "lang_id_eval",
    "label_centroids",
    # round 2 additions: the declared 100 TB dedup path, persistence parity,
    # and the as-of join (events read fix made it portable)
    "neardup_embedding_bucketed",
    "store_roundtrip",
    "events_asof",
    "docs_sample_stratified",
    # round 2, second wave: dedup resolution, sketch, pushdown showcase
    "dedup_survivors",
    "docs_kmv_distinct",
    "lineitem_q6_forecast",
    "tpch_q9_profit",
    # round 2, third wave: window/join/set/percentile breadth + evals
    "events_sliding",
    "events_cube",
    "events_funnel",
    "events_latest_per_user",
    "events_value_tiers",
    "customers_without_orders",
    "tpch_q3_shipping",
    "docs_length_deciles",
    "docs_length_quantiles",
    "docs_source_overlap",
    "docs_tfidf_keywords",
    "knn_ivf_recall",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir
    spark = get_spark(app_name="evd-bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]

    # Warm the JVM + parquet footers once so timings measure the query, not
    # session startup (the driver compares steady-state throughput).
    qs["knn_cosine"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        # Operators that persist() internally (minhash signature cache) can't
        # unpersist their own lazy result; drop leftover blocks here so one
        # query's cache residue doesn't distort the next query's timing.
        spark.catalog.clearCache()
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
