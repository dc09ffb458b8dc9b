"""Real-EMBEDDING recall operating point (VERDICT r10 #3): every recall
artifact so far used synthetic GMM/iid VECTORS; this tool runs the 2M-rung
interleaved protocol on embeddings of TEXT — sentence-transformers MiniLM
when installed, else the deterministic 384-dim feature-hashing embedder
(``HashingTFEmbeddings``, the engine's content-sensitive fallback) over a
generated topical corpus — and records where text lands between the
isotropic and Zipf-GMM regimes, plus whether ``corpus_clusterability``
routes it correctly.

Corpus: ``n`` documents, topic ~ the same Zipf(0.5)-skewed alias draw as
the GMM recipe (clusters scale with n: n/1000 topics); each document is
20-60 whitespace tokens, a stopword (shared 100-word vocabulary, Zipf
ranks) with prob --stop-p, else a content word Zipf-drawn from the topic's
150-word window into a global vocabulary (windows overlap across topics —
topical corpora share vocabulary). Deterministic per-partition numpy
streams, the gen_gaussian_corpus discipline.

Protocol: INTERLEAVED legs (brute, IVF multi-probe at the router's
nprobe and its neighbor), rotating order, one warm session, median of
--repeats; recall against exact brute truth computed once untimed; rows
touched per query from the cell census. Index sizing comes straight from
``recommend_index(n, clustered=<the probe's verdict>)`` — the tool prices
exactly what the auto router would serve.

Writes STRUCTURED_RECALL_REAL.json (or --out).
"""

from __future__ import annotations

import argparse
import json
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

from pyspark.sql import SparkSession, Window, functions as F  # noqa: E402

from educational_vector_database_spark.functions import vector as V  # noqa: E402
from educational_vector_database_spark.operators import ann as A  # noqa: E402
from educational_vector_database_spark.operators import knn as K  # noqa: E402


def gen_topical_texts(spark, path: str, n: int, n_topics: int,
                      stop_p: float = 0.3, vocab: int = 50_000,
                      seed: int = 11) -> None:
    """Deterministic topical text corpus: topic populations Zipf(0.5)-skewed
    (the GMM recipe's alias draw), documents 20-60 tokens mixing shared
    stopwords with topic-window content words."""
    import numpy as np
    import pandas as pd

    parts = 64
    per = n // parts
    w_t = 1.0 / np.sqrt(np.arange(1, n_topics + 1))
    w_t /= w_t.sum()
    # Zipf rank weights inside the 100-stopword and 150-content windows
    w_stop = 1.0 / np.arange(1, 101)
    w_stop /= w_stop.sum()
    w_word = 1.0 / np.arange(1, 151)
    w_word /= w_word.sum()

    def make(batches):
        for pdf in batches:
            for pid in pdf["pid"]:
                pid = int(pid)
                lo = pid * per
                hi = n if pid == parts - 1 else lo + per
                rng = np.random.default_rng(seed * 1_000_003 + pid)
                cnt = hi - lo
                topics = rng.choice(n_topics, size=cnt, p=w_t)
                lengths = rng.integers(20, 61, size=cnt)
                texts = []
                for t, length in zip(topics, lengths):
                    is_stop = rng.random(length) < stop_p
                    stops = rng.choice(100, size=length, p=w_stop)
                    words = (int(t) * 37
                             + rng.choice(150, size=length, p=w_word)
                             ) % vocab
                    toks = np.where(
                        is_stop,
                        np.char.add("s", stops.astype(str)),
                        np.char.add("w", words.astype(str)),
                    )
                    texts.append(" ".join(toks))
                yield pd.DataFrame({
                    "vec_id": np.arange(lo, hi, dtype=np.int64),
                    "topic_id": topics.astype(np.int32),
                    "text": texts,
                })

    pids = spark.range(parts).select(F.col("id").alias("pid")) \
        .repartition(parts, "pid")
    df = pids.mapInPandas(make, "vec_id bigint, topic_id int, text string")
    df.write.mode("overwrite").parquet(path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/real_2m")
    ap.add_argument("--cache", default="/tmp/real_exp")
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--topics", type=int, default=0,
                    help="0 -> n/1000 (the GMM runs' cluster density)")
    ap.add_argument("--stop-p", type=float, default=0.3)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--assigns", type=int, default=2)
    ap.add_argument("--build-waves", type=int, default=8)
    ap.add_argument("--n-queries", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STRUCTURED_RECALL_REAL.json"))
    a = ap.parse_args()

    topics = a.topics or max(2, a.n // 1000)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("structured_recall_real")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "44g")
        .config("spark.local.dir", "/tmp/spark_real_2m")
        .config("spark.cleaner.periodicGC.interval", "90s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import numpy as np

    # -- embedder: MiniLM when available, else the hashing fixture ----------
    try:
        from educational_vector_database_spark.embeddings import HFEmbeddings
        emb = HFEmbeddings()
        emb_name = emb.model_name
    except ImportError:
        from educational_vector_database_spark.embeddings import (
            HashingTFEmbeddings,
        )
        emb = HashingTFEmbeddings(dim=384)
        emb_name = "HashingTFEmbeddings(dim=384)"
    dim = emb.dim

    texts_path = os.path.join(a.dir, "texts.parquet")
    emb_path = os.path.join(a.dir, "embeddings.parquet")
    if not os.path.isdir(texts_path):
        t0 = time.monotonic()
        gen_topical_texts(spark, texts_path, a.n, topics, a.stop_p)
        print(f"generated texts {a.n} topics={topics} in "
              f"{time.monotonic() - t0:.1f}s", flush=True)
    if not os.path.isdir(emb_path):
        t0 = time.monotonic()
        (
            spark.read.parquet(texts_path)
            .select("vec_id", "topic_id", emb.embed_col("text").alias("embedding"))
            .write.mode("overwrite").parquet(emb_path)
        )
        print(f"embedded with {emb_name} in "
              f"{time.monotonic() - t0:.1f}s", flush=True)
    corpus = spark.read.parquet(emb_path).select("vec_id", "embedding").persist()
    n = corpus.count()

    # -- the router's verdict on REAL(-shaped) embeddings --------------------
    t0 = time.monotonic()
    stats = A.corpus_clusterability(corpus, n_rows=n)
    probe_s = round(time.monotonic() - t0, 1)
    rec = A.recommend_index(n, stats["clustered"])
    print(f"clusterability: {stats} -> {rec['index_type']} "
          f"{rec['params']} ({probe_s}s)", flush=True)
    n_cells = rec["params"].get("n_cells") or max(16, int(n ** 0.5))
    nprobe_rec = rec["params"].get("nprobe", 4)
    nprobes = sorted({nprobe_rec, nprobe_rec * 2})

    os.makedirs(a.cache, exist_ok=True)
    build_s: dict = {}

    def cached(name, builder):
        p = os.path.join(a.cache, name)
        if not os.path.isdir(p):
            t0 = time.monotonic()
            builder().write.mode("overwrite").parquet(p)
            build_s[name] = round(time.monotonic() - t0, 1)
            print(f"built {name} in {build_s[name]}s", flush=True)
        df = spark.read.parquet(p).persist()
        df.count()
        return df

    train = corpus.filter(
        F.pmod(F.xxhash64("vec_id", F.lit("real2m")), 10) < 1)
    cents = cached(f"cents_k{n_cells}",
                   lambda: A.train_ivf_centroids(train, n_cells))
    cells = cached(f"cells_k{n_cells}",
                   lambda: A.ivf_assign_gemm(corpus, cents))

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
    total_truth = sum(len(v) for v in truth.values())

    cent_rows = sorted(cents.collect(), key=lambda r: r.centroid_id)
    C = np.array([r.centroid for r in cent_rows], dtype=np.float64)
    q_rows = queries.collect()
    Q = np.array([r.query_vec for r in q_rows], dtype=np.float64)
    qids = [int(r.query_id) for r in q_rows]
    # probe ranking by euclidean distance — the IVFIndex probe order
    d2 = ((Q ** 2).sum(1)[:, None] - 2 * Q @ C.T + (C ** 2).sum(1)[None, :])
    probe_rank = np.argsort(d2, axis=1)
    score = V.similarity("cosine", V.as_double("v"), V.as_double("query_vec"))
    w_ivf = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("vec_id"))

    def leg_brute():
        return K.knn_join(corpus, queries, k=a.k).select(
            "query_id", "vec_id").collect()

    def make_leg_ivf(nprobe):
        plist = [(qids[i], [int(c) for c in probe_rank[i, :nprobe]])
                 for i in range(nq)]
        probes = spark.createDataFrame(
            plist, "query_id bigint, pcells array<int>"
        ).join(queries, "query_id") \
         .select("query_id", "query_vec", F.explode("pcells").alias("pcell"))

        def leg():
            return (
                cells.join(F.broadcast(probes),
                           cells.centroid_id == probes.pcell)
                .select("query_id", "vec_id", score.alias("score"))
                .withColumn("rn", F.row_number().over(w_ivf))
                .filter(F.col("rn") <= a.k)
                .select("query_id", "vec_id").collect()
            )
        return leg

    legs: dict = {"brute": leg_brute}
    for np_ in nprobes:
        legs[f"ivf_np{np_}"] = make_leg_ivf(np_)
    order = ["brute"] + [f"ivf_np{x}" for x in nprobes]

    times: dict[str, list[float]] = {name: [] for name in order}
    recalls: dict[str, float] = {}
    for rep in range(a.repeats):
        rot = order[rep % len(order):] + order[:rep % len(order)]
        for name in rot:
            t0 = time.monotonic()
            rows = legs[name]()
            dt = time.monotonic() - t0
            times[name].append(dt)
            if name not in recalls:
                got: dict = {}
                for r in rows:
                    got.setdefault(r.query_id, set()).add(r.vec_id)
                hits = sum(len(got.get(qid, set()) & want)
                           for qid, want in truth.items())
                recalls[name] = round(hits / total_truth, 3)
            print(f"  rep {rep} {name}: {dt:.1f}s "
                  f"(recall {recalls[name]})", flush=True)

    census = {int(r.centroid_id): int(r.c) for r in
              cells.groupBy("centroid_id").agg(F.count("*").alias("c"))
              .collect()}
    touched = {"brute": float(n)}
    for np_ in nprobes:
        touched[f"ivf_np{np_}"] = round(sum(
            census.get(int(c), 0)
            for i in range(nq) for c in probe_rank[i, :np_]) / nq, 1)

    med = {name: round(statistics.median(v), 1)
           for name, v in times.items()}
    out = {
        "protocol": "interleaved legs, rotating order, one warm session, "
                    f"median of {a.repeats}",
        "corpus": "topical-text", "corpus_rows": n, "dim": dim,
        "embedder": emb_name,
        "topics": topics, "stop_p": a.stop_p,
        "clusterability": stats, "probe_s": probe_s,
        "recommend_index": rec,
        "n_cells": n_cells,
        "n_queries": nq, "k": a.k, "build_s": build_s,
        "times_s": {name: [round(x, 1) for x in v]
                    for name, v in times.items()},
        "median_s": med,
        "recall_at_k": recalls,
        "speedup_vs_brute": {
            name: round(med["brute"] / med[name], 2)
            for name in order if name != "brute"},
        "rows_touched_per_query": touched,
        "scan_frac": {name: round(t / n, 4)
                      for name, t in touched.items()},
    }
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in (
        "clusterability", "median_s", "recall_at_k", "speedup_vs_brute",
        "rows_touched_per_query")}, indent=1), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
