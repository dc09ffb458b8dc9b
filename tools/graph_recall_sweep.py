"""Round-6 graph-ANN tuning harness: verify the multi-plane-set knn_graph
against a numpy reference of its declared semantics, then sweep R (number of
independent plane sets) x entry strategy and print the recall-vs-cost curve
that goes into BASELINE.md. Run: python tools/graph_recall_sweep.py [sf_dir]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from educational_vector_database_spark.operators import ann as A
from educational_vector_database_spark.operators import knn as K

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
M = 4
BEAM = 8
HOPS = 2
K_TOP = 10


def np_reference_graph(ids, mat, plane_sets, m):
    """Brute-force replica of knn_graph's declared semantics."""
    unit = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
    edges = {}
    for ps in plane_sets:
        H = np.array(ps, dtype=np.float64)
        bits = (mat @ H.T > 0).astype(np.int64)
        bkt = (bits << np.arange(len(ps))).sum(axis=1)
        for b in np.unique(bkt):
            members = np.nonzero(bkt == b)[0]
            edges.setdefault(b.item(), None)
            for i in members:
                for j in members:
                    if i != j:
                        edges[(ids[i], ids[j])] = float(unit[i] @ unit[j])
    out = {}
    per_src = {}
    for key, sc in edges.items():
        if not isinstance(key, tuple):
            continue
        per_src.setdefault(key[0], []).append((-sc, key[1]))
    for s, lst in per_src.items():
        lst.sort()
        out[s] = [(d, -negs) for negs, d in lst[:m]]
    return out


def main():
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([[float(x) for x in r.embedding] for r in rows])
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    dim = mat.shape[1]
    n = len(ids)
    print(f"corpus n={n} dim={dim}")

    # --- correctness: R=2 multi-set graph vs numpy reference -----------------
    plane_sets = [A.hyperplanes(dim, 4, seed=A.LSH_SEED + r) for r in range(2)]
    g = A.knn_graph(e, plane_sets, m=M, blocks_per_bucket=2)
    got = {}
    for r in g.collect():
        got.setdefault(r.src, []).append((r.dst, r.score))
    for s in got:
        got[s].sort(key=lambda t: (-t[1], t[0]))
    ref = np_reference_graph(ids, mat, plane_sets, M)
    bad = 0
    for s in ref:
        gg = got.get(s, [])
        rr = ref[s]
        if [d for d, _ in gg] != [d for d, _ in rr] or any(
            abs(a[1] - b[1]) > 0 for a, b in zip(gg, rr)
        ):
            bad += 1
            if bad <= 3:
                print(f"MISMATCH src={s}\n  got {gg}\n  ref {rr}")
    print(f"graph parity vs numpy reference: {'OK' if bad == 0 else f'{bad} BAD'}")

    # --- recall sweep --------------------------------------------------------
    unit = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
    qids = [int(ids[i]) for i in range(0, n, max(1, n // 20))][:20]

    def exact_topk(qi):
        qv = unit[np.searchsorted(ids, qi)]
        sc = unit @ qv
        o = np.lexsort((ids, -sc))
        return [int(ids[j]) for j in o[:K_TOP]]

    for R in (1, 2, 4, 6):
        psets = [A.hyperplanes(dim, 4, seed=A.LSH_SEED + r) for r in range(R)]
        t0 = time.time()
        g = A.knn_graph(e, psets, m=M, blocks_per_bucket=2).persist()
        n_edges = g.count()
        t_build = time.time() - t0
        for entry_mode in ("fixed", "centroid"):
            if entry_mode == "fixed":
                entries = [0, 1, 2, 3]
            else:
                cent_rows = (
                    e.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
                )
                cents = np.array(
                    [[float(x) for x in r.embedding] for r in cent_rows]
                )
                d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                assign = np.argmin(d2, axis=1)
                entries = []
                for c in range(len(cents)):
                    mem = np.nonzero(assign == c)[0]
                    if len(mem):
                        best = mem[np.lexsort((ids[mem], d2[mem, c]))[0]]
                        entries.append(int(ids[best]))
            hits = tot = 0
            t0 = time.time()
            for qi in qids:
                qrow = e.filter(F.col("vec_id") == qi).head()
                qv = [float(x) for x in qrow.embedding]
                res = A.graph_beam_search(
                    g, e, qv, entries, beam=BEAM, hops=HOPS, k=K_TOP
                ).collect()
                got_ids = {int(r.vec_id) for r in res}
                hits += len(got_ids & set(exact_topk(qi)))
                tot += K_TOP
            t_q = time.time() - t0
            print(
                f"R={R} entries={entry_mode:8s} edges={n_edges:6d} "
                f"build={t_build:5.1f}s recall@{K_TOP}={hits / tot:.3f} "
                f"({len(qids)} queries, {t_q:.1f}s walk)"
            )
        g.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
