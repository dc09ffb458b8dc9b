"""Numpy replica of knn_graph + graph_beam_search over the real testdata —
fast hyperparameter sweep (R, m, beam, hops, entries) for the round-6
recall target. The replica matches the engine's declared semantics
(collision-union candidate edges, per-node top-m, beam recurrence); float
fold-order last-ulp differences don't move recall.
Run: python tools/graph_walk_sweep_np.py [sf_dir]
"""
import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from educational_vector_database_spark.operators import ann as A

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
K_TOP = 10


def load():
    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    ids = np.array(t["vec_id"], dtype=np.int64)
    mat = np.array([list(v) for v in t["embedding"].to_pylist()], dtype=np.float64)
    o = np.argsort(ids)
    return ids[o], mat[o]


def build_graph(ids, mat, R, m, planes_per_set=4):
    n, dim = mat.shape
    unit = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
    S = unit @ unit.T
    cand = np.zeros((n, n), dtype=bool)
    for r in range(R):
        H = np.array(A.hyperplanes(dim, planes_per_set, seed=A.LSH_SEED + r))
        bits = (mat @ H.T > 0).astype(np.int64)
        bkt = (bits << np.arange(planes_per_set)).sum(axis=1)
        same = bkt[:, None] == bkt[None, :]
        cand |= same
    np.fill_diagonal(cand, False)
    nbrs = {}
    for i in range(n):
        js = np.nonzero(cand[i])[0]
        if len(js) == 0:
            nbrs[int(ids[i])] = []
            continue
        o = js[np.lexsort((ids[js], -S[i, js]))][:m]
        nbrs[int(ids[i])] = [int(ids[j]) for j in o]
    return nbrs, unit


def beam_walk(nbrs, ids, unit, qv, entries, beam, hops, k):
    idx = {int(i): j for j, i in enumerate(ids)}
    sc = {int(i): float(unit[idx[int(i)]] @ qv) for i in idx}
    visited = {e for e in entries if e in idx}
    frontier = sorted(visited)
    for _ in range(hops):
        cand = set()
        for f in frontier:
            cand.update(nbrs.get(f, []))
        cand -= visited
        visited |= cand
        frontier = sorted(cand, key=lambda i: (-sc[i], i))[:beam]
    return sorted(visited, key=lambda i: (-sc[i], i))[:k]


def main():
    ids, mat = load()
    n, dim = mat.shape
    unit = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
    print(f"n={n} dim={dim}")
    qpos = list(range(0, n, max(1, n // 25)))[:25]

    def exact(qv):
        s = unit @ qv
        return [int(ids[j]) for j in np.lexsort((ids, -s))[:K_TOP]]

    # centroid entries from the vec_id<4 fixture centroids
    cents = mat[np.searchsorted(ids, [0, 1, 2, 3])]
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = np.argmin(d2, axis=1)
    centroid_entries = []
    for c in range(len(cents)):
        mem = np.nonzero(assign == c)[0]
        if len(mem):
            centroid_entries.append(
                int(ids[mem[np.lexsort((ids[mem], d2[mem, c]))[0]]])
            )

    for R in (2, 4, 6):
        for m in (4, 8, 16):
            nbrs, _ = build_graph(ids, mat, R, m)
            avg_deg = sum(len(v) for v in nbrs.values()) / n
            for beam in (8, 16, 32):
                for hops in (2, 3, 4):
                    for ename, entries in (
                        ("fixed", [0, 1, 2, 3]),
                        ("centroid", centroid_entries),
                    ):
                        hits = 0
                        for qp in qpos:
                            qv = unit[qp]
                            got = beam_walk(
                                nbrs, ids, unit, qv, entries, beam, hops, K_TOP
                            )
                            hits += len(set(got) & set(exact(qv)))
                        rec = hits / (len(qpos) * K_TOP)
                        if rec >= 0.80 or (beam, hops) == (8, 2):
                            print(
                                f"R={R} m={m:2d} deg={avg_deg:4.1f} beam={beam:2d} "
                                f"hops={hops} entries={ename:8s} recall={rec:.3f}"
                            )


if __name__ == "__main__":
    main()
