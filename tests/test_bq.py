"""Binary-quantization operator tests (operators/bq.py)."""

import numpy as np
from pyspark.sql import functions as F

from educational_vector_database_spark.operators import bq as BQ
from educational_vector_database_spark.session import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _rows(spark, sf_dir, n=None):
    df = _emb(spark, sf_dir).orderBy("vec_id")
    if n:
        df = df.limit(n)
    rows = df.collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([[float(x) for x in r.embedding] for r in rows])
    return ids, mat


def _np_code(v, thresholds=None):
    """Unsigned numpy replica of the packed sign-bit word list."""
    dim = len(v)
    thr = np.zeros(dim) if thresholds is None else np.asarray(thresholds)
    out = []
    for w in range((dim + 63) // 64):
        word = 0
        for bit in range(min(dim, 64 * w + 64) - 64 * w):
            if v[64 * w + bit] > thr[64 * w + bit]:
                word |= 1 << bit
        # two's-complement signed view, matching the BIGINT the engines hold
        out.append(word - (1 << 64) if word >= (1 << 63) else word)
    return out


def test_bq_encode_matches_numpy(spark, sf_dir):
    """Scan-side packed codes equal the numpy sign-bit replica, including
    the sign bit (dim 63) as a negative BIGINT."""
    ids, mat = _rows(spark, sf_dir, 200)
    got = {
        r.vec_id: r.code
        for r in _emb(spark, sf_dir).orderBy("vec_id").limit(200).select(
            "vec_id", BQ.bq_encode_expr("embedding", 64).alias("code")
        ).collect()
    }
    saw_negative = False
    for i, vid in enumerate(ids):
        want = _np_code(mat[i])[0]
        assert got[int(vid)] == want, vid
        saw_negative = saw_negative or want < 0
    # the corpus is zero-centered, so some row must set bit 63 — otherwise
    # the sign-bit packing path is untested
    assert saw_negative


def test_bq_query_code_matches_expr(spark, sf_dir):
    """Driver-side query encode equals the scan-side expression row by
    row — the contract that lets knn_hamming use a literal query code."""
    ids, mat = _rows(spark, sf_dir, 50)
    got = {
        r.vec_id: r.code
        for r in _emb(spark, sf_dir).orderBy("vec_id").limit(50).select(
            "vec_id", BQ.bq_encode_expr("embedding", 64).alias("code")
        ).collect()
    }
    for i, vid in enumerate(ids):
        assert [got[int(vid)]] == BQ.bq_query_code(mat[i].tolist()), vid


def test_hamming_expr_matches_numpy(spark, sf_dir):
    ids, mat = _rows(spark, sf_dir, 100)
    qv = mat[13]
    qc = BQ.bq_query_code(qv.tolist())
    codes = BQ.bq_encode(_emb(spark, sf_dir).orderBy("vec_id").limit(100), 64)
    got = {
        r.vec_id: r.h
        for r in codes.select(
            "vec_id", BQ.hamming_expr("bq_code", qc).alias("h")
        ).collect()
    }
    for i, vid in enumerate(ids):
        want = int(bin((_np_code(mat[i])[0] ^ qc[0]) & ((1 << 64) - 1)).count("1"))
        assert got[int(vid)] == want, vid


def test_multiword_roundtrip(spark, sf_dir):
    """dim > 64 packs into array<bigint>; Hamming sums per-word popcounts.
    Built from a 128-dim doubled embedding so both words carry sign bits."""
    df = _emb(spark, sf_dir).limit(80).select(
        "vec_id", F.concat("embedding", "embedding").alias("embedding")
    )
    rows = df.orderBy("vec_id").collect()
    qv = [float(x) for x in rows[5].embedding]
    qc = BQ.bq_query_code(qv)
    assert len(qc) == 2
    got = {
        r.vec_id: r.h
        for r in df.select(
            "vec_id",
            BQ.hamming_expr(BQ.bq_encode_expr("embedding", 128), qc).alias("h"),
        ).collect()
    }
    for r in rows:
        v = [float(x) for x in r.embedding]
        cw = _np_code(v)
        want = sum(
            int(bin((cw[w] ^ qc[w]) & ((1 << 64) - 1)).count("1"))
            for w in range(2)
        )
        assert got[r.vec_id] == want, r.vec_id
    # doubled vector => identical halves => query's distance to itself is 0
    assert got[rows[5].vec_id] == 0


def test_knn_hamming_rerank_recovers_exact_topk(spark, sf_dir):
    """With shortlist = corpus the rerank IS exact cosine top-k (the
    Hamming pass only orders the rerank's input), the pre-coded path
    reading only the code table matches on-the-fly encode, and a modest
    shortlist still lands the self-match first with real overlap against
    the exact set (the corpus is near-random, so 64-bit Hamming is a
    coarse rank estimator — recall here is a floor, not the i.i.d.-cluster
    number the gated recall eval measures)."""
    from educational_vector_database_spark.operators.knn import knn

    ids, mat = _rows(spark, sf_dir)
    qv = mat[21].tolist()
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    n = e.count()
    exact = [(r.vec_id, r.score) for r in knn(e, qv, k=5).collect()]
    full = [
        (r.vec_id, r.score)
        for r in BQ.knn_hamming_rerank(e, qv, k=5, shortlist=n).collect()
    ]
    assert full == exact
    codes = BQ.bq_encode(e, 64)
    onfly = [
        (r.vec_id, r.score)
        for r in BQ.knn_hamming_rerank(e, qv, k=5, shortlist=120).collect()
    ]
    precoded = [
        (r.vec_id, r.score)
        for r in BQ.knn_hamming_rerank(
            e, qv, k=5, shortlist=120, codes=codes
        ).collect()
    ]
    assert precoded == onfly
    assert onfly[0] == exact[0]  # self-match survives any shortlist
    assert len({v for v, _ in onfly} & {v for v, _ in exact}) >= 2


def test_knn_join_hamming_matches_single_query_path(spark, sf_dir):
    """The batch join reproduces knn_hamming_rerank per query exactly."""
    ids, mat = _rows(spark, sf_dir)
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    qids = [2, 17, 44]
    queries = e.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = BQ.knn_join_hamming(e, queries, 64, k=6, shortlist=40).collect()
    by_q = {}
    for r in sorted(batch, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.score))
    assert set(by_q) == set(qids)
    for qid in qids:
        qv = mat[list(ids).index(qid)].tolist()
        single = [
            (r.vec_id, r.score)
            for r in BQ.knn_hamming_rerank(e, qv, k=6, shortlist=40).collect()
        ]
        assert by_q[qid] == single, qid


def test_thresholds_shift_the_code(spark, sf_dir):
    """Per-dim thresholds move the cut: thresholds above every coordinate
    give the all-zero code, below every coordinate the all-ones code."""
    e = _emb(spark, sf_dir).limit(10)
    hi = e.select(BQ.bq_encode_expr("embedding", 64, [10.0] * 64).alias("c"))
    lo = e.select(BQ.bq_encode_expr("embedding", 64, [-10.0] * 64).alias("c"))
    assert {r.c for r in hi.collect()} == {0}
    assert {r.c for r in lo.collect()} == {-1}  # all 64 bits set


def test_asym_score_matches_numpy(spark, sf_dir):
    """The per-bit conditional chain equals dot(q, sign(v)) computed with
    the same left-to-right fold."""
    ids, mat = _rows(spark, sf_dir, 100)
    qv = mat[13]
    codes = BQ.bq_encode(_emb(spark, sf_dir).orderBy("vec_id").limit(100), 64)
    from educational_vector_database_spark.functions import vector as V

    got = {
        r.vec_id: r.a
        for r in codes.select(
            "vec_id",
            BQ.asym_score_expr(
                "bq_code", V.vector_literal(qv.tolist()), 64
            ).alias("a"),
        ).collect()
    }
    for i, vid in enumerate(ids):
        s = None
        for pos in range(64):
            t = float(qv[pos]) if mat[i, pos] > 0 else -float(qv[pos])
            s = t if s is None else s + t
        assert got[int(vid)] == s, vid


def test_knn_join_bq_asym_matches_single_query_path(spark, sf_dir):
    """Batch asym join reproduces knn_bq_asym per query exactly."""
    ids, mat = _rows(spark, sf_dir)
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    qids = [4, 23, 51]
    queries = e.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = BQ.knn_join_bq_asym(e, queries, 64, k=6, shortlist=40).collect()
    by_q = {}
    for r in sorted(batch, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.score))
    for qid in qids:
        qv = mat[list(ids).index(qid)].tolist()
        single = [
            (r.vec_id, r.score)
            for r in BQ.knn_bq_asym(e, qv, k=6, shortlist=40).collect()
        ]
        assert by_q[qid] == single, qid


def test_asym_beats_symmetric_recall(spark, sf_dir):
    """The whole point of asym: at the same shortlist and the same 8-byte
    codes, keeping the query at float precision recovers more of the exact
    top-k than symmetric Hamming (measured 0.875 vs 0.615 at sf0.01)."""
    from educational_vector_database_spark.functions import vector as V
    from pyspark.sql import Window

    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    queries = e.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 120)
    ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    score = V.similarity("cosine", V.as_double("embedding"), V.as_double("query_vec"))
    pairs = e.join(F.broadcast(queries)).select(
        F.col("query_id").alias("qid"), "vec_id", score.alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    exact = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10).select("qid", "vec_id")
    ).cache()
    def hits(approx):
        return exact.join(
            approx.select(F.col("query_id").alias("qid"), "vec_id"),
            ["qid", "vec_id"],
        ).count()
    h_sym = hits(BQ.knn_join_hamming(e, queries, 64, k=10, shortlist=50))
    h_asym = hits(BQ.knn_join_bq_asym(e, queries, 64, k=10, shortlist=50))
    exact.unpersist()
    assert h_asym > h_sym
    assert h_asym >= 150  # >= 0.75 recall@10 where symmetric gets ~0.615


def test_knn_ivf_hamming_composes_pruning(spark, sf_dir):
    """IVF x BQ: candidates come ONLY from probed cells (an id outside
    them can never surface), and with nprobe = n_cells + shortlist =
    corpus the result degrades to exact top-k — the composition contract
    knn_ivfpq has, on the sign-bit leg."""
    from educational_vector_database_spark.operators.knn import knn
    from educational_vector_database_spark.operators.pq import (
        assign_cells_expr, probe_cells,
    )

    ids, mat = _rows(spark, sf_dir)
    cents = mat[:4].tolist()
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    qv = mat[33].tolist()
    n = e.count()
    full = [
        (r.vec_id, r.score)
        for r in BQ.knn_ivf_hamming(
            e, qv, cents, k=5, nprobe=4, shortlist=n
        ).collect()
    ]
    exact = [(r.vec_id, r.score) for r in knn(e, qv, k=5).collect()]
    assert full == exact
    probed = set(probe_cells(qv, cents, 2))
    in_cells = {
        r.vec_id
        for r in e.select(
            "vec_id", assign_cells_expr("embedding", cents).alias("c")
        ).collect()
        if r.c in probed
    }
    got = {r.vec_id for r in BQ.knn_ivf_hamming(
        e, qv, cents, k=5, nprobe=2, shortlist=40).collect()}
    assert got <= in_cells


def test_asym_multiword(spark, sf_dir):
    """asym_score_expr on dim > 64 (array<bigint> codes): the chain spans
    words; a doubled embedding gives exactly twice the 64-dim score."""
    from educational_vector_database_spark.functions import vector as V

    ids, mat = _rows(spark, sf_dir, 40)
    qv = mat[3].tolist()
    e64 = _emb(spark, sf_dir).orderBy("vec_id").limit(40)
    s64 = {
        r.vec_id: r.a
        for r in e64.select(
            "vec_id",
            BQ.asym_score_expr(
                BQ.bq_encode_expr("embedding", 64),
                V.vector_literal(qv), 64,
            ).alias("a"),
        ).collect()
    }
    e128 = e64.select("vec_id", F.concat("embedding", "embedding").alias("embedding"))
    s128 = {
        r.vec_id: r.a
        for r in e128.select(
            "vec_id",
            BQ.asym_score_expr(
                BQ.bq_encode_expr("embedding", 128),
                V.vector_literal(qv + qv), 128,
            ).alias("a"),
        ).collect()
    }
    for vid, v in s64.items():
        assert s128[vid] == v + v, vid
