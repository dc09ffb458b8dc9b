"""Product-quantization operator tests (operators/pq.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from educational_vector_database_spark.operators import pq as PQ
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


def test_pq_encode_matches_numpy(spark, sf_dir):
    """Packed codes equal a numpy argmin replica (euclid, ties lowest c)."""
    ids, mat = _rows(spark, sf_dir, 150)
    cbs = PQ.pq_codebooks_from_rows(mat[:16].tolist())
    got = {
        r.vec_id: r.code
        for r in _emb(spark, sf_dir).orderBy("vec_id").limit(150).select(
            "vec_id", PQ.pq_encode_expr("embedding", cbs).alias("code")
        ).collect()
    }
    for i, vid in enumerate(ids):
        packed = 0
        for j in range(PQ.N_SUB):
            sub = mat[i, j * 8 : (j + 1) * 8]
            d = [np.sqrt(((sub - np.array(c)) ** 2).sum()) for c in cbs[j]]
            packed |= int(np.argmin(d)) << (4 * j)
        assert got[int(vid)] == packed, vid


def test_pq_adc_matches_table_lookup(spark, sf_dir):
    """The ADC column equals the driver-side table lookup exactly."""
    ids, mat = _rows(spark, sf_dir, 100)
    cbs = PQ.pq_codebooks_from_rows(mat[:16].tolist())
    qv = mat[7].tolist()
    dt = PQ.adc_table(qv, cbs)
    codes = _emb(spark, sf_dir).orderBy("vec_id").limit(100).select(
        "vec_id", PQ.pq_encode_expr("embedding", cbs).alias("pq_code")
    )
    got = {
        r.vec_id: r.d
        for r in codes.select(
            "vec_id", PQ.pq_adc_dist_expr("pq_code", dt).alias("d")
        ).collect()
    }
    code_map = {r.vec_id: r.pq_code for r in codes.collect()}
    for vid in ids[:100]:
        c = code_map[int(vid)]
        want = 0.0
        for j in range(PQ.N_SUB):
            want = want + dt[j][(c >> (4 * j)) % 16]
        assert got[int(vid)] == want, vid


def test_pq_rerank_recall_dominates_adc(spark, sf_dir):
    """Shortlist+exact-rerank recall >= raw ADC recall, and rerank's
    results are exactly the true top-k restricted to the shortlist."""
    from educational_vector_database_spark.operators import knn as K

    ids, mat = _rows(spark, sf_dir)
    cbs = PQ.pq_codebooks_from_rows(mat[:16].tolist())
    qv = mat[7].tolist()
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    exact = {r.vec_id for r in K.knn(e, qv, k=10).collect()}
    adc = {r.vec_id for r in PQ.knn_pq(e, qv, cbs, k=10).collect()}
    rr = {r.vec_id for r in PQ.knn_pq_rerank(e, qv, cbs, k=10, shortlist=50).collect()}
    assert len(rr & exact) >= len(adc & exact)


def test_train_pq_codebooks_shape(spark, sf_dir):
    cbs = PQ.train_pq_codebooks(_emb(spark, sf_dir).limit(200))
    assert len(cbs) == PQ.N_SUB
    assert all(len(cb) == PQ.K_CODES for cb in cbs)
    assert all(len(c) == 8 for cb in cbs for c in cb)


def test_pq_codebooks_validation():
    with pytest.raises(ValueError, match="divisible"):
        PQ.pq_codebooks_from_rows([[0.0] * 63] * 16)
    with pytest.raises(ValueError, match="rows"):
        PQ.pq_codebooks_from_rows([[0.0] * 64] * 4)


def test_pq_variable_width_packing(spark, sf_dir):
    """k_codes > 16 packs at the wider derived bit width (the 4-bit
    hardcode was a silent-corruption bug); codes roundtrip vs numpy."""
    ids, mat = _rows(spark, sf_dir, 80)
    cbs = PQ.pq_codebooks_from_rows(mat[:32].tolist(), k_codes=32)
    assert PQ.code_bits(cbs) == 5
    got = {
        r.vec_id: r.code
        for r in _emb(spark, sf_dir).orderBy("vec_id").limit(80).select(
            "vec_id", PQ.pq_encode_expr("embedding", cbs).alias("code")
        ).collect()
    }
    for i, vid in enumerate(ids):
        packed = 0
        for j in range(PQ.N_SUB):
            sub = mat[i, j * 8 : (j + 1) * 8]
            d = [np.sqrt(((sub - np.array(c)) ** 2).sum()) for c in cbs[j]]
            packed |= int(np.argmin(d)) << (5 * j)
        assert got[int(vid)] == packed, vid
    # ADC unpack at the same width
    qv = mat[3].tolist()
    dt = PQ.adc_table(qv, cbs)
    d0 = _emb(spark, sf_dir).orderBy("vec_id").limit(80).select(
        "vec_id",
        PQ.pq_adc_dist_expr(PQ.pq_encode_expr("embedding", cbs), dt).alias("d"),
    ).head()
    c = got[int(d0.vec_id)]
    want = 0.0
    for j in range(PQ.N_SUB):
        want = want + dt[j][(c >> (5 * j)) % 32]
    assert d0.d == want


def test_pq_overflow_guard():
    with pytest.raises(ValueError, match="BIGINT"):
        PQ.code_bits([[[0.0] * 4] * 256] * 16)  # 16 subspaces x 8 bits = 128
