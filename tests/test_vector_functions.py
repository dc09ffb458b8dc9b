"""Vector-math expression tests, mirroring the reference's unit-vector fixtures
(reference tests/test_v2_features.py:51-70)."""

import math

import pytest
from pyspark.sql import functions as F

from educational_vector_database_spark.functions import vector as V


def _frame(spark):
    # unit vectors [1,0] and [0,1], query [0.9, 0.1] — reference fixture
    return spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "id: long, v: array<double>"
    )


def test_dot_and_norm(spark):
    df = _frame(spark).select(
        V.dot_product("v", V.vector_literal([0.9, 0.1])).alias("d"),
        V.l2_norm("v").alias("n"),
    )
    rows = {r.d: r.n for r in df.collect()}
    assert rows == {0.9: 1.0, 0.1: 1.0}


def test_l2_normalize_epsilon_guard(spark):
    df = spark.createDataFrame([([0.0, 0.0],)], "v: array<double>")
    out = df.select(V.l2_normalize("v").alias("n")).head().n
    assert out == [0.0, 0.0]  # reference index.py:4-8: zero vector stays zero


def test_all_metrics_rank_matching_vector_best(spark):
    # reference test_v2_features.py:51-66
    q = V.vector_literal([0.9, 0.1])
    df = _frame(spark)
    for metric in V.SUPPORTED_METRICS:
        best = (
            df.select("id", V.similarity(metric, "v", q).alias("s"))
            .orderBy(F.desc("s"))
            .head()
        )
        assert best.id == 0, metric


def test_euclidean_similarity_formula(spark):
    df = _frame(spark).filter("id = 0")
    s = df.select(V.similarity("euclidean", "v", V.vector_literal([1.0, 0.0])).alias("s")).head().s
    assert s == 1.0  # identical vectors: 1/(1+0)
    s2 = df.select(V.similarity("EUCLIDEAN", "v", V.vector_literal([0.0, 0.0])).alias("s")).head().s
    assert math.isclose(s2, 1.0 / 2.0)


def test_unknown_metric_raises():
    # reference index.py:45-46, test_v2_features.py:69-70
    with pytest.raises(ValueError):
        V.similarity("manhattan", F.col("a"), F.col("b"))


def test_cosine_matches_float64_formula(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "v: array<double>")
    s = df.select(V.cosine_similarity("v", V.vector_literal([4.0, 3.0])).alias("s")).head().s
    assert s == (3.0 * 4.0 + 4.0 * 3.0) / (5.0 * 5.0)


def test_rademacher_projection_exact_and_deterministic(spark):
    signs = V.rademacher_signs(4, 3, salt="t")
    assert signs == V.rademacher_signs(4, 3, salt="t")
    assert all(s in (-1, 1) for row in signs for s in row)
    # basis vector e1 scaled: projection k picks out signs[k][0] * 1e6 exactly
    df = spark.createDataFrame([([1.0, 0.0, 0.0],)], "v array<double>")
    out = df.select(V.project_micro("v", signs).alias("y")).head().y
    assert out == [row[0] * 1_000_000 for row in signs]
