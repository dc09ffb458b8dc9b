"""kNN operator tests on the shared sf0.001 testdata."""

from pyspark.sql import functions as F

from educational_vector_database_spark.operators import knn as K
from educational_vector_database_spark.session import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _qv(spark, sf_dir, vid=0):
    return [float(x) for x in
            _emb(spark, sf_dir).filter(F.col("vec_id") == vid).head().embedding]


def test_knn_self_is_top1(spark, sf_dir):
    # a stored vector is its own nearest neighbor under every metric
    # (reference test_v2_features.py:51-66 generalized)
    qv = _qv(spark, sf_dir, 7)
    for metric in ("cosine", "dot", "euclidean"):
        top = K.knn(_emb(spark, sf_dir), qv, k=1, metric=metric).head()
        if metric != "dot":  # dot prefers longer vectors; self-top1 not guaranteed
            assert top.vec_id == 7, metric
        assert top.score is not None


def test_knn_k_clamps(spark, sf_dir):
    qv = _qv(spark, sf_dir)
    assert K.knn(_emb(spark, sf_dir), qv, k=10_000).count() == 500


def test_knn_sorted_best_first(spark, sf_dir):
    qv = _qv(spark, sf_dir)
    scores = [r.score for r in K.knn(_emb(spark, sf_dir), qv, k=20).collect()]
    assert scores == sorted(scores, reverse=True)


def test_knn_empty_store_returns_empty(spark, sf_dir):
    # reference api.py:106-108: search on empty store -> []
    empty = _emb(spark, sf_dir).filter("vec_id < 0")
    assert K.knn(empty, _qv(spark, sf_dir), k=5).count() == 0


def test_knn_join_matches_single_knn(spark, sf_dir):
    corpus = _emb(spark, sf_dir)
    queries = corpus.filter("vec_id IN (3, 11)").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    joined = K.knn_join(corpus, queries, k=4, metric="cosine")
    got = {
        (r.query_id, r.rank): (r.vec_id, r.score) for r in joined.collect()
    }
    assert len(got) == 8
    for qid in (3, 11):
        single = K.knn(corpus, _qv(spark, sf_dir, qid), k=4, metric="cosine").collect()
        for rank, row in enumerate(single, start=1):
            assert got[(qid, rank)][0] == row.vec_id


def test_filtered_knn_respects_predicate(spark, sf_dir):
    out = K.filtered_knn(
        _emb(spark, sf_dir), F.col("label") == 2, _qv(spark, sf_dir),
        k=5, extra_cols=("label",),
    ).collect()
    assert len(out) == 5 and all(r.label == 2 for r in out)


def test_knn_plan_is_take_ordered(spark, sf_dir):
    # scale check: single-query kNN must plan as TakeOrderedAndProject
    # (per-partition heap, no full sort, no shuffle)
    plan = K.knn(_emb(spark, sf_dir), _qv(spark, sf_dir), k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_knn_join_zero_vector_query_scores_zero(spark, sf_dir):
    """Zero vectors on either side of the cosine batch join must score 0.0
    (reference guard semantics), not raise DIVIDE_BY_ZERO under ANSI mode."""
    corpus = _emb(spark, sf_dir).limit(20).unionByName(
        spark.createDataFrame([(9999, [0.0] * 64, -1)],
                              "vec_id: long, embedding: array<double>, label: int")
        .select("vec_id", "embedding", "label")
        , allowMissingColumns=True)
    queries = spark.createDataFrame(
        [(0, [0.0] * 64)], "query_id: long, query_vec: array<double>"
    )
    got = K.knn_join(corpus, queries, k=3, metric="cosine").collect()
    assert len(got) == 3 and all(r.score == 0.0 for r in got)
