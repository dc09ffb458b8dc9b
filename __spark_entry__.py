"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` declare every implemented operator from SURVEY.md §2, checked
by the driver against DuckDB at sf0.01 (row-count + schema + order-insensitive
value-hash). Float columns are computed with identical IEEE-754 operation
order on both sides (see functions/vector.py docstring) so hashes match
bit-for-bit — no rounding games.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from educational_vector_database_spark.operators import knn as K
from educational_vector_database_spark.session import load_table

DIM = 64
TOP_K = 10

# SQL fragments for the float64 vector math, written to be bit-identical to the
# Spark expressions in functions/vector.py (same op order; verified at sf0.01).
_DOT = "list_dot_product({a}, {b})"
_COS = (
    "(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
)
_EUC_SIM = "(1.0 / (1.0 + list_distance({a}, {b})))"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    """Driver-side lookup of the query vector (≙ reference embeds the query
    string driver-side before searching, api.py:164-168)."""
    row = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .head()
    )
    return [float(x) for x in row[0]]


def _knn_query(metric: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        qv = _query_vector(spark, sf_dir)
        return K.knn(_emb(spark, sf_dir), qv, k=TOP_K, metric=metric)

    return run


def _knn_oracle(sim_fragment: str) -> str:
    sim = sim_fragment.format(a="e.embedding::DOUBLE[]", b="q.qv")
    return f"""
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id AS vec_id, {sim} AS score
        FROM embeddings e CROSS JOIN q
        ORDER BY score DESC, e.vec_id ASC
        LIMIT {TOP_K}
    """


def _scan_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _emb(spark, sf_dir).agg(
        F.count("*").alias("n_rows"),
        F.sum("vec_id").alias("vec_id_sum"),
        F.sum("label").alias("label_sum"),
        F.sum(F.size("embedding")).alias("dim_sum"),
    )


def _project_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _emb(spark, sf_dir).select("vec_id", "label")


def _filter_dim_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _emb(spark, sf_dir)
        .filter(F.size("embedding") == DIM)
        .agg(F.count("*").alias("n_valid"))
    )


def _filter_then_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = _query_vector(spark, sf_dir)
    return K.filtered_knn(
        _emb(spark, sf_dir),
        F.col("label") == 3,
        qv,
        k=TOP_K,
        metric="cosine",
        extra_cols=("label",),
    )


def _knn_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _emb(spark, sf_dir)
    queries = (
        corpus.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    return K.knn_join(corpus, queries, k=5, metric="cosine")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact cosine top-10 over the sf0.001 vector store."""
    return _knn_query("cosine")(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "scan_embeddings": _scan_embeddings,
        "project_items": _project_items,
        "filter_dim_valid": _filter_dim_valid,
        "knn_cosine": _knn_query("cosine"),
        "knn_dot": _knn_query("dot"),
        "knn_euclidean": _knn_query("euclidean"),
        "filter_then_knn": _filter_then_knn,
        "knn_join_topk": _knn_join_topk,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "scan_embeddings": """
            SELECT count(*) AS n_rows,
                   CAST(sum(vec_id) AS BIGINT) AS vec_id_sum,
                   CAST(sum(label) AS BIGINT) AS label_sum,
                   CAST(sum(len(embedding)) AS BIGINT) AS dim_sum
            FROM embeddings
        """,
        "project_items": "SELECT vec_id, label FROM embeddings",
        "filter_dim_valid": """
            SELECT count(*) AS n_valid FROM embeddings WHERE len(embedding) = 64
        """,
        "knn_cosine": _knn_oracle(_COS),
        "knn_dot": _knn_oracle(_DOT),
        "knn_euclidean": _knn_oracle(_EUC_SIM),
        "filter_then_knn": f"""
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id AS vec_id, e.label AS label,
                   {_COS.format(a="e.embedding::DOUBLE[]", b="q.qv")} AS score
            FROM embeddings e CROSS JOIN q
            WHERE e.label = 3
            ORDER BY score DESC, e.vec_id ASC
            LIMIT {TOP_K}
        """,
        "knn_join_topk": f"""
            WITH q AS (
                SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                FROM embeddings WHERE vec_id < 8
            ),
            scored AS (
                SELECT q.query_id, e.vec_id,
                       {_COS.format(a="e.embedding::DOUBLE[]", b="q.qv")} AS score
                FROM embeddings e CROSS JOIN q
            )
            SELECT query_id, vec_id, score,
                   CAST(row_number() OVER (
                        PARTITION BY query_id ORDER BY score DESC, vec_id ASC
                   ) AS INT) AS rank
            FROM scored
            QUALIFY rank <= 5
        """,
    }
