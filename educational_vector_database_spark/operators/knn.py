"""k-nearest-neighbor search operators.

The reference serves one query at a time: full store scan -> BLAS similarity ->
``np.argsort(-scores)[:k]`` (reference src/vectordb/api.py:105-150). Spark-first
re-expression:

- Single query -> score column + ``orderBy(desc).limit(k)``; Catalyst plans
  ``TakeOrderedAndProject`` — a per-partition top-k heap merged on the driver,
  never a full sort. At 100 TB this is a single scan stage with no shuffle.
- Query *batch* -> broadcast nested-loop join + per-query window top-k; the
  corpus side streams through executors once regardless of query count.

Tie-breaking: the reference's argsort is an unstable quicksort, so its tie order
is arbitrary (api.py:139). We canonicalize ``(score DESC, id ASC)`` — a strict
total order — which makes results deterministic and oracle-checkable
(SURVEY.md §7.3.2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V


def knn(
    df: DataFrame,
    query_vector: Sequence[float] | Column,
    k: int = 5,
    metric: str = "cosine",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact top-k for one query vector (reference api.py:105-150 ``search_vector``).

    Returns ``(id_col, *extra_cols, score)`` best-first; ``k`` clamps naturally
    at the row count (reference api.py:121). Physical plan:
    ``Scan parquet -> Project(score) -> TakeOrderedAndProject`` — verify with
    ``.explain()``; no shuffle, no full sort.
    """
    q = query_vector if isinstance(query_vector, Column) else V.vector_literal(query_vector)
    score = V.similarity(metric, V.as_double(vector_col), q)
    return (
        df.select(id_col, *extra_cols, score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    metric: str = "cosine",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    query_vector_col: str = "query_vec",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Batch kNN: top-k corpus rows per query row (similarity join).

    The reference answers a batch only as a Python loop of single queries
    (server.py:95-105); set-at-a-time this is a **broadcast** nested-loop join
    (queries ≪ corpus always holds for kNN serving) followed by a per-query
    top-k window. The corpus — the 100 TB side — is scanned exactly once with
    no shuffle of the raw vectors; only ``(query_id, vec_id, score)`` triples
    reach the window's shuffle, and the window partitions by ``query_id`` so
    parallelism = number of queries.

    For cosine, BOTH sides unit-normalize once before the join, so the
    per-(corpus, query) pair work is a single dot product — the two norms
    would otherwise recompute for every pair (3x the flops at q×n pairs).
    Score is ``dot(a/|a|, b/|b|)``, the same op order as embedding_near_dup
    and its SQL oracle.

    Returns ``(query_id, vec_id, score, rank)`` with ``rank`` 1-based best-first.
    """
    if metric.lower() == "cosine":
        c_vec = V.l2_normalize(V.as_double(vector_col), eps=0.0)
        q_vec = V.l2_normalize(V.as_double(query_vector_col), eps=0.0)
        pair_score = V.dot_product(F.col("__cv"), F.col("__qv"))
    else:
        c_vec = V.as_double(vector_col)
        q_vec = V.as_double(query_vector_col)
        pair_score = V.similarity(metric, F.col("__cv"), F.col("__qv"))
    q = F.broadcast(queries.select(F.col(query_id_col), q_vec.alias("__qv")))
    scored = (
        corpus.select(F.col(id_col), c_vec.alias("__cv"))
        .crossJoin(q)
        .select(query_id_col, id_col, pair_score.alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def filtered_knn(
    df: DataFrame,
    predicate: Column | str,
    query_vector: Sequence[float] | Column,
    k: int = 5,
    metric: str = "cosine",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Predicate-filtered kNN — absent in the reference (metadata never filters
    search, SURVEY.md §2.2) but the natural Spark generalization: the filter is
    pushed into the parquet scan (check ``PushedFilters`` in ``.explain``), so
    selective predicates skip row groups before any vector math runs."""
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    return knn(df.filter(pred), query_vector, k, metric, vector_col, id_col, extra_cols)
