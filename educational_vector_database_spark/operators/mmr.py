"""Maximal marginal relevance: diversity-aware reranking of a shortlist.

MMR (Carbonell & Goldstein, SIGIR 1998) picks results one at a time,
trading relevance against redundancy with what is already picked:

    pick_t = argmax_{c not yet picked}  lam * rel(c) - (1 - lam) * max_{s in picked} sim(c, s)

The reference returns raw similarity order (reference src/vectordb/
rag.py:74-97 assembles top-k context verbatim); MMR is the piece a
retrieval pipeline adds when near-duplicate passages crowd the context
window — directly useful to the dedup-heavy corpora this engine targets.

Spark-first shape: the greedy recurrence is sequential in t, but t <= k
and k is a PLAN-BUILD constant (the graph walk's hop-unroll precedent,
operators/ann.py graph_beam_search) — so selection unrolls into k
declarative stages of join + groupBy(max) + window-argmax over the
CANDIDATE POOL, which is queries x pool rows (bounded small by
construction: MMR always runs over a shortlist, never a corpus). The
driver never collects; every float op (cosine via functions/vector.py,
the lam linear combination, max-of-doubles) keeps the shared IEEE
discipline, so results hash-check against an identically-unrolled SQL
oracle.

At 100 TB the pool stage is whatever candidate generator feeds it (brute
top-N, IVF probe, Hamming shortlist); the MMR stages themselves touch
queries x pool rows regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V


def mmr_rerank_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    lam: float = 0.5,
    pool: int = 20,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    candidates: DataFrame | None = None,
    persists_out: list | None = None,
) -> DataFrame:
    """Batch MMR: per query, greedily select ``k`` of the top-``pool``
    relevance candidates, each step penalized by the max similarity to the
    rows already selected (step 1's penalty is 0.0, so every step shares
    the formula ``lam*rel - (1-lam)*pen``). Ties break (score DESC, id
    ASC) — a total order, so selection is deterministic.

    Pass ``candidates`` (query_id, id, vector, rel) to rerank an existing
    shortlist (e.g. a Hamming or IVF shortlist) instead of the brute
    top-``pool``. The candidate frame is cached for the k reuses — it is
    queries x pool rows, bounded small by construction. With
    ``persists_out`` the cached frame is appended for caller-owned
    cleanup (the dedup-family discipline); without it the cache block
    lives until the session clears its catalog cache.

    Returns (query_id, rank, id, mmr_score): rank t = the t-th pick.
    """
    lam_c, mu_c = F.lit(float(lam)), F.lit(1.0 - float(lam))
    if candidates is None:
        rel = V.similarity(
            metric, V.as_double(vector_col), V.as_double(query_vec_col)
        )
        pairs = corpus.select(id_col, vector_col).join(F.broadcast(queries)).select(
            F.col(query_id_col), F.col(id_col), F.col(vector_col),
            rel.alias("rel"),
        )
        wp = Window.partitionBy(query_id_col).orderBy(
            F.desc("rel"), F.asc(id_col)
        )
        candidates = (
            pairs.withColumn("_rn", F.row_number().over(wp))
            .filter(F.col("_rn") <= pool)
            .drop("_rn")
        )
    cand = candidates.persist()
    if persists_out is not None:
        persists_out.append(cand)

    wsel = Window.partitionBy(query_id_col).orderBy(
        F.desc("_mmr"), F.asc(id_col)
    )
    # step 1: empty selected set -> penalty 0.0 (mu*0.0 == 0.0 exactly)
    sel = (
        cand.withColumn("_mmr", lam_c * F.col("rel") - mu_c * F.lit(0.0))
        .withColumn("_srn", F.row_number().over(wsel))
        .filter(F.col("_srn") == 1)
        .select(
            query_id_col, id_col, vector_col,
            F.col("_mmr").alias("mmr_score"), F.lit(1).alias("rank"),
        )
    )
    out = sel
    for t in range(2, k + 1):
        sel_v = out.select(
            F.col(query_id_col).alias("_sq"),
            F.col(id_col).alias("_sid"),
            F.col(vector_col).alias("_svec"),
        )
        rem = cand.join(
            sel_v.select(
                F.col("_sq").alias(query_id_col), F.col("_sid").alias(id_col)
            ),
            [query_id_col, id_col],
            "left_anti",
        )
        pen = (
            rem.join(
                F.broadcast(sel_v), rem[query_id_col] == sel_v["_sq"]
            )
            .select(
                query_id_col, id_col, "rel", vector_col,
                V.similarity(
                    metric, V.as_double(vector_col), V.as_double("_svec")
                ).alias("_s"),
            )
            .groupBy(query_id_col, id_col, "rel", vector_col)
            .agg(F.max("_s").alias("_pen"))
        )
        pick = (
            pen.withColumn("_mmr", lam_c * F.col("rel") - mu_c * F.col("_pen"))
            .withColumn("_srn", F.row_number().over(wsel))
            .filter(F.col("_srn") == 1)
            .select(
                query_id_col, id_col, vector_col,
                F.col("_mmr").alias("mmr_score"), F.lit(t).alias("rank"),
            )
        )
        out = out.unionByName(pick)
    return out.select(
        query_id_col, F.col("rank").cast("int"), id_col, "mmr_score"
    )
