"""BM25 ranked lexical retrieval — the lexical leg of hybrid search.

Okapi BM25 (Robertson & Zaragoza, FnTIR 2009) with the Lucene
non-negative idf:

    score(D, Q) = Σ_{t in Q} idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·|D|/avgdl))
    idf(t)      = ln(1 + (N − df + 0.5) / (df + 0.5))

The engine already has unranked lexical signals (TF-IDF keywords,
token stats); BM25 adds RANKED retrieval for a query string, the
standard partner to the vector leg in hybrid RRF search. The reference
has no lexical scorer at all (vector-only store, reference
src/vectordb/api.py) — this is a training-/retrieval-pipeline addition.

Cross-engine exactness (the docs_tfidf_keywords discipline, extended):
idf is integer MICRO units — round(ln·1e6) is engine-stable because the
nearest rounding boundary across every reachable df is ≥2.4e-5
micro-units away (verified exhaustively for N=500 and N=20000; libm ULP
drift is ~1e-9 micro-units) — and the tf normalization is EXACT INTEGER
arithmetic: with k1 = k1_x10/10 and b = b_x100/100, multiplying
numerator and denominator by 10·total_tokens clears every fraction
(avgdl = total/N), so each term's contribution is

    ((10 + k1_x10) · idf_micro · tf · total) DIV
    (10·total·tf + c1·total + c2·dl·N)

with c1 = k1_x10·(100−b_x100)/100 and c2 = k1_x10·b_x100/100 (both must
be integers — true for the standard k1=1.2, b=0.75). One integer
division per (doc, term), integer sums — hash-identical in any engine.
Magnitude bound: (10+k1_x10)·idf_micro·tf·total must stay under 2^63 —
holds through ~10^8 corpus tokens with micro idf; use a smaller idf
unit beyond that.

At 100 TB: one token scan feeds tf (filtered to the query's terms
BEFORE the aggregation — the per-term tf table is |Q|·N_docs at worst,
not vocabulary-sized), df is |Q| rows, doc lengths are one groupBy, and
the scoring join broadcasts the |Q|-row df table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

IDF_MICRO = 1_000_000


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1_x10: int = 12,
    b_x100: int = 75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by BM25 for ``query_terms`` (already-normalized
    tokens — callers tokenize the query with the same
    ``normalized_text``+split convention). Returns
    ``(rk, doc_id, n_terms, bm25_scaled)`` where ``bm25_scaled`` is the
    integer-micro score (monotone in true BM25 up to the documented
    integer floor per term) and ``n_terms`` counts matched query terms.
    Ties break (score DESC, doc_id ASC)."""
    if k1_x10 * (100 - b_x100) % 100 or k1_x10 * b_x100 % 100:
        raise ValueError(
            "k1_x10/b_x100 must make k1*(1-b) and k1*b exact tenths: "
            f"got k1_x10={k1_x10}, b_x100={b_x100}"
        )
    c1 = k1_x10 * (100 - b_x100) // 100
    c2 = k1_x10 * b_x100 // 100
    terms = sorted(set(query_terms))

    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(T.normalized_text(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    qtoks = toks.filter(F.col("tok").isin(list(terms)))
    tf = qtoks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    stats = toks.agg(F.count("*").alias("total")).crossJoin(
        docs.agg(F.count("*").alias("n_docs"))
    )

    idf_micro = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        * IDF_MICRO
    ).cast("long")
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("idf_micro", idf_micro)
        .withColumn(
            "num",
            F.lit(10 + k1_x10) * F.col("idf_micro") * F.col("tf") * F.col("total"),
        )
        .withColumn(
            "den",
            F.lit(10) * F.col("total") * F.col("tf")
            + F.lit(c1) * F.col("total")
            + F.lit(c2) * F.col("dl") * F.col("n_docs"),
        )
        .withColumn("contrib", F.expr("num DIV den"))
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_terms"),
        F.sum("contrib").alias("bm25_scaled"),
    )
    return (
        agg.orderBy(F.desc("bm25_scaled"), F.asc(id_col))
        .limit(k)
        .select(
            F.col(id_col),
            F.col("n_terms").cast("long"),
            F.col("bm25_scaled").cast("long"),
        )
    )
