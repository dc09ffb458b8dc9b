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

from educational_vector_database_spark import rag
from educational_vector_database_spark.embeddings import DummyEmbeddings, _dummy_vector
from educational_vector_database_spark.operators import dedup as D
from educational_vector_database_spark.operators import knn as K
from educational_vector_database_spark.session import load_table

DIM = 64
TOP_K = 10
DUMMY_DIM = 16  # reference server.py:32 fallback dim
CHUNK_SIZE = 300  # reference rag.py:31
RAG_QUERY = "spark filter join window"  # deterministic fixture query string

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


def _dummy_sum_values(max_len: int = 800) -> str:
    """VALUES table ``(text_len, emb_sum)`` for the dummy embedding: the UDF is
    deterministic in text length only (reference embeddings.py:25-27), so its
    left-fold element sum per length is a precomputable literal — this makes
    even the pandas-UDF path bit-exact oracle-checkable."""
    rows = []
    for n in range(max_len + 1):
        s = 0.0
        for x in _dummy_vector(n, DUMMY_DIM):
            s += float(x)
        # string literal -> direct decimal-string->binary64 parse; a bare
        # numeric literal would go through DECIMAL and lose low bits
        rows.append(f"({n}, CAST('{s!r}' AS DOUBLE))")
    return f"(VALUES {', '.join(rows)}) AS emb_map(text_len, emb_sum)"


def _dummy_vec_values(max_len: int = 310) -> str:
    """VALUES table ``(text_len, v DOUBLE[])`` of full dummy vectors, for
    oracles that need the actual embedding (RAG scoring over chunks, whose
    lengths are <= chunk_size)."""
    rows = []
    for n in range(max_len + 1):
        vec = ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in _dummy_vector(n, DUMMY_DIM))
        rows.append(f"({n}, [{vec}])")
    return f"(VALUES {', '.join(rows)}) AS emb_map(text_len, v)"


def _rag_context_oracle() -> str:
    """The whole RAG read path in SQL: chunk -> embed (literal map) -> cosine
    top-3 -> best-first string_agg context + placeholder answer."""
    qv = ", ".join(repr(float(x)) for x in _dummy_vector(len(RAG_QUERY), DUMMY_DIM))
    cos = _COS.format(a="emb_map.v", b=f"[{qv}]::DOUBLE[]")
    return f"""
        WITH chunks AS (
            SELECT d.doc_id * 100000 + t.i AS chunk_id,
                   substr(d.text, CAST(t.i * {CHUNK_SIZE} + 1 AS INT), {CHUNK_SIZE}) AS chunk
            FROM documents d,
                 unnest(range(0, greatest(1,
                        CAST(ceil(length(d.text) / {CHUNK_SIZE}.0) AS BIGINT)))) AS t(i)
        ),
        scored AS (
            SELECT c.chunk_id, c.chunk, {cos} AS score
            FROM chunks c JOIN {_dummy_vec_values()}
              ON length(c.chunk) = emb_map.text_len
        ),
        topk AS (
            SELECT * FROM scored ORDER BY score DESC, chunk_id ASC LIMIT 3
        )
        SELECT string_agg(chunk, e'\\n---\\n' ORDER BY score DESC, chunk_id ASC)
                   AS combined_context,
               'This is a placeholder answer. Relevant context:' || chr(10) ||
               string_agg(chunk, e'\\n---\\n' ORDER BY score DESC, chunk_id ASC)
                   AS answer
        FROM topk
    """


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rag.chunk_documents(_docs(spark, sf_dir), CHUNK_SIZE)


def _embed_dummy(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = DummyEmbeddings(DUMMY_DIM)
    df = _docs(spark, sf_dir).select(
        "doc_id",
        F.length("text").alias("text_len"),
        emb.embed_col("text").alias("embedding"),
    )
    return df.select(
        "doc_id",
        "text_len",
        F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x).alias("emb_sum"),
    )


def _rag_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = DummyEmbeddings(DUMMY_DIM)
    chunks = rag.build_rag_index(_docs(spark, sf_dir), emb, CHUNK_SIZE)
    qv = [float(x) for x in emb.embed(RAG_QUERY)]
    return rag.assemble_context(rag.retrieve(chunks, qv, k=3))


def _docs_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.avg("n_chars").alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


# --- dedup queries (training-data-pipeline extensions) ----------------------

# SQL building blocks mirroring functions/text.py normalization + n-gramming
_NORM = (
    "trim(regexp_replace(regexp_replace(lower({t}), '[^a-z0-9\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)


def _dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.dedup_exact(_docs(spark, sf_dir))


def _dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_near_dup(_docs(spark, sf_dir), threshold=0.5)


def _dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5)


def _dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_near_dup(_docs(spark, sf_dir), max_hamming=3)


def _neardup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.embedding_near_dup(_emb(spark, sf_dir), threshold=0.45)


_DEDUP_EXACT_ORACLE = """
    WITH fp AS (
        SELECT doc_id, substr(md5(text), 1, 15) AS h FROM documents
    ),
    fpv AS (
        SELECT doc_id,
               CAST(sum(CAST(strpos('0123456789abcdef',
                             substr(h, CAST(i AS INT), 1)) - 1 AS HUGEINT)
                        << (4 * (15 - CAST(i AS INT)))) AS BIGINT) AS fp
        FROM fp, unnest(range(1, 16)) AS t(i)
        GROUP BY doc_id
    )
    SELECT fp, min(doc_id) AS doc_id, count(*) AS n_copies
    FROM fpv GROUP BY fp
"""

_MINHASH_ORACLE = f"""
    WITH norm AS (
        SELECT doc_id AS id, {_NORM.format(t='text')} AS t FROM documents
    ),
    sh AS (
        SELECT id, list_distinct([substr(t, CAST(i AS INT), 5)
                   for i in range(1, greatest(2, length(t) - 3))]) AS sh
        FROM norm
    ),
    sig AS (
        SELECT id, sh,
               [list_min(list_transform(sh, s -> md5(seed || '|' || s)))
                for seed in range(0, 8)] AS sig
        FROM sh
    ),
    bands AS (
        SELECT id, CAST(b AS INT) AS band_idx,
               sig[CAST(2*b+1 AS INT)] || '|' || sig[CAST(2*b+2 AS INT)] AS band_key
        FROM sig, unnest(range(0, 4)) AS t(b)
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.id < b.id
    )
    SELECT c.id_a, c.id_b,
           CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
           CAST(len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)) AS DOUBLE)
               AS jaccard
    FROM cand c JOIN sh x ON c.id_a = x.id JOIN sh y ON c.id_b = y.id
    WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
          CAST(len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)) AS DOUBLE) >= 0.5
"""

_NGRAM_ORACLE = f"""
    WITH norm AS (
        SELECT doc_id AS id, string_split({_NORM.format(t='text')}, ' ') AS w
        FROM documents
    ),
    ngl AS (
        SELECT id, list_distinct([concat_ws(' ', w[CAST(i+1 AS INT)],
                                  w[CAST(i+2 AS INT)], w[CAST(i+3 AS INT)])
                   for i in range(0, greatest(1, len(w) - 2))]) AS gs
        FROM norm
    ),
    grams AS (SELECT id, unnest(gs) AS g FROM ngl),
    sizes AS (SELECT id, count(*) AS sz FROM grams GROUP BY id),
    common AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS c
        FROM grams a JOIN grams b ON a.g = b.g AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT id_a, id_b,
           CAST(c AS DOUBLE) / CAST(sa.sz + sb.sz - c AS DOUBLE) AS jaccard
    FROM common
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE CAST(c AS DOUBLE) / CAST(sa.sz + sb.sz - c AS DOUBLE) >= 0.5
"""

_SIMHASH_ORACLE = f"""
    WITH norm AS (
        SELECT doc_id AS id, {_NORM.format(t='text')} AS t FROM documents
    ),
    toks AS (
        SELECT id, unnest(list_distinct(string_split(t, ' '))) AS w FROM norm
    ),
    tokh AS (SELECT id, md5(w) AS h FROM toks),
    ntok AS (SELECT id, count(*) AS n FROM tokh GROUP BY id),
    bits AS (
        SELECT id, CAST(p AS INT) AS p, CAST(k AS INT) AS k,
               sum(CASE WHEN ((strpos('0123456789abcdef',
                               substr(h, CAST(p+1 AS INT), 1)) - 1) >> CAST(k AS INT)) & 1 = 1
                        THEN 1 ELSE 0 END) AS cnt
        FROM tokh, unnest(range(0, 16)) AS pp(p), unnest(range(0, 4)) AS kk(k)
        GROUP BY id, p, k
    ),
    nib AS (
        SELECT b.id, b.p,
               CAST(sum(CASE WHEN 2 * b.cnt > n.n THEN 1 << b.k ELSE 0 END) AS INT) AS v
        FROM bits b JOIN ntok n USING (id) GROUP BY b.id, b.p
    ),
    sh AS (
        SELECT id, string_agg(substr('0123456789abcdef', v + 1, 1), '' ORDER BY p) AS sh
        FROM nib GROUP BY id
    ),
    bands AS (
        SELECT id, sh, CAST(b AS INT) AS band_idx,
               substr(sh, CAST(4*b+1 AS INT), 4) AS band_key
        FROM sh, unnest(range(0, 4)) AS t(b)
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.id < b.id
    ),
    ham AS (
        SELECT id_a, id_b,
               CAST(sum(bit_count(xor(
                    strpos('0123456789abcdef', substr(sh_a, CAST(p AS INT), 1)) - 1,
                    strpos('0123456789abcdef', substr(sh_b, CAST(p AS INT), 1)) - 1
               ))) AS INT) AS hamming
        FROM cand, unnest(range(1, 17)) AS t(p)
        GROUP BY id_a, id_b
    )
    SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3
"""

_NEARDUP_EMB_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_COS.format(a="a.v", b="b.v")} AS score
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {_COS.format(a="a.v", b="b.v")} >= 0.45
"""


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
        "chunk_documents": _chunk_documents,
        "embed_dummy": _embed_dummy,
        "rag_context": _rag_context,
        "docs_stats_by_lang": _docs_stats_by_lang,
        "dedup_exact": _dedup_exact,
        "dedup_minhash": _dedup_minhash,
        "dedup_ngram": _dedup_ngram,
        "dedup_simhash": _dedup_simhash,
        "neardup_embedding": _neardup_embedding,
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
        "chunk_documents": f"""
            SELECT d.doc_id,
                   CAST(t.i AS INT) AS chunk_index,
                   substr(d.text, CAST(t.i * {CHUNK_SIZE} + 1 AS INT), {CHUNK_SIZE}) AS chunk
            FROM documents d,
                 unnest(range(0, greatest(1,
                        CAST(ceil(length(d.text) / {CHUNK_SIZE}.0) AS BIGINT)))) AS t(i)
        """,
        "embed_dummy": f"""
            SELECT d.doc_id, CAST(length(d.text) AS INT) AS text_len, emb_map.emb_sum
            FROM documents d JOIN {_dummy_sum_values()}
              ON length(d.text) = emb_map.text_len
        """,
        "rag_context": _rag_context_oracle(),
        "docs_stats_by_lang": """
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   avg(n_chars) AS avg_chars,
                   min(n_chars) AS min_chars,
                   max(n_chars) AS max_chars
            FROM documents
            GROUP BY lang
        """,
        "dedup_exact": _DEDUP_EXACT_ORACLE,
        "dedup_minhash": _MINHASH_ORACLE,
        "dedup_ngram": _NGRAM_ORACLE,
        "dedup_simhash": _SIMHASH_ORACLE,
        "neardup_embedding": _NEARDUP_EMB_ORACLE,
    }
