"""Binary quantization: sign-bit compression + Hamming-distance serving.

The third compression leg of the ANN toolbox, next to PQ (operators/pq.py)
and IVF (operators/ann.py): every dimension of a float64 vector becomes ONE
BIT (1 if the coordinate exceeds its threshold, default 0.0 — the corpus
embeddings are zero-centered), so a 64-dim row (512 B) packs into one
BIGINT (8 B, 64× compression). Distance in the compressed domain is
Hamming — ``bit_count(code XOR query_code)`` — a single popcount
instruction JVM-side; under the sign-bit map Hamming distance is a
monotone estimate of angular distance (Charikar, STOC 2002: the SimHash
collision bound P[bit equal] = 1 - θ/π, the same bound the dedup family's
SimHash already relies on at operators/dedup.py). The serving shape is the
PQ discipline: Hamming shortlist over the 8-byte code column only → exact
re-score of ~shortlist rows → top-k.

Everything here is INTEGER arithmetic after the one float comparison per
dimension at encode time, so every query in the family hash-checks against
DuckDB bit-for-bit with no IEEE-ordering care (xor/bit_count agree on
two's-complement BIGINTs across both engines — verified).

The reference serves uncompressed float32 (reference src/vectordb/
ann.py:21-102); binary quantization is the piece a 100 TB corpus adds: the
code table is ~1.6 % the bytes of the vector table, the shortlist pass
scans 8 B/row with a popcount, and only ~shortlist rows of the vector
column are ever read per query.

Vectors wider than 64 dims pack into ``ceil(dim/64)`` words
(array<bigint>); Hamming is then the sum of per-word popcounts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import vector as V

_SIGN_BIT = -(1 << 63)  # 1<<63 as a signed two's-complement BIGINT


def _bit_value(i: int) -> int:
    """Bit i of a signed 64-bit word as the Python int Spark/DuckDB store:
    bit 63 is the sign bit, so its contribution is -(2**63)."""
    return _SIGN_BIT if i == 63 else 1 << i


def n_words(dim: int) -> int:
    return (dim + 63) // 64


def bq_encode_word_expr(
    vector_col: Column | str,
    word: int,
    dim: int,
    thresholds: Sequence[float] | None = None,
) -> Column:
    """Word ``word`` of the packed sign-bit code as ONE BIGINT: bit i set
    iff v[64*word + i] > threshold (strict — ties fall to 0 in both
    engines). A pure scan-side Column expression: the distinct-bit terms
    sum without carries, so the fold is exactly a bitwise OR and encoding
    a 100 TB corpus is one codegen'd projection — no shuffle, no Python."""
    lo = 64 * word
    hi = min(dim, lo + 64)
    if isinstance(vector_col, str):
        # single server-side parse (round-11 driver-latency fix): same
        # CASE-per-bit chain, same left association, same strict >
        v_sql = V.as_double_sql(f"`{vector_col}`")
        total_s = "CAST(0 AS BIGINT)"
        for pos in range(lo, hi):
            thr = 0.0 if thresholds is None else float(thresholds[pos])
            bit = pos - lo
            term = (
                f"CASE WHEN element_at({v_sql}, {pos + 1}) > "
                f"{V.sql_double(thr)} THEN CAST({_bit_value(bit)} AS BIGINT) "
                f"ELSE CAST(0 AS BIGINT) END"
            )
            total_s = f"({total_s} + {term})"
        return F.expr(total_s)
    v = V.as_double(vector_col)
    total = F.lit(0).cast("bigint")
    for pos in range(lo, hi):
        thr = 0.0 if thresholds is None else float(thresholds[pos])
        bit = pos - lo
        total = total + F.when(
            F.element_at(v, pos + 1) > F.lit(thr),
            F.lit(_bit_value(bit)).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
    return total


def bq_encode_expr(
    vector_col: Column | str,
    dim: int,
    thresholds: Sequence[float] | None = None,
) -> Column:
    """Packed sign-bit code: one BIGINT for dim <= 64, else array<bigint>
    of ``n_words(dim)`` words (word w holds dims 64w..64w+63, bit i =
    dimension 64w+i)."""
    if thresholds is not None and len(thresholds) != dim:
        raise ValueError(f"thresholds len {len(thresholds)} != dim {dim}")
    words = [
        bq_encode_word_expr(vector_col, w, dim, thresholds)
        for w in range(n_words(dim))
    ]
    return words[0] if len(words) == 1 else F.array(*words)


def bq_query_code(
    vector: Sequence[float], thresholds: Sequence[float] | None = None
) -> list[int]:
    """Driver-side encode of a query vector — same strict-> comparison and
    bit layout as :func:`bq_encode_expr`, returned as one int per word."""
    dim = len(vector)
    out = []
    for w in range(n_words(dim)):
        word = 0
        for bit in range(min(dim, 64 * w + 64) - 64 * w):
            pos = 64 * w + bit
            thr = 0.0 if thresholds is None else float(thresholds[pos])
            if float(vector[pos]) > thr:
                word += _bit_value(bit)
        out.append(word)
    return out


def bq_encode(
    df: DataFrame,
    dim: int,
    thresholds: Sequence[float] | None = None,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    code_col: str = "bq_code",
) -> DataFrame:
    """(id, packed sign-bit code) for the corpus — the index-time pass."""
    return df.select(
        F.col(id_col), bq_encode_expr(vector_col, dim, thresholds).alias(code_col)
    )


def hamming_expr(code_col: Column | str, query_code: Sequence[int]) -> Column:
    """Hamming distance to a driver-side query code: popcount of the XOR,
    summed across words. INT-typed (<= dim)."""
    code = F.col(code_col) if isinstance(code_col, str) else code_col
    if len(query_code) == 1:
        return F.bit_count(code.bitwiseXOR(F.lit(int(query_code[0])).cast("bigint")))
    total = None
    for w, qw in enumerate(query_code):
        term = F.bit_count(
            F.element_at(code, w + 1).bitwiseXOR(F.lit(int(qw)).cast("bigint"))
        )
        total = term if total is None else total + term
    return total


def hamming_col_expr(a: Column | str, b: Column | str, words: int = 1) -> Column:
    """Hamming distance between two packed CODE COLUMNS (the batch-join
    form: neither side is a literal)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    if words == 1:
        return F.bit_count(ca.bitwiseXOR(cb))
    total = None
    for w in range(words):
        term = F.bit_count(
            F.element_at(ca, w + 1).bitwiseXOR(F.element_at(cb, w + 1))
        )
        total = term if total is None else total + term
    return total


def knn_hamming(
    df: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    thresholds: Sequence[float] | None = None,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    codes: DataFrame | None = None,
    code_col: str = "bq_code",
) -> DataFrame:
    """Hamming top-k in the compressed domain: smallest distance first
    (asc dist, asc id — a total order, so the cut is deterministic). With
    ``codes`` set only the 8-byte code column is scanned; otherwise codes
    are computed on the fly from the vector column."""
    qc = bq_query_code(query_vector, thresholds)
    if codes is not None:
        src, code = codes, F.col(code_col)
    else:
        src = df
        code = bq_encode_expr(vector_col, len(query_vector), thresholds)
    return (
        src.select(F.col(id_col), hamming_expr(code, qc).alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc(id_col))
        .limit(k)
    )


def knn_hamming_rerank(
    df: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    shortlist: int = 50,
    metric: str = "cosine",
    thresholds: Sequence[float] | None = None,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    codes: DataFrame | None = None,
    code_col: str = "bq_code",
) -> DataFrame:
    """The production binary-quantization serving shape: Hamming shortlist
    (code column only, TakeOrderedAndProject — per-partition popcount
    top-N, no global sort) → exact re-score of the shortlist rows (left-
    semi on the id, reads ~shortlist rows of the vector column) → top-k.
    Recall is set by ``shortlist``; the Charikar bound makes Hamming rank
    track angular rank, so modest shortlists recover exact cosine order."""
    short = knn_hamming(
        df, query_vector, k=shortlist, thresholds=thresholds,
        id_col=id_col, vector_col=vector_col, codes=codes, code_col=code_col,
    ).select(id_col)
    from . import knn as K

    return K.knn(
        df.join(short, id_col, "left_semi"), query_vector, k=k,
        metric=metric, vector_col=vector_col, id_col=id_col,
    )


def knn_join_hamming(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    shortlist: int = 50,
    metric: str = "cosine",
    thresholds: Sequence[float] | None = None,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    codes: DataFrame | None = None,
    code_col: str = "bq_code",
) -> DataFrame:
    """Batch Hamming serving: every query row carries its own packed code
    (the same scan-side encode expression — no per-query literals), the
    query side BROADCASTS against the corpus code table, pair distances
    are one popcount per word, per-query shortlist runs as a window
    (WindowGroupLimit: map-side partial top-N before the Exchange), and
    only shortlist rows are reranked against the float vectors. At scale
    the broadcast is (qid, 8 B code, vector) per query and the corpus side
    moves 8-byte codes."""
    from pyspark.sql import Window

    words = n_words(dim)
    qd = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        bq_encode_expr(query_vec_col, dim, thresholds).alias("_qcode"),
    )
    if codes is None:
        codes = bq_encode(
            corpus, dim, thresholds,
            id_col=id_col, vector_col=vector_col, code_col=code_col,
        )
    pairs = codes.join(F.broadcast(qd)).select(
        query_id_col, query_vec_col, id_col,
        hamming_col_expr(F.col(code_col), F.col("_qcode"), words).alias("hamming"),
    )
    ws = Window.partitionBy(query_id_col).orderBy(F.asc("hamming"), F.asc(id_col))
    short = (
        pairs.withColumn("_srn", F.row_number().over(ws))
        .filter(F.col("_srn") <= shortlist)
        .select(query_id_col, query_vec_col, id_col)
    )
    rescored = short.join(corpus.select(id_col, vector_col), id_col).select(
        query_id_col,
        F.col(id_col),
        V.similarity(
            metric, V.as_double(vector_col), V.as_double(query_vec_col)
        ).alias("score"),
    )
    wk = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        rescored.withColumn("rank", F.row_number().over(wk).cast("int"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "score")
    )


def asym_score_expr(
    code_col: Column | str,
    query_vec_col: Column | str,
    dim: int,
) -> Column:
    """Asymmetric binary score: the query keeps FULL float precision while
    the corpus side stays 1 bit/dim — score = Σ_i ±q_i with the sign taken
    from bit i of the packed code (equals dot(q, sign(v)), the asymmetric
    distance computation of binary codes; recall at a fixed shortlist is
    substantially higher than symmetric Hamming because no query
    information is quantized away, at identical storage). Built as a
    LEFT-ASSOCIATED chain of per-bit conditionals so the SQL oracle can
    parenthesize identically (the ADC-sum discipline); works with a query
    VECTOR COLUMN, so batch joins need no per-query literals."""
    words = n_words(dim)
    if isinstance(code_col, str) and isinstance(query_vec_col, str):
        return F.expr(asym_score_sql(
            f"`{code_col}`", V.as_double_sql(f"`{query_vec_col}`"), dim
        ))
    code = F.col(code_col) if isinstance(code_col, str) else code_col
    qv = V.as_double(query_vec_col)
    total = None
    for pos in range(dim):
        w, bit = pos // 64, pos % 64
        word = code if words == 1 else F.element_at(code, w + 1)
        q_i = F.element_at(qv, pos + 1)
        term = F.when(
            F.shiftright(word, bit).bitwiseAND(F.lit(1)) == 1, q_i
        ).otherwise(-q_i)
        total = term if total is None else total + term
    return total


def asym_score_sql(code_sql: str, qv_sql: str, dim: int) -> str:
    """SQL form of :func:`asym_score_expr` — same left-associated per-bit
    conditional chain (``code_sql`` BIGINT or ARRAY<BIGINT>, ``qv_sql``
    ARRAY<DOUBLE>)."""
    words = n_words(dim)
    total = None
    for pos in range(dim):
        w, bit = pos // 64, pos % 64
        word = code_sql if words == 1 else f"element_at({code_sql}, {w + 1})"
        q_i = f"element_at({qv_sql}, {pos + 1})"
        term = (
            f"CASE WHEN (shiftright({word}, {bit}) & 1) = 1 "
            f"THEN {q_i} ELSE -{q_i} END"
        )
        total = term if total is None else f"({total} + {term})"
    return total


def knn_bq_asym(
    df: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    shortlist: int = 50,
    metric: str = "cosine",
    thresholds: Sequence[float] | None = None,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    codes: DataFrame | None = None,
    code_col: str = "bq_code",
) -> DataFrame:
    """Asymmetric-binary serving: score codes against the FLOAT query
    (highest score first, ties id ASC) for the shortlist, then exact
    re-score of shortlist rows — same 8-byte storage as knn_hamming_rerank
    with materially higher recall at the same shortlist (measured in
    BASELINE.md). The query vector rides as one array literal; the
    shortlist pass still never reads the corpus vector column."""
    dim = len(query_vector)
    if codes is not None:
        src = codes
    else:
        # stage the packed code as a named column so the asym chain takes
        # the single-parse SQL path (round-11 driver-latency fix)
        src = df.withColumn(
            code_col, bq_encode_expr(vector_col, dim, thresholds)
        )
    q_sql = V.sql_array_double([float(x) for x in query_vector])
    short = (
        src.select(
            F.col(id_col),
            F.expr(asym_score_sql(f"`{code_col}`", q_sql, dim)).alias("asym"),
        )
        .orderBy(F.desc("asym"), F.asc(id_col))
        .limit(shortlist)
        .select(id_col)
    )
    from . import knn as K

    return K.knn(
        df.join(short, id_col, "left_semi"), query_vector, k=k,
        metric=metric, vector_col=vector_col, id_col=id_col,
    )


def knn_join_bq_asym(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    shortlist: int = 50,
    metric: str = "cosine",
    thresholds: Sequence[float] | None = None,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    codes: DataFrame | None = None,
    code_col: str = "bq_code",
) -> DataFrame:
    """Batch asymmetric-binary serving: the query side broadcasts with its
    float vectors (no code quantization of the query at all), pair scores
    are the per-bit conditional chain over (code, query-vector column),
    per-query shortlist as a WindowGroupLimit, exact rerank of shortlist
    rows."""
    from pyspark.sql import Window

    if codes is None:
        codes = bq_encode(
            corpus, dim, thresholds,
            id_col=id_col, vector_col=vector_col, code_col=code_col,
        )
    qd = queries.select(query_id_col, query_vec_col)
    pairs = codes.join(F.broadcast(qd)).select(
        query_id_col, query_vec_col, id_col,
        asym_score_expr(code_col, query_vec_col, dim).alias("asym"),
    )
    ws = Window.partitionBy(query_id_col).orderBy(F.desc("asym"), F.asc(id_col))
    short = (
        pairs.withColumn("_srn", F.row_number().over(ws))
        .filter(F.col("_srn") <= shortlist)
        .select(query_id_col, query_vec_col, id_col)
    )
    rescored = short.join(corpus.select(id_col, vector_col), id_col).select(
        query_id_col,
        F.col(id_col),
        V.similarity(
            metric, V.as_double(vector_col), V.as_double(query_vec_col)
        ).alias("score"),
    )
    wk = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        rescored.withColumn("rank", F.row_number().over(wk).cast("int"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "score")
    )


def knn_ivf_hamming(
    corpus: DataFrame,
    query_vector: Sequence[float],
    centroids: Sequence[Sequence[float]],
    k: int = 10,
    nprobe: int = 2,
    shortlist: int = 50,
    metric: str = "cosine",
    thresholds: Sequence[float] | None = None,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    codes: DataFrame | None = None,
    cell_col: str = "centroid_id",
    code_col: str = "bq_code",
) -> DataFrame:
    """IVF × binary quantization — the two pruning axes composed exactly
    as IVF-PQ composes them (operators/pq.py knn_ivfpq): IVF prunes WHICH
    rows the probe scans (nprobe/n_cells of the corpus; partition pruning
    when the code table is written partitionBy(cell)), the sign-bit code
    shrinks WHAT each probed row costs (8 B + one popcount). Probed cells
    are computed driver-side from the literal query (probe_cells — the
    same total order as the SQL oracle); Hamming shortlist over probed
    codes only; exact rerank of shortlist rows."""
    from .pq import assign_cells_expr, probe_cells

    dim = len(query_vector)
    if codes is None:
        codes = corpus.select(
            F.col(id_col),
            assign_cells_expr(vector_col, centroids).alias(cell_col),
            bq_encode_expr(vector_col, dim, thresholds).alias(code_col),
        )
    probed = probe_cells(query_vector, centroids, nprobe)
    qc = bq_query_code(query_vector, thresholds)
    short = (
        codes.filter(F.col(cell_col).isin([int(p) for p in probed]))
        .select(F.col(id_col), hamming_expr(F.col(code_col), qc).alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc(id_col))
        .limit(shortlist)
        .select(id_col)
    )
    from . import knn as K

    return K.knn(
        corpus.join(short, id_col, "left_semi"), query_vector, k=k,
        metric=metric, vector_col=vector_col, id_col=id_col,
    )
