"""Chunker / embeddings / RAG pipeline tests (reference tests/test_basic.py,
tests/test_v3_features.py:49-65)."""

import numpy as np
from pyspark.sql import functions as F

from educational_vector_database_spark import rag
from educational_vector_database_spark.embeddings import DummyEmbeddings
from educational_vector_database_spark.functions import text as T


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_chunker_matches_reference_semantics(spark):
    # reference rag.py:17-24: [text[i:i+cs] for i in range(0, len(text), cs)]
    cases = ["", "ab", "abcdef", "abcdefg", "x" * 300, "x" * 301]
    df = _docs(spark, [(i, t) for i, t in enumerate(cases)])
    got = {
        r.doc_id: r.chunks
        for r in df.select("doc_id", T.chunk_array("text", 3).alias("chunks")).collect()
    }
    for i, t in enumerate(cases):
        expected = [t[j : j + 3] for j in range(0, len(t), 3)] or [""]
        assert got[i] == expected, (i, t[:10])


def test_chunk_documents_explodes_with_index(spark):
    df = _docs(spark, [(7, "abcdefg")])
    rows = rag.chunk_documents(df, chunk_size=3).collect()
    assert [(r.doc_id, r.chunk_index, r.chunk) for r in rows] == [
        (7, 0, "abc"), (7, 1, "def"), (7, 2, "g")
    ]


def test_dummy_embeddings_match_reference_rng(spark):
    # reference embeddings.py:25-27: np.random.seed(len(text)); np.random.rand(dim)
    emb = DummyEmbeddings(8)
    np.random.seed(5)
    expected = np.random.rand(8)
    assert np.array_equal(emb.embed("hello"), expected)
    # same through the pandas UDF
    df = _docs(spark, [(0, "hello"), (1, "world"), (2, "")])
    out = {r.doc_id: r.e for r in df.select("doc_id", emb.embed_col("text").alias("e")).collect()}
    assert out[0] == expected.tolist()
    assert out[0] == out[1]  # equal-length texts share vectors (reference quirk)
    np.random.seed(0)
    assert out[2] == np.random.rand(8).tolist()


def test_build_rag_index_and_answer(spark):
    # reference test_v3_features.py:49-65 shape checks
    emb = DummyEmbeddings(8)
    docs = _docs(spark, [(0, "alpha beta gamma delta " * 5), (1, "spark sql engine " * 8)])
    chunks = rag.build_rag_index(docs, emb, chunk_size=50)
    assert chunks.columns == ["doc_id", "chunk_index", "chunk_id", "chunk", "embedding"]
    n = chunks.count()
    assert n >= 2
    ans = rag.answer_query(chunks, emb, "alpha beta", k=3)
    assert set(ans) == {"query", "chunks", "combined_context", "answer"}
    assert len(ans["chunks"]) == 3
    assert ans["answer"].startswith(rag.ANSWER_PREFIX)
    assert ans["combined_context"].count(rag.CONTEXT_SEP) == 2
    scores = [c["score"] for c in ans["chunks"]]
    assert scores == sorted(scores, reverse=True)


def test_assemble_context_order_is_best_first(spark):
    topk = spark.createDataFrame(
        [(3, "worst", 0.1), (1, "best", 0.9), (2, "mid", 0.5)],
        "chunk_id: long, chunk: string, score: double",
    )
    row = rag.assemble_context(topk).head()
    assert row.combined_context == "best\n---\nmid\n---\nworst"
    assert row.answer == rag.ANSWER_PREFIX + row.combined_context


def test_answer_query_df_matches_dict_form(spark):
    """answer_query_df (the gated one-row DataFrame form) carries exactly
    the reference answer_query result shape: same ordered chunk ids/scores,
    same combined_context and answer as the dict API."""
    emb = DummyEmbeddings(8)
    docs = _docs(spark, [(0, "alpha beta gamma delta " * 5), (1, "spark sql engine " * 8)])
    chunks = rag.build_rag_index(docs, emb, chunk_size=50)
    want = rag.answer_query(chunks, emb, "alpha beta", k=3)
    row = rag.answer_query_df(chunks, emb, "alpha beta", k=3).head()
    assert row.query == want["query"]
    assert row.n_chunks == len(want["chunks"])
    assert row.chunk_ids_csv == ",".join(str(c["id"]) for c in want["chunks"])
    assert row.chunk_scores_pico_csv == ",".join(
        str(int(np.floor(c["score"] * 1e12))) for c in want["chunks"]
    )
    assert row.combined_context == want["combined_context"]
    assert row.answer == want["answer"]


def test_retrieve_diverse_skips_duplicate_chunks(spark):
    """A chunk store whose two most relevant chunks are copies of each
    other: plain retrieve() fills the context with both copies,
    retrieve_diverse() picks one copy then moves to different material —
    and the assembled context is ordered by SELECTION rank with the
    reference separator/prefix. Hand-crafted 2-d geometry so the margins
    are unambiguous: copies at cos 0.995 to the query (mutual sim 1.0),
    novel chunk at cos 0.9 (sim 0.852 to the copies)."""
    chunks = spark.createDataFrame(
        [
            (0, "copy A", [0.995, 0.0999]),
            (1, "copy B", [0.995, 0.0999]),
            (2, "novel", [0.9, -0.436]),
        ],
        "chunk_id: long, chunk: string, embedding: array<double>",
    )
    qv = [1.0, 0.0]
    plain = [r.chunk_id for r in rag.retrieve(chunks, qv, k=2).collect()]
    assert plain == [0, 1]
    sel = rag.retrieve_diverse(chunks, qv, k=2, lam=0.5, pool=3)
    rows = sorted(sel.collect(), key=lambda r: r.rank)
    # step 2 at lam=0.5: copy B scores 0.5*0.995 - 0.5*1.0 < 0 while the
    # novel chunk scores 0.5*0.9 - 0.5*0.852 > 0 -> diversity wins
    assert [r.chunk_id for r in rows] == [0, 2]
    ctx = rag.assemble_context_diverse(sel).head()
    assert ctx.n_chunks == 2
    assert ctx.chunk_ids_csv == "0,2"
    assert ctx.combined_context == "copy A" + rag.CONTEXT_SEP + "novel"
    assert ctx.answer == rag.ANSWER_PREFIX + ctx.combined_context
