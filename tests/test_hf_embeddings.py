"""HFEmbeddings contract tests (reference embeddings.py:30-52, server.py:25-32).

sentence-transformers is an OPTIONAL dependency (the reference treats it the
same way); the integration tests skip cleanly where it is absent and run for
real where it is installed, catching signature drift in the SentenceTransformer
API. The fallback test runs everywhere — it IS this container's real path.
"""

import pytest

from educational_vector_database_spark.embeddings import (
    DEFAULT_DUMMY_DIM,
    DummyEmbeddings,
    default_embeddings,
)


def _st_installed() -> bool:
    try:
        import sentence_transformers  # noqa: F401

        return True
    except ImportError:
        return False


def test_default_embeddings_falls_back_to_dummy():
    """The reference server's load path (server.py:25-32): HF when
    importable, deterministic dummy otherwise. In an environment without
    sentence-transformers this must return DummyEmbeddings, never raise."""
    emb = default_embeddings()
    if _st_installed():
        pytest.skip("sentence-transformers present: fallback path not taken")
    assert isinstance(emb, DummyEmbeddings)
    assert emb.dim == DEFAULT_DUMMY_DIM


def test_hf_embeddings_contract(spark):
    """Runs only where sentence-transformers is installed: dim is reported
    by the model, embed() returns a dim-length float vector, and the
    pandas UDF produces array<double> of the same dim."""
    pytest.importorskip("sentence_transformers")
    from pyspark.sql import functions as F

    from educational_vector_database_spark.embeddings import HFEmbeddings

    emb = HFEmbeddings()
    v = emb.embed("hello world")
    assert v.shape == (emb.dim,)

    df = spark.createDataFrame([("a", "hello"), ("b", "world")], "id string, text string")
    out = df.select(F.size(emb.udf()(F.col("text"))).alias("d")).collect()
    assert all(r.d == emb.dim for r in out)


class _Hash384Embeddings(DummyEmbeddings):
    """MiniLM-WIDTH fixture embedder (dim=384) for the composed-pipeline
    test: deterministic per full TEXT (RandomState seeded by an md5 of the
    text), unlike DummyEmbeddings' len(text) seeding which collapses
    same-length chunks to identical vectors and would make id-level recall
    assertions tie-ambiguous. Width and UDF shape are what the real
    HFEmbeddings (all-MiniLM-L6-v2, 384-dim) produces."""

    def __init__(self):
        super().__init__(dim=384)

    @staticmethod
    def _seed(text: str) -> int:
        import hashlib

        return int.from_bytes(
            hashlib.md5((text or "").encode()).digest()[:4], "big"
        )

    def embed(self, text: str):
        import numpy as np

        return np.random.RandomState(self._seed(text)).rand(self.dim)

    def udf(self):
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql.types import ArrayType, DoubleType

        dim = self.dim

        # fully self-contained closure: no reference back into this test
        # module (which is not importable on executor workers)
        @F.pandas_udf(ArrayType(DoubleType()))
        def hash_embed(texts: pd.Series) -> pd.Series:
            import hashlib

            import numpy as np

            def vec(t):
                s = int.from_bytes(
                    hashlib.md5((t or "").encode()).digest()[:4], "big"
                )
                return np.random.RandomState(s).rand(dim).tolist()

            return texts.map(vec)

        return hash_embed


def test_composed_pipeline_dim384(spark, sf_dir):
    """VERDICT r8 next-round #7: the reference's REAL pipeline shape —
    chunk -> 384-dim embed -> two-level index -> serve — composed end to
    end at MiniLM width (the DIM384 rehearsals validated components, not
    the composition). Uses the deterministic 384-wide fixture embedder;
    the HF twin below runs the identical composition where
    sentence-transformers is installed."""
    from pyspark.sql import functions as F

    from educational_vector_database_spark.operators import ann as A
    from educational_vector_database_spark.operators import knn as K
    from educational_vector_database_spark.rag import chunk_documents
    from educational_vector_database_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(120)
    chunks = chunk_documents(docs, chunk_size=200)
    emb = _Hash384Embeddings()
    vecs = chunks.select(
        F.monotonically_increasing_id().alias("vec_id"),
        emb.embed_col("chunk").alias("embedding"),
    ).persist()
    n = vecs.count()
    assert n > 100
    dim = len(vecs.head().embedding)
    assert dim == 384

    idx = A.TwoLevelGraphIndex(m_lower=12, m_upper=12, n_planes=3)
    idx.build(vecs)
    qv = [float(x) for x in emb.embed("what is the meaning of spark")]
    k = 10
    got = idx.query(vecs, qv, k=k, beam=48, hops=6, n_descend=8)
    got_rows = got.collect()
    assert len(got_rows) == k
    want = {r.vec_id for r in K.knn(vecs, qv, k=k).collect()}
    hits = len({r.vec_id for r in got_rows} & want)
    assert hits / k >= 0.8, f"recall {hits}/{k} at dim=384"
    vecs.unpersist()


def test_composed_pipeline_dim384_hf(spark, sf_dir):
    """The same composition through the REAL sentence-transformers encoder
    (skips where the optional dep is absent, mirroring the reference's
    server.py:25-32 treatment)."""
    pytest.importorskip("sentence_transformers")
    from pyspark.sql import functions as F

    from educational_vector_database_spark.embeddings import HFEmbeddings
    from educational_vector_database_spark.operators import ann as A
    from educational_vector_database_spark.operators import knn as K
    from educational_vector_database_spark.rag import chunk_documents
    from educational_vector_database_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    emb = HFEmbeddings()
    vecs = chunk_documents(docs, chunk_size=200).select(
        F.monotonically_increasing_id().alias("vec_id"),
        emb.embed_col("chunk").alias("embedding"),
    ).persist()
    idx = A.TwoLevelGraphIndex(m_lower=12, m_upper=12, n_planes=3)
    idx.build(vecs)
    qv = [float(x) for x in emb.embed("what is the meaning of spark")]
    got = idx.query(vecs, qv, k=5, beam=48, hops=6, n_descend=8).collect()
    assert len(got) == 5
    want = {r.vec_id for r in K.knn(vecs, qv, k=5).collect()}
    assert len({r.vec_id for r in got} & want) >= 4
    vecs.unpersist()


def test_hashing_tf_embeddings_contract(spark):
    """HashingTFEmbeddings (the content-sensitive deterministic fallback
    behind STRUCTURED_RECALL_REAL): unit-normalized, text-DEPENDENT (unlike
    DummyEmbeddings' length-only quirk), deterministic across calls, and
    the executor-side pandas UDF must agree with driver-side embed()
    bit-for-bit (same crc32 slots, same accumulation order)."""
    import numpy as np

    from educational_vector_database_spark.embeddings import (
        HashingTFEmbeddings,
    )

    emb = HashingTFEmbeddings(dim=64)
    a = emb.embed("spark graft vector engine")
    b = emb.embed("spark graft vector engine")
    c = emb.embed("sparq graft vector engine")  # same length, one char off
    assert np.allclose(a, b)
    assert not np.allclose(a, c)
    assert abs(float(np.linalg.norm(a)) - 1.0) < 1e-12
    assert emb.embed("").tolist() == [0.0] * 64  # empty text -> zero vector
    # shared vocabulary -> high cosine; disjoint vocabulary -> near zero
    x = emb.embed("alpha beta gamma delta epsilon")
    y = emb.embed("alpha beta gamma delta zeta")
    z = emb.embed("one two three four five")
    assert float(x @ y) > 0.6 > abs(float(x @ z))
    # executor parity through the pandas UDF
    texts = ["spark graft vector engine", "", "alpha beta gamma"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    rows = {int(r.id): r.v for r in
            df.select("id", emb.embed_col("text").alias("v")).collect()}
    for i, t in enumerate(texts):
        assert np.allclose(rows[i], emb.embed(t))
