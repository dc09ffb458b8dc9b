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
