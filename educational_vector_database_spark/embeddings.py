"""Pluggable text embeddings (reference src/vectordb/embeddings.py).

The reference contract is ``embed(text) -> np.ndarray`` (embeddings.py:7-14);
Spark-side that becomes a pandas UDF ``STRING -> ARRAY<DOUBLE>`` applied over
Arrow batches — the one place Python is semantically required in the engine.

``DummyEmbeddings`` reproduces the reference bit-for-bit (embeddings.py:17-27):
``np.random.seed(len(text)); np.random.rand(dim)`` — deterministic in the TEXT
LENGTH ONLY (equal-length texts share a vector; a documented reference quirk we
keep). Using ``np.random.RandomState(len(text))`` yields the identical MT19937
stream as seeding the global RNG, without mutating global state in the worker.

``HFEmbeddings`` mirrors the reference's optional sentence-transformers path
(embeddings.py:30-45): lazy import, per-executor model singleton, graceful
``ImportError`` fallback exactly as the server does (server.py:25-32).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

DEFAULT_DUMMY_DIM = 16  # server fallback dim (reference server.py:32)


class Embeddings(ABC):
    """Driver-side embedding contract (reference embeddings.py:7-14)."""

    dim: int

    @abstractmethod
    def embed(self, text: str) -> np.ndarray:
        """Embed one string to a float64 vector of length ``dim``."""

    @abstractmethod
    def udf(self):
        """A pandas UDF ``STRING -> ARRAY<DOUBLE>`` applying ``embed`` batch-wise."""

    def embed_col(self, text: Column | str) -> Column:
        return self.udf()(F.col(text) if isinstance(text, str) else text)


def _dummy_vector(length: int, dim: int) -> np.ndarray:
    # identical stream to `np.random.seed(length); np.random.rand(dim)`
    # (reference embeddings.py:25-27) without touching the global RNG
    return np.random.RandomState(length).rand(dim)


class DummyEmbeddings(Embeddings):
    """Deterministic pseudo-embeddings (reference embeddings.py:17-27)."""

    def __init__(self, dim: int = DEFAULT_DUMMY_DIM):
        self.dim = dim

    def embed(self, text: str) -> np.ndarray:
        return _dummy_vector(len(text), self.dim)

    def udf(self):
        dim = self.dim

        @F.pandas_udf(ArrayType(DoubleType()))
        def dummy_embed(texts: pd.Series) -> pd.Series:
            # the vector depends ONLY on len(text) (reference quirk, kept):
            # memoize per distinct length so a corpus of millions of docs
            # seeds the RNG a few hundred times per executor, not per row
            cache: dict[int, list] = {}

            def vec(t):
                n = len(t or "")
                v = cache.get(n)
                if v is None:
                    v = cache[n] = _dummy_vector(n, dim).tolist()
                return v

            return texts.map(vec)

        return dummy_embed


class HFEmbeddings(Embeddings):
    """sentence-transformers embeddings (reference embeddings.py:30-45).

    Optional dependency, lazily imported per executor; raises ``ImportError``
    at construction when unavailable — callers fall back to DummyEmbeddings
    exactly as the reference server does (server.py:25-32).
    """

    DEFAULT_MODEL = "sentence-transformers/all-MiniLM-L6-v2"  # 384-dim

    def __init__(self, model_name: str = DEFAULT_MODEL):
        from sentence_transformers import SentenceTransformer  # noqa: F401

        self.model_name = model_name
        self._model = SentenceTransformer(model_name)
        self.dim = int(self._model.get_sentence_embedding_dimension())

    def embed(self, text: str) -> np.ndarray:
        return np.asarray(self._model.encode([text])[0], dtype=np.float64)

    def udf(self):
        model_name = self.model_name

        @F.pandas_udf(ArrayType(DoubleType()))
        def hf_embed(texts: pd.Series) -> pd.Series:
            # per-executor-process model singleton: load once, reuse across batches
            global _HF_MODEL_SINGLETON  # noqa: PLW0603
            try:
                model = _HF_MODEL_SINGLETON  # type: ignore[name-defined]
            except NameError:
                from sentence_transformers import SentenceTransformer

                model = SentenceTransformer(model_name)
                globals()["_HF_MODEL_SINGLETON"] = model
            vecs = model.encode(texts.fillna("").tolist())
            return pd.Series([np.asarray(v, dtype=np.float64).tolist() for v in vecs])

        return hf_embed


def default_embeddings(dim: int = DEFAULT_DUMMY_DIM) -> Embeddings:
    """HF when installed, else Dummy — the reference server's load path
    (server.py:25-32)."""
    try:
        return HFEmbeddings()
    except ImportError:
        return DummyEmbeddings(dim)
