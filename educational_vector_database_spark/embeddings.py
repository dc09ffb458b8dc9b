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


class HashingTFEmbeddings(Embeddings):
    """Deterministic TEXT-DEPENDENT embeddings via feature hashing (the
    classic hashing trick: Weinberger et al., ICML 2009) — the engine's
    stand-in for a real sentence encoder when sentence-transformers is
    unavailable (the reference's own fallback seam, server.py:25-32, but
    content-sensitive where ``DummyEmbeddings`` is length-only).

    Each whitespace token hashes to one of ``dim`` buckets with a ±1 sign
    (crc32 — stable across processes, unlike Python's salted ``hash``);
    the bucket-signed term-frequency vector is L2-normalized. Documents
    sharing vocabulary are close in cosine — so topical corpora embed as
    CLUSTERED vector sets, which is exactly the regime structure the auto
    router's clusterability probe has to read (STRUCTURED_RECALL_REAL
    uses this embedder to place text corpora between the isotropic and
    Zipf-GMM operating points). Fully deterministic: no RNG, no model
    download, engine-portable."""

    def __init__(self, dim: int = 384):
        self.dim = int(dim)

    @staticmethod
    def _accumulate(tokens, dim: int) -> np.ndarray:
        import zlib

        v = np.zeros(dim, dtype=np.float64)
        for t in tokens:
            h = zlib.crc32(t.encode("utf-8"))
            idx = h % dim
            v[idx] += 1.0 if (h >> 17) & 1 else -1.0
        return v

    def embed(self, text: str) -> np.ndarray:
        v = self._accumulate((text or "").split(), self.dim)
        n = float(np.linalg.norm(v))
        return v / n if n > 0 else v

    def udf(self):
        dim = self.dim

        @F.pandas_udf(ArrayType(DoubleType()))
        def hashing_tf_embed(texts: pd.Series) -> pd.Series:
            import zlib

            # token -> (bucket, sign) memoized per batch: a corpus's
            # vocabulary is tiny next to its token stream, so the hash
            # runs once per DISTINCT token per executor batch
            cache: dict[str, tuple[int, float]] = {}

            def slot(t):
                s = cache.get(t)
                if s is None:
                    h = zlib.crc32(t.encode("utf-8"))
                    s = cache[t] = (h % dim, 1.0 if (h >> 17) & 1 else -1.0)
                return s

            out = []
            for text in texts.fillna(""):
                v = np.zeros(dim, dtype=np.float64)
                for t in text.split():
                    idx, sign = slot(t)
                    v[idx] += sign
                n = float(np.linalg.norm(v))
                out.append((v / n if n > 0 else v).tolist())
            return pd.Series(out)

        return hashing_tf_embed


def default_embeddings(dim: int = DEFAULT_DUMMY_DIM) -> Embeddings:
    """HF when installed, else Dummy — the reference server's load path
    (server.py:25-32)."""
    try:
        return HFEmbeddings()
    except ImportError:
        return DummyEmbeddings(dim)
