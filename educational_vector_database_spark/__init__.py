"""educational_vector_database_spark — a PySpark-native analytics engine with the
query surface of ahmadhattab/Educational-Vector-Database.

The reference (/root/reference, ~560 LoC Python/NumPy) is an in-memory vector
store: brute-force + HNSW top-k search under cosine/dot/euclidean similarity,
pluggable text embeddings, pickle persistence, and a minimal RAG pipeline
(chunk -> embed -> index -> retrieve -> concat). This package re-expresses that
surface — plus the large-scale training-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal plumbing) — as idiomatic Spark
DataFrame plans: Catalyst higher-order functions for the vector math, window
functions for per-query top-k, pandas UDFs only where Python is semantically
required (deterministic dummy embeddings).

Layout:
    functions/   Column-expression builders (vector math, text analysis, hashing)
    operators/   DataFrame -> DataFrame operators (knn, dedup, ann, text stats)
    sources/     persistence: parquet vector store + JSON config sidecar
    streaming/   incremental ingest + windowed event aggregation
    rag.py       chunk/index/retrieve/answer pipeline
    embeddings.py pluggable embedding UDFs (dummy deterministic, optional HF)
    api.py       VectorDB facade mirroring the reference's public API
"""

__version__ = "0.1.0"
