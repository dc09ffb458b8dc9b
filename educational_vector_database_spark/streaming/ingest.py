"""Streaming ingest: the reference's per-request write path, re-expressed.

The reference appends one record per HTTP request and re-pickles the ENTIRE
database after every write (reference src/server.py:88-92, 125-134, 47-49) —
O(store) cost per record. The Spark-native shape is a watch-folder micro-batch
pipeline:

    files land in <in_dir>  ──readStream──▶  chunk ▶ embed ▶ dim-check
                                   └──writeStream (append parquet + checkpoint)

- ``trigger(availableNow=True)`` drains everything pending then stops — the
  batch-incremental contract (run it from cron; each run processes only NEW
  files, tracked by the checkpoint — no reprocessing, no full rewrite).
- The sink is an append-only parquet table: per-batch cost is O(new data).
- Exactly-once: file-source progress + sink commit log both live in the
  checkpoint directory, so a killed job resumes without dropping or
  duplicating a batch.

At 100 TB the same topology holds: the file source lists incrementally
(``maxFilesPerTrigger`` bounds a micro-batch), chunk/embed are narrow maps
(no shuffle), and the parquet sink appends partition files — nothing in the
pipeline is O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import rag
from ..embeddings import Embeddings

DOCS_DDL = "doc_id bigint, text string"


def stream_documents(
    spark: SparkSession,
    in_dir: str,
    schema: str = DOCS_DDL,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded documents DataFrame from a watch folder (one JSON doc per
    line). ``maxFilesPerTrigger`` bounds micro-batch size at scale."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(in_dir)


def index_stream(
    docs: DataFrame,
    embeddings: Embeddings,
    chunk_size: int = 300,
) -> DataFrame:
    """The chunk+embed pipeline applied to an unbounded docs stream.

    ``build_rag_index`` is narrow (posexplode + pandas-UDF embed) so the SAME
    code drives batch and streaming — the logical plan is identical, only the
    source differs."""
    return rag.build_rag_index(docs, embeddings, chunk_size=chunk_size)


def run_ingest(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    embeddings: Embeddings,
    chunk_size: int = 300,
    fmt: str = "json",
) -> None:
    """Drain all pending input files into the chunks table, then stop
    (availableNow). Each invocation is one incremental batch-append run —
    ≙ the reference's add-then-persist loop with O(new) instead of O(all)."""
    chunks = index_stream(stream_documents(spark, in_dir, fmt=fmt), embeddings, chunk_size)
    q = (
        chunks.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_ingest_foreach_batch(
    spark: SparkSession,
    in_dir: str,
    checkpoint_dir: str,
    embeddings: Embeddings,
    sink,
    chunk_size: int = 300,
    fmt: str = "json",
) -> None:
    """Same drain loop, but each micro-batch is handed to ``sink(df, batch_id)``
    — the hook for transactional multi-table writes (e.g. chunks table +
    per-batch stats row) that a plain parquet sink cannot express."""
    chunks = index_stream(stream_documents(spark, in_dir, fmt=fmt), embeddings, chunk_size)
    q = (
        chunks.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Streaming exact dedup: drop re-ingested content ACROSS micro-batches.

    ``dropDuplicates`` on a stream keeps state of seen keys (here the 60-bit
    content fingerprint, 8 bytes/doc of state — not the document). With a
    watermark the state would be bounded by event time; without one it grows
    by one key per distinct doc, the streaming analog of dedup_exact."""
    from ..functions import text as T

    return docs.withColumn("fp", T.fingerprint64(text_col)).dropDuplicates(["fp"])
