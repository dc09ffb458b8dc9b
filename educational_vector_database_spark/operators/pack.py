"""Sequence packing for LLM training-data pipelines.

A pretraining dataloader doesn't read documents — it reads fixed-length
token sequences (e.g. 1024 or 4096 tokens) built by concatenating documents
back-to-back and slicing at sequence boundaries (GPT-style packing; docs may
straddle a boundary). The batch job that materializes that layout needs, for
every document, WHICH packed sequence it starts in and at WHAT offset — the
addressing this module computes.

Scale design: packing is a running sum, i.e. a window function — and a
single global window is the canonical scale-killer (all rows to one
partition). So documents are first sharded by a deterministic content hash
of their id (same cross-engine md5 primitive as operators/sample.py), and
the running sum is computed PER SHARD: each shard becomes an independent
pack stream, the window partitions by shard, and the whole job is one
shuffle on (shard) with partial aggregation unaffected. At 100 TB you pick
n_shards ≈ number of final dataloader files; each shard's stream is
independent, so shards also parallelize the downstream writer.

No counterpart in the reference (it stores vectors, not training batches);
this is part of the training-data extension surface mandated alongside
SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shard_of(key: Column | str, n_shards: int, salt: str = "") -> Column:
    """Deterministic shard in [0, n_shards) from the cross-engine content
    hash (first 15 hex digits of md5, as BIGINT — identical in any engine
    with md5; no reliance on Spark's murmur3 ``hash()``)."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), k.cast("string"))), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(n_shards)).cast("int")


def pack_sequences(
    df: DataFrame,
    token_col: str,
    seq_len: int,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Assign every document its packed-sequence address.

    Within each shard, documents are concatenated in ascending ``id_col``
    order (deterministic — a re-run or a different cluster produces the
    identical layout) and the token stream is sliced every ``seq_len``
    tokens. Returns the input columns plus:

    - ``shard``  — which independent pack stream the doc belongs to;
    - ``seq_id`` — index (within the shard) of the sequence the doc STARTS
      in: ``floor(tokens_before / seq_len)``;
    - ``seq_offset`` — token offset inside that sequence:
      ``tokens_before % seq_len``.

    All arithmetic is integer, so the layout is bit-identical across
    engines and re-runs."""
    sharded = df.withColumn("shard", shard_of(id_col, n_shards, salt))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("long")
    return (
        sharded.withColumn("_before", before)
        .withColumn("seq_id", F.expr(f"_before div {int(seq_len)}"))
        .withColumn("seq_offset", F.pmod(F.col("_before"), F.lit(seq_len)).cast("long"))
        .drop("_before")
    )
