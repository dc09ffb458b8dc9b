"""Distributed probabilistic sketches as aggregates.

The KMV distinct sketch (declared as docs_kmv_distinct) shows the
TakeOrdered form; this module adds the OTHER canonical big-data sketch — a
Bloom filter built as a pure ``bit_or`` aggregation. Membership pipelines
(was this URL/document/fingerprint seen in the training split?) need a
compact, mergeable structure; a Bloom filter over int64 words is exactly
partial-aggregable: every partition ORs its local words, the shuffle
carries at most ``n_words`` rows of 8 bytes, and filters from different
corpora union by another OR.

Everything is md5-derived integer arithmetic, so the filter content — and
every membership verdict — is bit-identical across engines and checkable
by a SQL oracle. Word-bit layout: position p occupies bit ``p % 63`` of
word ``p div 63`` — 63 usable bits per int64 word, because ``1 << 63``
overflows signed int64 (an ERROR in ANSI engines, a silent negative in
others); capping at bit 62 keeps every word positive and portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS_PER_WORD = 63


def _hash_pos(value: Column, salt: int, n_bits: int) -> Column:
    """Bloom bit position in [0, n_bits): cross-engine md5 integer of
    ``bloom<salt>_<value>``."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"bloom{salt}_"), value.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(n_bits))


def bloom_build(
    df: DataFrame, key_col: str, n_words: int = 64, n_hashes: int = 3
) -> DataFrame:
    """``(word_idx int, word long)`` — the Bloom filter of ``key_col``.

    One explode of ``n_hashes`` positions per row, then a single
    ``bit_or`` groupBy on word index: map-side partial OR means the
    Exchange moves at most ``n_words`` words per partition regardless of
    corpus size. Absent words (no bit set) are omitted."""
    n_bits = n_words * BITS_PER_WORD
    pos = F.explode(
        F.array(*[_hash_pos(F.col(key_col), i, n_bits) for i in range(n_hashes)])
    ).alias("p")
    bits = df.select(pos).select(
        F.expr(f"p div {BITS_PER_WORD}").cast("int").alias("word_idx"),
        # shiftleft's count arg must be a literal in the Python API; the SQL
        # form takes a column
        F.expr(f"shiftleft(1L, CAST(pmod(p, {BITS_PER_WORD}) AS INT))").alias("bit"),
    )
    return bits.groupBy("word_idx").agg(F.bit_or("bit").alias("word"))


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    n_words: int = 64,
    n_hashes: int = 3,
) -> DataFrame:
    """Input rows plus ``maybe_member`` — true iff EVERY hash position's bit
    is set. The filter side is ``n_words`` rows (bounded by construction —
    a broadcast in any plan); each probe explodes to ``n_hashes`` lookups
    and re-ANDs per row, so the probe is one bounded join + one groupBy on
    the probe key. Rows whose key is NULL get ``maybe_member = false`` (a
    NULL key was never inserted) rather than being dropped."""
    n_bits = n_words * BITS_PER_WORD
    pos = F.explode(
        F.array(*[_hash_pos(F.col(key_col), i, n_bits) for i in range(n_hashes)])
    ).alias("p")
    probes = df.select(F.col(key_col).alias("k"), pos).select(
        "k",
        F.expr(f"p div {BITS_PER_WORD}").cast("int").alias("word_idx"),
        F.expr(f"shiftleft(1L, CAST(pmod(p, {BITS_PER_WORD}) AS INT))").alias("bit"),
    )
    hit = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "k",
            (F.coalesce("word", F.lit(0)).bitwiseAND(F.col("bit")) == F.col("bit")).alias("set"),
        )
        .groupBy("k")
        .agg(F.min(F.col("set").cast("int")).cast("boolean").alias("maybe_member"))
    )
    return (
        df.join(hit, df[key_col] == hit.k, "left")
        .drop("k")
        .withColumn("maybe_member", F.coalesce("maybe_member", F.lit(False)))
    )
