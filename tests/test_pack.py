"""Sequence-packing semantics (operators/pack.py)."""

from pyspark.sql import functions as F

from educational_vector_database_spark.operators import pack as P


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_pack_addresses_are_running_sums(spark):
    # one shard so the layout is a single stream: docs of 600 tokens into
    # 1024-token sequences — doc1 starts at (0,0), doc2 at (0,600), doc3
    # crosses into seq 1 at offset 176
    df = _df(spark, [(1, 600), (2, 600), (3, 600)])
    out = {
        r.doc_id: (r.seq_id, r.seq_offset)
        for r in P.pack_sequences(df, "n_tokens", 1024, n_shards=1).collect()
    }
    assert out == {1: (0, 0), 2: (0, 600), 3: (1, 176)}


def test_pack_shards_are_independent_and_deterministic(spark):
    rows = [(i, 100 + i) for i in range(40)]
    a = P.pack_sequences(_df(spark, rows), "n_tokens", 512, n_shards=4).collect()
    b = P.pack_sequences(_df(spark, rows), "n_tokens", 512, n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # every shard's stream starts at offset 0 for its lowest doc_id
    first = {}
    for r in sorted(a, key=lambda r: (r.shard, r.doc_id)):
        first.setdefault(r.shard, (r.seq_id, r.seq_offset))
    assert all(v == (0, 0) for v in first.values())
    # offsets never reach seq_len
    assert all(0 <= r.seq_offset < 512 for r in a)


def test_pack_empty_and_single(spark):
    assert P.pack_sequences(_df(spark, []), "n_tokens", 64, n_shards=2).count() == 0
    one = P.pack_sequences(_df(spark, [(7, 10)]), "n_tokens", 64, n_shards=2).collect()
    assert (one[0].seq_id, one[0].seq_offset) == (0, 0)
