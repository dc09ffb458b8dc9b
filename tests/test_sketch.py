"""Bloom filter guarantees (operators/sketch.py)."""

from educational_vector_database_spark.operators import sketch as SK


def test_bloom_no_false_negatives_and_low_fp(spark):
    train = spark.createDataFrame([(i,) for i in range(200)], "fp long")
    bloom = SK.bloom_build(train, "fp", n_words=64, n_hashes=3)
    # every trained key MUST probe true — Bloom filters never false-negative
    hits = SK.bloom_probe(train, bloom, "fp").collect()
    assert all(r.maybe_member for r in hits)
    # fresh keys mostly probe false (4032 bits, <=600 set -> FP rate ~0.3%)
    fresh = spark.createDataFrame([(i,) for i in range(10_000, 10_200)], "fp long")
    fps = sum(r.maybe_member for r in SK.bloom_probe(fresh, bloom, "fp").collect())
    assert fps < 20


def test_bloom_words_positive_and_mergeable(spark):
    a = SK.bloom_build(
        spark.createDataFrame([(1,), (2,)], "fp long"), "fp", n_words=8
    ).collect()
    # 63-bit layout keeps every word positive (1<<63 is not portable int64)
    assert all(r.word > 0 for r in a)


def test_bloom_probe_null_key_is_false_not_dropped(spark):
    # ADVICE r3: NULL keys were inner-joined away; they must survive with
    # maybe_member=false (a NULL key was never inserted).
    train = spark.createDataFrame([(i,) for i in range(50)], "fp long")
    bloom = SK.bloom_build(train, "fp", n_words=64, n_hashes=3)
    probe = spark.createDataFrame([(1,), (None,), (9999,)], "fp long")
    rows = SK.bloom_probe(probe, bloom, "fp").collect()
    assert len(rows) == 3
    by_key = {r.fp: r.maybe_member for r in rows}
    assert by_key[1] is True and by_key[None] is False
