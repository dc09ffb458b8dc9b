"""Deterministic sampling tests: cross-layout stability + split laws."""

from pyspark.sql import functions as F

from educational_vector_database_spark.operators import sample as SM
from educational_vector_database_spark.session import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_fraction_sample_deterministic_across_partitioning(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r.doc_id for r in SM.hash_fraction_sample(docs, "doc_id", 0.3).collect()}
    b = {r.doc_id for r in
         SM.hash_fraction_sample(docs.repartition(17), "doc_id", 0.3).collect()}
    assert a == b and 0 < len(a) < docs.count()


def test_fraction_sample_salt_decorrelates(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r.doc_id for r in SM.hash_fraction_sample(docs, "doc_id", 0.5, salt="x").collect()}
    b = {r.doc_id for r in SM.hash_fraction_sample(docs, "doc_id", 0.5, salt="y").collect()}
    assert a != b  # independent draws


def test_stratified_sample_exact_group_sizes(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = SM.stratified_sample(docs, "lang", 7, "doc_id")
    sizes = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    expect = {r.lang: min(7, r.n) for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert sizes == expect
    # rank is 1..n within each group
    ranks = {(r.lang, r.sample_rank) for r in out.collect()}
    for lang, n in sizes.items():
        assert {(lang, i) for i in range(1, n + 1)} <= ranks


def test_split_disjoint_and_exhaustive(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    train, hold = SM.split_train_holdout(docs, "doc_id", 0.2)
    t = {r.doc_id for r in train.collect()}
    h = {r.doc_id for r in hold.collect()}
    assert t & h == set()
    assert t | h == {r.doc_id for r in docs.collect()}
    # stable across reruns/partitioning
    t2, h2 = SM.split_train_holdout(docs.repartition(13), "doc_id", 0.2)
    assert {r.doc_id for r in h2.collect()} == h
