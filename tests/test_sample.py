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


def test_mixture_sample_rates_and_membership(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    weights = {f"src{i}": (120_000 if i < 5 else 26_000) for i in range(20)}
    out = SM.mixture_sample(
        docs, "source", "n_chars", "doc_id",
        weights_ppm=weights, budget_ppm=400_000,
    )
    rows = out.collect()
    assert len(rows) == docs.count()  # verdict per row, nothing dropped

    # rates replicate the pinned-op-order formula exactly
    import math
    total = sum(r.n_chars for r in rows if True)
    # total from the raw table (rows carries each doc once)
    raw = docs.select("source", "n_chars", "doc_id").collect()
    total = sum(r.n_chars for r in raw)
    grp = {}
    for r in raw:
        grp[r.source] = grp.get(r.source, 0) + r.n_chars
    for r in rows:
        w = weights[r.source]
        expect = min(
            1_000_000,
            math.floor(
                1_000_000.0
                * (float(total) * (float(400_000) * float(w) / 1e12)
                   / float(grp[r.source]))
            ),
        )
        assert r.rate_ppm == expect and r.weight_ppm == w

    # heavier-weighted sources keep a larger cost share
    kept = {}
    for r in rows:
        if r.keep:
            kept[r.source] = kept.get(r.source, 0) + r.n_chars
    head = sum(kept.get(f"src{i}", 0) for i in range(5)) / 5
    tail = sum(kept.get(f"src{i}", 0) for i in range(5, 20)) / 15
    assert head > tail

    # membership is a pure function of the key: stable across partitioning
    again = SM.mixture_sample(
        docs.repartition(13), "source", "n_chars", "doc_id",
        weights_ppm=weights, budget_ppm=400_000,
    )
    a = {(r.doc_id, r.keep) for r in rows}
    b = {(r.doc_id, r.keep) for r in again.collect()}
    assert a == b


def test_mixture_sample_unknown_group_dropped(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = SM.mixture_sample(
        docs, "source", "n_chars", "doc_id",
        weights_ppm={"src0": 1_000_000}, budget_ppm=100_000,
    )
    others = out.filter(F.col("source") != "src0")
    assert others.filter(F.col("keep")).count() == 0  # weight 0 -> rate 0
    assert others.filter(F.col("rate_ppm") != 0).count() == 0


def test_mixture_sample_many_domains_join_path(spark, sf_dir):
    """>64 declared domains routes the weight lookup through the broadcast
    join branch; declared weights resolve identically and undeclared
    domains still get rate 0."""
    docs = _docs(spark, sf_dir)
    weights = {f"src{i}": (120_000 if i < 5 else 26_000) for i in range(20)}
    # same 20 real sources + 50 phantom domains to cross the threshold
    many = dict(weights)
    many.update({f"phantom{i}": 1_000 for i in range(50)})
    small = SM.mixture_sample(
        docs, "source", "n_chars", "doc_id",
        weights_ppm=weights, budget_ppm=400_000,
    )
    big = SM.mixture_sample(
        docs, "source", "n_chars", "doc_id",
        weights_ppm=many, budget_ppm=400_000,
    )
    a = sorted((r.doc_id, r.rate_ppm, r.keep) for r in small.collect())
    b = sorted((r.doc_id, r.rate_ppm, r.keep) for r in big.collect())
    assert a == b  # phantom weights touch no real row; real weights agree
