"""Integer power-iteration semantics (operators/graph.py)."""

from educational_vector_database_spark.operators import graph as G


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_star_hub_outranks_leaves(spark):
    # star: 0 connected to 1..4 — the hub collects four contributions,
    # leaves get one each; symmetry makes all leaves identical
    star = _pairs(spark, [(0, i) for i in range(1, 5)])
    r = {row.id: row.rank_micro for row in G.integer_pagerank(star).collect()}
    assert set(r) == {0, 1, 2, 3, 4}
    leaf_ranks = {r[i] for i in range(1, 5)}
    assert len(leaf_ranks) == 1
    assert r[0] > r[1]


def test_deterministic_and_integer(spark):
    g = _pairs(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    a = sorted(map(tuple, G.integer_pagerank(g).collect()))
    b = sorted(map(tuple, G.integer_pagerank(g).collect()))
    assert a == b
    assert all(isinstance(v, int) for _, v in a)
    # ranks conserve boundedness: every rank >= the teleport base
    assert all(v >= 150_000 for _, v in a)
