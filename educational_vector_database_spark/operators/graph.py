"""Iterative graph analytics over candidate-pair graphs.

connected_components (operators/dedup.py) answers "which docs are the same";
the power iteration here answers "which doc is the HUB of its near-dup
neighborhood" — the centrality signal curation pipelines use to pick the
canonical copy (or to down-weight template farms) when min-id survivorship
is too crude.

Scale shape: identical to connected components — each iteration is one join
+ one groupBy, both keyed on the 8-byte node id; the edge list is the small
near-dup output, never the corpus; lineage is truncated per round so the
plan stays flat. Rounds are FIXED (not run-to-convergence), which bounds
wall-clock and makes the result a pure function of the graph.

All arithmetic is int64: ranks live in micro units and contributions use
integer division (rank * damping_pct div 100 div degree). Integer division
deliberately drops sub-micro mass — the result is NOT float PageRank, it is
a deterministic integer variant of it, bit-identical on any engine and any
execution order, which is what lets a SQL oracle check every rank exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_ONE = 1_000_000  # 1.0 in micro units


def integer_pagerank(
    pairs: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """``(id, rank_micro)`` after ``iterations`` rounds of the integer
    power iteration over the UNDIRECTED graph given as pairs.

    Per round: every node sends ``rank * damping_pct div 100 div degree``
    to each neighbor, then ``rank' = (100 - damping_pct)% of RANK_ONE +
    Σ incoming``. Nodes outside the pair list are not ranked (isolated
    docs have no neighborhood to be the hub of)."""
    # LAZY checkpoint (eager=False): lineage truncated at construction, the
    # one shared edge RDD computes under the consumer's action — the whole
    # fixed-iteration power loop is a single job chain, no blocking
    # checkpoint job up front (guide §1.2; the rounds below were already
    # lazy).
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    base = (100 - damping_pct) * RANK_ONE // 100
    ranks = deg.select("src", F.lit(RANK_ONE).cast("long").alias("rank_micro"))
    for _ in range(iterations):
        contrib = (
            ranks.join(deg, "src")
            .select(
                "src",
                F.expr(f"rank_micro * {damping_pct} div 100 div deg").alias("c"),
            )
        )
        incoming = (
            edges.join(contrib, "src")
            .groupBy("dst")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = (
            deg.join(incoming, deg.src == incoming.dst, "left")
            .select(
                "src",
                (F.lit(base) + F.coalesce("inc", F.lit(0))).cast("long").alias(
                    "rank_micro"
                ),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(F.col("src").alias("id"), "rank_micro")
