"""Deterministic sampling — training-data pipeline operators.

The reference has no sampling surface (it serves search, not corpus
curation), but a 100 TB training pipeline needs reproducible subsets:
splits must be stable across reruns, machines, and engines, which rules out
``df.sample`` (partition-RNG: result changes with partitioning). Everything
here keys off a cross-engine content hash (md5 — the same primitive as
functions/text.py fingerprint64), so a row's membership is a pure function
of its id: re-running on a different cluster layout, or in DuckDB, selects
the SAME rows.

Scale shape:

- ``hash_fraction_sample`` — a scan-side predicate: no shuffle, no state,
  pushes through column pruning; sampling 1% of 100 TB reads row groups and
  drops rows in the scan stage.
- ``stratified_sample`` — top-N per group in hash order via one window over
  the group key: a single Exchange on the group column; skewed groups cost
  their own size, nothing more (rank is computed per group, not globally).
- ``split_train_holdout`` — two complementary hash-range predicates from ONE
  hash value: train/holdout are disjoint and exhaustive BY CONSTRUCTION, the
  property a per-split ``sample()`` cannot give.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Hash-space denominator: membership thresholds are integers out of this,
#: so fractions are exact (no float-boundary drift between engines).
DENOM = 1_000_000


def _hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Uniform bucket in [0, DENOM) from a cross-engine content hash:
    first 15 hex digits of md5(salt || key) as BIGINT, mod DENOM. The salt
    decorrelates independent samples drawn over the same key space."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), k.cast("string"))), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(DENOM))


def hash_fraction_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically: a row survives iff
    hash(key) mod DENOM < fraction*DENOM. Pure scan-side predicate."""
    thresh = int(round(float(fraction) * DENOM))
    return df.filter(_hash_bucket(key_col, salt) < thresh)


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Exactly min(n, |group|) rows per group, chosen in hash order —
    a deterministic reservoir: stable under reruns AND under corpus appends
    that don't change the top-n hash ranks of a group. Adds ``sample_rank``
    (1-based within the group). Ties (hash collisions) break by key."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(_hash_bucket(key_col, salt).asc(), F.col(key_col).asc())
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= n_per_group)
    )


def split_label(
    key_col: Column | str, holdout_fraction: float, salt: str = ""
) -> Column:
    """The train/holdout verdict as a COLUMN ('train' / 'holdout') — same
    hash ranges as :func:`split_train_holdout`, for pipelines that tag and
    aggregate in one pass instead of materializing two frames (a
    two-frame union evaluates the upstream pipeline once per branch)."""
    thresh = int(round(float(holdout_fraction) * DENOM))
    return F.when(
        _hash_bucket(key_col, salt) < thresh, F.lit("holdout")
    ).otherwise(F.lit("train"))


def split_train_holdout(
    df: DataFrame, key_col: str, holdout_fraction: float, salt: str = ""
) -> tuple[DataFrame, DataFrame]:
    """(train, holdout) from complementary ranges of ONE hash: disjoint and
    exhaustive by construction — the contamination-free split a training
    pipeline needs (a holdout row can never also train, even across reruns
    or engines)."""
    thresh = int(round(float(holdout_fraction) * DENOM))
    b = _hash_bucket(key_col, salt)
    return df.filter(b >= thresh), df.filter(b < thresh)


def mixture_sample(
    df: DataFrame,
    group_col: str,
    cost_col: str,
    key_col: str,
    weights_ppm: dict[str, int],
    budget_ppm: int,
    salt: str = "",
) -> DataFrame:
    """Domain-mixture sampling (the Pile / DoReMi-style corpus-composition
    move): downsample each group (domain/source) so its share of a global
    cost budget matches a declared mixture weight. ``budget_ppm`` is the
    global budget as parts-per-million of the corpus's total cost (chars,
    tokens, bytes — whatever ``cost_col`` holds); ``weights_ppm[g]`` is
    group g's share of that budget. A group absent from the map gets
    weight 0 (an explicit mixture spec — silently passing unknown domains
    through would un-declare the mixture).

    Per-group acceptance rate:
        rate_ppm(g) = min(DENOM, floor(DENOM * total*budget*weight / cost_g))
    computed in float64 with a PINNED op order (one literal factor
    ``budget*weight/DENOM²`` folded driver-side, then
    ``total * factor / cost_g * DENOM``), so the rate — and therefore
    membership — is bit-reproducible on any engine up to 2^53 cost units
    (~9 PB of chars). A doc survives iff ``md5_bucket(key) < rate_ppm``,
    the same deterministic-membership contract as every sampler here:
    expectation-exact on cost, reproducible row-exact.

    Scale shape (100 TB): ONE aggregate over the corpus (grp totals +
    global total — partial-aggregated map-side, O(groups) rows out), the
    tiny rate table broadcast back, and the verdict is a scan-side
    predicate. No second shuffle, no window, no driver loop. Skewed
    domains cost nothing extra: the rate join is a broadcast hash join.

    Returns the input rows + ``(weight_ppm, rate_ppm, keep)``."""
    tot = df.groupBy(group_col).agg(
        F.sum(F.col(cost_col).cast("long")).alias("grp_cost")
    )
    glob = df.agg(F.sum(F.col(cost_col).cast("long")).alias("total_cost"))
    if len(weights_ppm) <= 64:
        # few domains: the weight lookup folds into the totals projection
        grp = F.col(group_col)
        w_expr = F.lit(0).cast("long")
        for g, w in sorted(weights_ppm.items()):
            w_expr = F.when(grp == g, F.lit(int(w)).cast("long")).otherwise(w_expr)
        tot = tot.withColumn("weight_ppm", w_expr)
    else:
        # many domains (a real crawl has thousands): a 64-deep when-chain
        # per row neither codegens nor reads well — ship the weight table
        # as a broadcast left join instead (it is O(domains) rows by
        # definition, the same small-table contract as the rate table)
        spark = df.sparkSession
        wdf = spark.createDataFrame(
            sorted((g, int(w)) for g, w in weights_ppm.items()),
            f"{group_col} string, weight_ppm long",
        )
        tot = tot.join(F.broadcast(wdf), on=group_col, how="left").withColumn(
            "weight_ppm", F.coalesce(F.col("weight_ppm"), F.lit(0).cast("long"))
        )
    rates = (
        tot.crossJoin(F.broadcast(glob))
        .withColumn(
            "rate_ppm",
            F.least(
                F.lit(DENOM).cast("long"),
                F.floor(
                    F.lit(float(DENOM))
                    * (
                        F.col("total_cost").cast("double")
                        * (
                            F.lit(int(budget_ppm)).cast("double")
                            * F.col("weight_ppm").cast("double")
                            / F.lit(float(DENOM) * float(DENOM))
                        )
                        / F.col("grp_cost").cast("double")
                    )
                ).cast("long"),
            ),
        )
        .select(group_col, "weight_ppm", "rate_ppm")
    )
    return df.join(F.broadcast(rates), on=group_col).withColumn(
        "keep", _hash_bucket(key_col, salt) < F.col("rate_ppm")
    )
