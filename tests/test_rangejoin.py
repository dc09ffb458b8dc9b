"""Interval-join parity: the broadcast nested-loop form and the bucketed
equi-join rewrite must produce identical matches, including bands whose
edges land exactly on bucket boundaries (the off-by-one trap in the
bucket-range expansion)."""

from pyspark.sql import functions as F

from educational_vector_database_spark.operators import rangejoin as RJ
from educational_vector_database_spark.session import load_table

BANDS = [
    ("a", 0.0, 50.0),
    ("b", 50.0, 150.0),
    ("c", 150.0, 300.0),
    ("d", 300.0, 1000.0),
]


def _bands(spark):
    return spark.createDataFrame(BANDS, "tier string, lo double, hi double")


def _key_set(df):
    return {(r.event_id, r.tier) for r in df.select("event_id", "tier").collect()}


def test_broadcast_vs_bucketed_parity(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_id", "value")
    bands = _bands(spark)
    bc = RJ.broadcast_range_join(e, bands, F.col("value"))
    # bucket width deliberately misaligned with the band edges
    bk = RJ.bucketed_range_join(e, bands, F.col("value"), bucket_width=37.0)
    assert _key_set(bc) == _key_set(bk)
    # every event has exactly one tier (bands cover [0, 1000), values within)
    assert bc.count() == e.count()


def test_bucketed_handles_edge_aligned_bands(spark):
    # band [10, 20) with bucket width 10: the hi edge sits exactly on a
    # bucket boundary — bucket 2 (rows 20..30) must NOT get the band
    rows = spark.createDataFrame(
        [(1, 9.99), (2, 10.0), (3, 19.999), (4, 20.0)], "event_id long, value double"
    )
    bands = spark.createDataFrame([("mid", 10.0, 20.0)], "tier string, lo double, hi double")
    got = {
        (r.event_id, r.tier)
        for r in RJ.bucketed_range_join(
            rows, bands, F.col("value"), bucket_width=10.0
        ).collect()
    }
    assert got == {(2, "mid"), (3, "mid")}


def test_no_band_rows_drop_in_inner_join(spark):
    rows = spark.createDataFrame([(1, -5.0), (2, 5.0)], "event_id long, value double")
    bands = spark.createDataFrame([("pos", 0.0, 10.0)], "tier string, lo double, hi double")
    bc = RJ.broadcast_range_join(rows, bands, F.col("value"))
    assert [r.event_id for r in bc.collect()] == [2]
