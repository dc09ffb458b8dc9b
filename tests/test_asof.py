"""As-of join tests: hand-built fixtures + brute-force parity on real data."""

from pyspark.sql import functions as F

from educational_vector_database_spark.operators.asof import asof_join


def _fixture(spark):
    trades = spark.createDataFrame(
        [(1, 10, "t1"), (1, 20, "t2"), (1, 5, "t0"), (2, 15, "t3")],
        "sym: long, t_ts: long, trade: string",
    )
    quotes = spark.createDataFrame(
        [(1, 8, 100.0), (1, 10, 101.0), (1, 18, 102.0), (2, 99, 1.0), (3, 1, 9.9)],
        "sym: long, q_ts: long, px: string" .replace("px: string", "px: double"),
    )
    return trades, quotes


def test_asof_inner_semantics(spark):
    trades, quotes = _fixture(spark)
    got = {
        (r.sym, r.t_ts): r.px
        for r in asof_join(trades, quotes, "sym", "t_ts", "q_ts", ["px"]).collect()
    }
    # t0@5: no quote <= 5 -> dropped (inner); t1@10: quote AT 10 wins (tie);
    # t2@20: quote@18; sym2@15: quote@99 is later -> dropped
    assert got == {(1, 10): 101.0, (1, 20): 102.0}


def test_asof_left_keeps_unmatched(spark):
    trades, quotes = _fixture(spark)
    got = {
        (r.sym, r.t_ts): r.px
        for r in asof_join(trades, quotes, "sym", "t_ts", "q_ts", ["px"], how="left").collect()
    }
    assert got[(1, 5)] is None and got[(2, 15)] is None
    assert len(got) == 4


def test_asof_matches_bruteforce_on_events(spark, sf_dir):
    """clicks as-of-joined to the user's most recent prior view — compare to
    the O(n*m) brute-force formulation on real event data."""
    from educational_vector_database_spark.session import load_table, ts_micros

    _e = load_table(spark, sf_dir, "events")
    ev = _e.withColumn("ts_us", ts_micros(_e))
    clicks = ev.filter("event_type = 'click'").select("user_id", "ts_us", "event_id")
    views = ev.filter("event_type = 'view'").select(
        "user_id", F.col("ts_us").alias("v_ts"), F.col("event_id").alias("view_id")
    )
    fast = {
        (r.user_id, r.ts_us): (r.view_id, r.v_ts)
        for r in asof_join(clicks, views, "user_id", "ts_us", "v_ts", ["view_id", "v_ts"]).collect()
    }
    brute = (
        clicks.join(views, "user_id")
        .filter(F.col("v_ts") <= F.col("ts_us"))
        .groupBy("user_id", "ts_us")
        .agg(F.max(F.struct("v_ts", "view_id")).alias("m"))
        .select("user_id", "ts_us", "m.view_id", "m.v_ts")
    )
    slow = {(r.user_id, r.ts_us): (r.view_id, r.v_ts) for r in brute.collect()}
    assert fast == slow and len(fast) > 0


def test_asof_inner_keeps_matched_row_with_null_payload(spark):
    """A matched right row whose payload VALUE is NULL still counts as a
    match: inner must keep it (matchedness is the struct, not a field)."""
    trades = spark.createDataFrame([(1, 10, "t")], "sym: long, t_ts: long, trade: string")
    quotes = spark.createDataFrame([(1, 8, None)], "sym: long, q_ts: long, px: double")
    got = asof_join(trades, quotes, "sym", "t_ts", "q_ts", ["px"]).collect()
    assert len(got) == 1 and got[0].px is None
