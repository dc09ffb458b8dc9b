"""Round-4 operators: stream-stream attribution join, SCD2 intervals,
boilerplate chunk filter, denylist redaction, triangle counts, CSV roundtrip.

Each test builds a micro-fixture with hand-computable expected output, the
same strategy as test_streaming.py / test_dedup.py; the sf0.01 value-hash
equivalence is covered by the oracle gate (tools/check_oracle.py)."""

import datetime as dt

from pyspark.sql import functions as F

import __spark_entry__ as E

UTC = dt.timezone.utc
T0 = dt.datetime(2024, 1, 1, 12, 0, 0, tzinfo=UTC)


def _write_events(spark, path, rows):
    """rows: (event_id, seconds_offset, user_id, event_type, value).

    Written as a single FILE named events.parquet (pyarrow), matching the
    testdata layout the streaming readers' pathGlobFilter expects — a Spark
    write would produce a directory of part files instead."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = T0.replace(tzinfo=None)  # naive-UTC wall time, like the testdata
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [t0 + dt.timedelta(seconds=r[1]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}" for _ in rows], pa.string()),
        }
    )
    pq.write_table(table, f"{path}/events.parquet")


def test_stream_attribution_interval_semantics(spark, tmp_path):
    # user 1: view exactly 30 min before purchase -> INCLUDED (>= boundary);
    #         view at the purchase instant -> EXCLUDED (strict <)
    # user 2: two prior views inside the window -> n_prior_views = 2
    # user 3: view 2000 s before purchase -> outside window, purchase absent
    # users 4/5: view and purchase on different users -> no pair
    rows = [
        (1, 0, 1, "view", 1.0),
        (2, 1800, 1, "view", 1.0),  # same instant as purchase 3
        (3, 1800, 1, "purchase", 9.0),
        (10, 0, 2, "view", 1.0),
        (11, 60, 2, "view", 1.0),
        (12, 120, 2, "purchase", 9.0),
        (20, 0, 3, "view", 1.0),
        (21, 2000, 3, "purchase", 9.0),
        (30, 0, 4, "view", 1.0),
        (31, 10, 5, "purchase", 9.0),
    ]
    _write_events(spark, str(tmp_path), rows)
    got = {
        r.purchase_id: r
        for r in E._stream_events_attribution(spark, str(tmp_path)).collect()
    }
    assert set(got) == {3, 12}
    assert got[3].n_prior_views == 1 and got[3].max_view_id == 1
    assert got[3].min_gap_us == 1800 * 1_000_000
    assert got[12].n_prior_views == 2 and got[12].max_view_id == 11
    assert got[12].min_gap_us == 60 * 1_000_000


def test_scd2_runs_and_validity_chain(spark, tmp_path):
    # user 10 tiers: low low mid high low -> 4 runs; user 11: one open run
    rows = [
        (1, 0, 10, "click", 100.0),
        (2, 10, 10, "click", 100.0),
        (3, 20, 10, "click", 300.0),
        (4, 30, 10, "click", 800.0),
        (5, 40, 10, "click", 100.0),
        (6, 0, 11, "click", 500.0),
    ]
    _write_events(spark, str(tmp_path), rows)
    out = sorted(
        E._events_user_tier_scd2(spark, str(tmp_path)).collect(),
        key=lambda r: (r.user_id, r.run_id),
    )
    u10 = [r for r in out if r.user_id == 10]
    assert [(r.tier, r.n_events) for r in u10] == [
        ("low", 2), ("mid", 1), ("high", 1), ("low", 1),
    ]
    # validity chain: each valid_to equals the next run's valid_from;
    # the last (current) run is open-ended
    for a, b in zip(u10, u10[1:]):
        assert a.valid_to_us == b.valid_from_us
    assert u10[-1].valid_to_us is None
    (u11,) = [r for r in out if r.user_id == 11]
    assert u11.tier == "mid" and u11.valid_to_us is None


def test_boilerplate_chunks_flags_repeated_windows(spark, monkeypatch, tmp_path):
    # 3-token windows; "spam spam spam" appears in 3 docs -> boilerplate,
    # the unique tails don't. Doc 4 is all-punctuation -> normalizes empty,
    # contributes no chunks (no crash, no zero-division).
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam alpha beta gamma", "en", "s0", 31),
            (2, "spam spam spam delta echo foxtrot", "en", "s0", 33),
            (3, "spam spam spam golf hotel india", "en", "s1", 31),
            (4, "!!! ???", "en", "s1", 7),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.source: r
        for r in E._docs_boilerplate_chunks(spark, str(tmp_path)).collect()
    }
    # each doc: 2 chunks (6 tokens / 3); first chunk is the spam window
    assert got["s0"].n_chunks == 4 and got["s0"].n_bp_chunks == 2
    assert got["s0"].bp_ppm == 500_000
    assert got["s1"].n_chunks == 2 and got["s1"].n_bp_chunks == 1


def test_term_redaction_counts_and_delta(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            # adjacent hits + substring NON-hit ("customers" has no boundary)
            (1, "customer customer customers", "en", "s0", 27),
            (2, "a merge b", "en", "s0", 9),
            (3, "nothing here", "en", "s1", 12),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r.source: r for r in E._docs_term_redaction(spark, str(tmp_path)).collect()}
    assert got["s0"].n_redactions == 3  # 2x customer + 1x merge, not "customers"
    assert got["s0"].n_docs_touched == 2
    # customer(8)->[X](3) saves 5 per hit; merge(5)->[X](3) saves 2
    assert got["s0"].chars_removed == 5 + 5 + 2
    assert got["s1"].n_redactions == 0 and got["s1"].chars_removed == 0


def test_triangle_counts_consistency(spark):
    # hand-check is in the oracle gate; here: structural invariants on real
    # data — total node-incidences are 3 per triangle, ids come from docs
    sf = "/root/testdata/sf0.001"
    tri = E._neardup_triangles(spark, sf).collect()
    total = sum(r.n_triangles for r in tri)
    assert total % 3 == 0
    doc_ids = {r.doc_id for r in E._docs(spark, sf).select("doc_id").collect()}
    assert all(r.doc_id in doc_ids for r in tri)


def test_csv_roundtrip_is_lossless(spark):
    sf = "/root/testdata/sf0.001"
    row = E._store_roundtrip_csv(spark, sf).head()
    src = E._emb(spark, sf)
    n = src.count()
    assert row.n_rows == n
    assert row.dim_sum == n * 64
    # element checksum equals the one computed directly on the parquet
    elem = F.aggregate(
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * 1_000_000).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    direct = src.agg(F.sum(elem).alias("s")).head().s
    assert row.elem_micro_sum == direct


def test_late_rows_for_evicted_windows_are_dropped(spark, tmp_path):
    # the guarantee stream_events_late_drop gates: once a window was
    # emitted (state evicted, watermark checkpointed), late rows targeting
    # it are dropped — run 2 appends nothing and reports watermark drops
    import pyarrow as pa
    import pyarrow.parquet as pq

    in_dir, ck = tmp_path / "in", str(tmp_path / "ck")
    in_dir.mkdir()
    out = []

    def write(name, hours):
        t = pa.table(
            {
                "ts_us": pa.array(
                    [int(h * 3600 * 1_000_000) for h in hours], pa.int64()
                ),
                "event_type": pa.array(["x"] * len(hours), pa.string()),
            }
        )
        pq.write_table(t, str(in_dir / name))

    def run():
        stream = (
            spark.readStream.schema("ts_us long, event_type string")
            .option("pathGlobFilter", "*.parquet")
            .parquet(str(in_dir))
        )
        agg = (
            stream.withColumn("event_time", F.timestamp_micros("ts_us"))
            .withWatermark("event_time", "1 hour")
            .groupBy(F.window("event_time", "30 minutes").alias("w"), "event_type")
            .agg(F.count("*").alias("n"))
        )
        q = (
            agg.writeStream.foreachBatch(
                lambda df, bid: out.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    write("a.parquet", [10, 5])  # watermark lands at 09:00; 05:00 window emits
    run()
    assert [(r.w.start.hour, r.n) for r in out] == [(5, 1)]

    write("b.parquet", [5, 5])  # late duplicates for the evicted window
    q2 = run()
    assert [(r.w.start.hour, r.n) for r in out] == [(5, 1)]  # nothing re-emitted
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in q2.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped >= 1


def test_compact_shrinks_files_and_preserves_sidecar(spark, tmp_path):
    import os

    from educational_vector_database_spark.sources import store as S

    emb = E._emb(spark, "/root/testdata/sf0.001")
    path = str(tmp_path / "store")
    for i in range(4):
        S.save(
            emb.filter(F.col("vec_id") % 4 == i).repartition(4),
            path,
            S.StoreConfig(dim=64, metric="dot"),
            mode="append" if i else "overwrite",
        )
    n_before = sum(1 for n in os.listdir(path) if n.endswith(".parquet"))
    rows_before = spark.read.parquet(path).count()
    n_after = S.compact(spark, path, target_files=2)
    assert n_after == 2 < n_before
    back, cfg = S.load(spark, path)
    assert back.count() == rows_before
    assert (cfg.dim, cfg.metric) == (64, "dot")  # sidecar preserved verbatim
    assert not os.path.exists(path + ".old")  # swap completed cleanly


def test_bigram_logp_rounding_margin():
    # docs_bigram_logprob's only transcendental: round(ln((c+1)/(ctx+37))
    # * 1e6) per distinct bigram. JVM and libm ln may differ in the last
    # ulp, so every reachable value must sit far from a rounding boundary
    # relative to that drift (same discipline as the TF-IDF integer idf).
    import math

    import duckdb

    worst = 1.0
    for sf in ("0.001", "0.01", "0.1"):
        pairs = duckdb.sql(f"""
            WITH norm AS (
                SELECT trim(regexp_replace(regexp_replace(lower(text),
                       '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS t
                FROM '/root/testdata/sf{sf}/documents.parquet'
            ),
            pos AS (
                SELECT substr(t, CAST(t2.i AS INT), 2) AS bg
                FROM norm, unnest(range(1, length(t))) AS t2(i)
                WHERE length(t) >= 2
            ),
            model AS (SELECT bg, count(*) AS c, substr(bg,1,1) AS ctx
                      FROM pos GROUP BY bg),
            ctx_totals AS (SELECT ctx, sum(c) AS ct FROM model GROUP BY ctx)
            SELECT DISTINCT m.c, t.ct FROM model m JOIN ctx_totals t USING (ctx)
        """).fetchall()
        for c, ct in pairs:
            v = math.log((int(c) + 1) / (int(ct) + 37)) * 1e6
            dist = abs(v - math.floor(v) - 0.5)  # distance from the .5 boundary
            worst = min(worst, dist)
    # ulp drift of ln at this magnitude is ~1e-10; require 4 orders margin
    assert worst > 1e-6, worst


def test_compact_recovers_from_crash_between_renames(spark, tmp_path):
    # a crash after `rename(path, path+".old")` but before
    # `rename(staging, path)` leaves the data only in .old; compact() and
    # load() must self-heal by renaming it back on entry
    import os

    from educational_vector_database_spark.sources import store as S

    emb = E._emb(spark, "/root/testdata/sf0.001")
    path = str(tmp_path / "store")
    S.save(emb.repartition(4), path, S.StoreConfig(dim=64, metric="dot"))
    rows = spark.read.parquet(path).count()
    os.rename(path, path + ".old")  # simulate the mid-swap crash state

    n_after = S.compact(spark, path, target_files=2)
    assert n_after == 2
    back, cfg = S.load(spark, path)
    assert back.count() == rows
    assert (cfg.dim, cfg.metric) == (64, "dot")
    assert not os.path.exists(path + ".old")
