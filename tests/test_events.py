"""Event-stream operators: batch semantics + true Structured Streaming run."""

import shutil

import pytest
from pyspark.sql import functions as F

from entitymatchingmodel_spark.operators.events import (
    extract_json_prop,
    load_events,
    sessionize,
    windowed_agg,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_events(spark, f"{SF_DIR}/events.parquet")


def _stream_events(spark, src):
    """Streaming read matching the batch loader's ts normalization.

    Self-contained: pins the same confs load_events pins (nanosAsLong for
    the schema sniff, UTC so the NTZ->timestamp cast is order-independent),
    and derives the stream ts DDL from the sniffed batch dtype instead of
    assuming NTZ for every non-long encoding."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ts_ddl = raw.schema["ts"].dataType.simpleString()
    stream = spark.readStream.schema(
        f"event_id long, ts {ts_ddl}, user_id long, event_type string, value double, props string"
    ).parquet(str(src))
    if ts_ddl == "bigint":
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def test_windowed_agg_totals(events):
    out = windowed_agg(events, window_duration="1 hour")
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()


def test_sessionize_invariants(events):
    sess = sessionize(events, gap_minutes=30)
    rows = sess.collect()
    assert sum(r["n_events"] for r in rows) == events.count()
    assert all(r["session_start"] <= r["session_end"] for r in rows)
    # session ids are 1..n per user
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r["session_id"])
    for sids in per_user.values():
        assert sorted(sids) == list(range(1, len(sids) + 1))


def test_extract_json_prop(events):
    out = extract_json_prop(events).select("prop_k").limit(5).collect()
    assert all(r["prop_k"] is not None for r in out)


def test_streaming_windowed_agg_matches_batch(spark, events, tmp_path):
    """The SAME windowed_agg plan on a streaming source must reproduce the
    batch result (complete mode, one file's worth of data)."""
    src = tmp_path / "stream_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "events.parquet")

    stream = _stream_events(spark, src)
    out = windowed_agg(stream, window_duration="1 hour", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
            for r in spark.sql("select * from winagg").collect()
        }
    finally:
        q.stop()
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in windowed_agg(events, window_duration="1 hour").collect()
    }
    assert got == want and len(got) > 0


def test_stateful_running_totals_matches_batch(spark, tmp_path):
    """applyInPandasWithState running totals == batch groupBy on one batch."""
    import shutil

    from entitymatchingmodel_spark.streaming.stateful import running_totals

    src = tmp_path / "stateful_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "events.parquet")
    stream = _stream_events(spark, src)
    q = (
        running_totals(stream)
        .writeStream.format("memory")
        .queryName("rt_test")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["key"]: (r["n_events"], round(r["total_value"], 6))
            for r in spark.sql("select * from rt_test").collect()
        }
    finally:
        q.stop()
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
    )
    want = {r["user_id"]: (r["n"], round(r["t"], 6)) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_asof_join_hand_cases(spark):
    from entitymatchingmodel_spark.operators.events import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:30"), (1, "2024-01-01 00:05:00"),
         (1, "2024-01-01 00:20:00"), (2, "2024-01-01 00:10:00"),
         (3, "2024-01-01 00:10:00")],
        "user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00", 10.0), (1, "2024-01-01 00:10:00", 20.0),
         (2, "2024-01-01 00:10:00", 30.0)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out = {
        (r["user_id"], str(r["ts"])): r["asof_value"]
        for r in asof_join(left, right, "user_id", "ts", ["value"]).collect()
    }
    assert out[(1, "2024-01-01 00:00:30")] is None   # nothing before
    assert out[(1, "2024-01-01 00:05:00")] == 10.0   # backward match
    assert out[(1, "2024-01-01 00:20:00")] == 20.0   # most recent wins
    assert out[(2, "2024-01-01 00:10:00")] == 30.0   # equal ts inclusive
    assert out[(3, "2024-01-01 00:10:00")] is None   # no right rows for key

    tol = {
        (r["user_id"], str(r["ts"])): r["asof_value"]
        for r in asof_join(left, right, "user_id", "ts", ["value"],
                           tolerance_seconds=300).collect()
    }
    assert tol[(1, "2024-01-01 00:20:00")] is None   # 10 min > 5 min tolerance
    assert tol[(1, "2024-01-01 00:05:00")] == 10.0   # 4 min within tolerance


def test_interval_join_exact_containment_no_nested_loop(spark):
    from entitymatchingmodel_spark.operators.events import interval_join
    from entitymatchingmodel_spark.plans import explain_str

    points = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00"), (1, "2024-01-01 02:00:00"),
         (1, "2024-01-01 03:30:01"), (2, "2024-01-01 00:30:00")],
        "user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ivs = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
         (1, 20, "2024-01-01 01:30:00", "2024-01-01 03:30:00"),
         (2, 30, "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
        "user_id long, iv_id long, s string, e string",
    ).withColumn("s", F.col("s").cast("timestamp")).withColumn(
        "e", F.col("e").cast("timestamp")
    )
    out = interval_join(points, ivs, "user_id", "ts", "s", "e")
    got = {(r["user_id"], str(r["ts"]), r["iv_id"]) for r in out.collect()}
    assert got == {
        (1, "2024-01-01 00:30:00", 10),
        (1, "2024-01-01 02:00:00", 20),   # multi-bucket interval covered
        (2, "2024-01-01 00:30:00", 30),   # key isolation
        # (1, 03:30:01) is 1s past interval 20's end -> no match
    }
    plan = explain_str(out)
    assert "NestedLoop" not in plan, "range join must stay an equi-join"


def test_asof_join_null_values_come_from_matched_row(spark):
    """All output columns must come from the SAME matched right row, even
    when a right value column is NULL there (DuckDB/pandas take the single
    matched row including its NULLs; independent last(col, ignorenulls)
    per column would stitch values from different rows)."""
    from entitymatchingmodel_spark.operators.events import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00")], "user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00", 10.0, "a"),
         (1, "2024-01-01 00:05:00", None, None)],   # matched row has NULLs
        "user_id long, ts string, value double, tag string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = asof_join(left, right, "user_id", "ts", ["value", "tag"]).collect()[0]
    assert str(r["asof_ts"]) == "2024-01-01 00:05:00"
    assert r["asof_value"] is None and r["asof_tag"] is None


def test_asof_join_forward_and_nearest(spark):
    from entitymatchingmodel_spark.operators.events import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:04:00"), (1, "2024-01-01 00:09:00"),
         (1, "2024-01-01 00:30:00")],
        "user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00", 10.0), (1, "2024-01-01 00:10:00", 20.0)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    fwd = {
        str(r["ts"]): r["asof_value"]
        for r in asof_join(left, right, "user_id", "ts", ["value"],
                           direction="forward").collect()
    }
    assert fwd["2024-01-01 00:04:00"] == 20.0   # earliest at-or-after
    assert fwd["2024-01-01 00:09:00"] == 20.0
    assert fwd["2024-01-01 00:30:00"] is None   # nothing after

    near = {
        str(r["ts"]): r["asof_value"]
        for r in asof_join(left, right, "user_id", "ts", ["value"],
                           direction="nearest").collect()
    }
    assert near["2024-01-01 00:04:00"] == 10.0  # 3m back < 6m fwd
    assert near["2024-01-01 00:09:00"] == 20.0  # 1m fwd < 8m back
    assert near["2024-01-01 00:30:00"] == 20.0  # only backward exists

    # nearest with per-side tolerance: 00:09 loses its forward match when
    # tolerance excludes nothing nearer than backward
    near_tol = {
        str(r["ts"]): r["asof_value"]
        for r in asof_join(left, right, "user_id", "ts", ["value"],
                           direction="nearest", tolerance_seconds=30).collect()
    }
    assert near_tol["2024-01-01 00:09:00"] is None  # both sides > 30s away


def test_asof_equal_backward_forward_tie_goes_backward(spark):
    from entitymatchingmodel_spark.operators.events import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00")], "user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:04:00", 1.0), (1, "2024-01-01 00:06:00", 2.0)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = asof_join(left, right, "user_id", "ts", ["value"],
                  direction="nearest").collect()[0]
    assert r["asof_value"] == 1.0  # 1m either way -> backward wins (pandas)


def test_dedup_right_latest_deterministic(spark):
    from entitymatchingmodel_spark.operators.events import dedup_right_latest

    right = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00", 10.0), (1, "2024-01-01 00:01:00", 30.0),
         (1, "2024-01-01 00:02:00", 5.0)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        str(r["ts"]): r["value"]
        for r in dedup_right_latest(right, "user_id", "ts", ["value"]).collect()
    }
    assert got == {"2024-01-01 00:01:00": 30.0, "2024-01-01 00:02:00": 5.0}


def test_interval_join_auto_bucket_bounds_explode(spark):
    """A months-long outlier interval must not explode to thousands of
    rows: the auto bucket floors at max_duration/max_explode."""
    from entitymatchingmodel_spark.operators.events import (
        _auto_bucket_us,
        interval_join,
    )

    ivs = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
         (1, 2, "2024-01-01 00:00:00", "2024-06-01 00:00:00")],  # ~5 months
        "user_id long, iv_id long, s string, e string",
    ).withColumn("s", F.col("s").cast("timestamp")).withColumn(
        "e", F.col("e").cast("timestamp")
    )
    bucket_us = _auto_bucket_us(ivs, "s", "e", max_explode=256)
    max_dur_us = (152 * 24 * 3600) * 1_000_000
    assert bucket_us >= max_dur_us // 256, "longest interval must explode <= max_explode+1 rows"

    points = spark.createDataFrame(
        [(1, "2024-03-01 12:00:00"), (1, "2024-01-01 00:30:00")],
        "user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {(r["ts"].isoformat(), r["iv_id"]) for r in
           interval_join(points, ivs, "user_id", "ts", "s", "e").collect()}
    assert got == {("2024-03-01T12:00:00", 2),
                   ("2024-01-01T00:30:00", 1), ("2024-01-01T00:30:00", 2)}


def test_asof_join_matches_pandas_merge_asof_random(spark):
    """All three directions (with and without tolerance) must reproduce
    pandas merge_asof — the public reference semantics — on random data
    with duplicate left timestamps and multiple keys."""
    import random

    import pandas as pd

    from entitymatchingmodel_spark.operators.events import asof_join

    rng = random.Random(17)
    base = pd.Timestamp("2024-01-01")
    left_rows = [
        (i, rng.randint(1, 4), base + pd.Timedelta(seconds=rng.randint(0, 5000)))
        for i in range(120)
    ]
    right_rows = []
    seen = set()
    for _ in range(60):
        k = (rng.randint(1, 5), base + pd.Timedelta(seconds=rng.randint(0, 5000)))
        if k in seen:
            continue
        seen.add(k)
        right_rows.append((*k, rng.random()))

    lpdf = pd.DataFrame(left_rows, columns=["event_id", "key", "ts"])
    rpdf = pd.DataFrame(right_rows, columns=["key", "ts", "value"])
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 600):
            want_df = pd.merge_asof(
                lpdf.sort_values("ts", kind="mergesort"),
                rpdf.sort_values("ts", kind="mergesort"),
                on="ts", by="key", direction=direction,
                tolerance=None if tol is None else pd.Timedelta(seconds=tol),
            )
            want = {
                r.event_id: (None if pd.isna(r.value) else round(r.value, 9))
                for r in want_df.itertuples()
            }
            got_df = asof_join(
                left, right, "key", "ts", ["value"],
                tolerance_seconds=tol, direction=direction,
            ).collect()
            got = {
                r["event_id"]: (None if r["asof_value"] is None else round(r["asof_value"], 9))
                for r in got_df
            }
            assert got == want, (direction, tol)


def test_asof_join_reserved_value_col_raises(spark):
    from entitymatchingmodel_spark.operators.events import asof_join

    df = spark.createDataFrame([(1, "2024-01-01 00:00:00")], "k long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="_ts"):
        asof_join(df, df.withColumn("_ts", F.col("ts")), "k", "ts", ["_ts"])


def test_scoped_conf_restores_prior_values(spark):
    from entitymatchingmodel_spark.operators.events import scoped_conf

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    with scoped_conf(spark, spark__sql__session__timeZone="America/New_York"):
        assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    # restore runs on exception too
    with pytest.raises(RuntimeError):
        with scoped_conf(spark, spark__sql__session__timeZone="America/New_York"):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_load_events_scopes_nanos_conf_and_still_executes(spark):
    """The analysis-time nanosAsLong flag must not bleed past load_events,
    and the returned (lazy) frame must still execute after the restore."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    ev = load_events(spark, f"{SF_DIR}/events.parquet")
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false"
    assert ev.count() > 0
    assert ev.schema["ts"].dataType.simpleString() == "timestamp"
    # utc=False leaves the session TZ untouched
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    load_events(spark, f"{SF_DIR}/events.parquet", utc=False)
    assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_interval_join_persist_handles_no_leak(spark):
    """Auto-bucket mode persists the interval side; the handle must come
    back through persist_handles and unpersist must actually release it."""
    from entitymatchingmodel_spark.operators.events import interval_join

    ivs = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
        "user_id long, iv_id long, s string, e string",
    ).withColumn("s", F.col("s").cast("timestamp")).withColumn(
        "e", F.col("e").cast("timestamp"))
    points = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00")], "user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    handles = []
    out = interval_join(points, ivs, "user_id", "ts", "s", "e",
                        persist_handles=handles)
    assert out.count() == 1
    assert len(handles) == 1 and handles[0].storageLevel.useMemory
    for h in handles:
        h.unpersist(blocking=True)
    assert handles[0].storageLevel.useMemory is False


def test_events_null_ts_and_key_behavior_pinned(spark):
    """NULL timestamps/keys must not crash or silently lose rows where the
    contract is row-preserving: sessionize keeps a NULL-ts event as its own
    session (NULL bounds) and asof_join keeps every left row (NULL match
    for NULL ts/key). interval_join is inner-join by spec, so unmatched
    NULL rows dropping there is the documented semantics."""
    import datetime

    from pyspark.sql import functions as F

    from entitymatchingmodel_spark.operators.events import asof_join, sessionize

    T = datetime.datetime
    ev = spark.createDataFrame(
        [(1, 10, T(2024, 1, 1, 0, 0), "click", 1.0),
         (2, 10, T(2024, 1, 1, 0, 30), "purchase", 5.0),
         (3, 10, None, "click", 2.0),
         (4, None, T(2024, 1, 1, 1, 0), "click", 3.0)],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    sess = sessionize(ev, gap_minutes=30).collect()
    assert sum(r["n_events"] for r in sess) == 4, "every event sessionized"
    null_ts_sessions = [r for r in sess if r["session_start"] is None]
    assert len(null_ts_sessions) == 1 and null_ts_sessions[0]["n_events"] == 1

    right = (ev.filter(F.col("event_type") == "purchase")
             .groupBy("user_id", "ts").agg(F.max("value").alias("v")))
    out = {r["event_id"]: r for r in
           asof_join(ev.select("event_id", "user_id", "ts"), right,
                     "user_id", "ts", ["v"], tolerance_seconds=3600).collect()}
    assert set(out) == {1, 2, 3, 4}, "asof_join keeps every left row"
    assert out[3]["asof_v"] is None and out[4]["asof_v"] is None
    assert out[2]["asof_v"] == 5.0

    # windowed_agg: an event with no timestamp belongs to no time window —
    # Spark's window() drops it, the standard semantics (same class as the
    # interval inner join); the remaining events aggregate normally
    from entitymatchingmodel_spark.operators.events import windowed_agg

    wrows = windowed_agg(ev).collect()
    assert sum(r["n_events"] for r in wrows) == 3


def test_interval_join_left_outer(spark):
    """how='left' keeps uncovered points with NULL interval columns;
    multiset correctness holds for duplicate point rows (each matched copy
    cancels in the exceptAll complement)."""
    import datetime

    import pytest
    from pyspark.sql import functions as F

    from entitymatchingmodel_spark.operators.events import interval_join

    T = datetime.datetime
    pts = spark.createDataFrame(
        [(1, 10, T(2024, 1, 1, 0, 15)),      # inside session A
         (2, 10, T(2024, 1, 1, 5, 0)),       # no session covers it
         (3, 20, T(2024, 1, 1, 0, 15)),      # key with no intervals at all
         (4, 10, T(2024, 1, 1, 5, 0)),       # duplicate-shape unmatched row
         ],
        "event_id long, user_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(10, T(2024, 1, 1, 0, 0), T(2024, 1, 1, 0, 30), "A")],
        "user_id long, s timestamp, e timestamp, tag string",
    )
    out = {r["event_id"]: r for r in
           interval_join(pts, iv, "user_id", "ts", "s", "e",
                         bucket_minutes=30, how="left").collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["tag"] == "A"
    for eid in (2, 3, 4):
        assert out[eid]["tag"] is None and out[eid]["s"] is None, eid
    # inner mode unchanged; bad how rejected
    inner = interval_join(pts, iv, "user_id", "ts", "s", "e",
                          bucket_minutes=30).collect()
    assert {r["event_id"] for r in inner} == {1}
    with pytest.raises(ValueError, match="how"):
        interval_join(pts, iv, "user_id", "ts", "s", "e", how="full")

    # true duplicate point rows: two identical matched copies both survive
    # as matches; two identical unmatched copies both survive as NULL rows
    dup = spark.createDataFrame(
        [(10, T(2024, 1, 1, 0, 15)), (10, T(2024, 1, 1, 0, 15)),
         (10, T(2024, 1, 1, 9, 0)), (10, T(2024, 1, 1, 9, 0))],
        "user_id long, ts timestamp",
    )
    res = interval_join(dup, iv, "user_id", "ts", "s", "e",
                        bucket_minutes=30, how="left").collect()
    assert len(res) == 4
    assert sum(r["tag"] == "A" for r in res) == 2
    assert sum(r["tag"] is None for r in res) == 2


def test_interval_join_left_rejects_ambiguous_columns(spark):
    """how='left' fails fast with a clear ValueError when the two sides
    share a non-key column name (the complement re-select would otherwise
    die with AMBIGUOUS_REFERENCE at runtime)."""
    import datetime

    import pytest

    from entitymatchingmodel_spark.operators.events import interval_join

    T = datetime.datetime
    pts = spark.createDataFrame(
        [(10, T(2024, 1, 1), "web")], "user_id long, ts timestamp, source string"
    )
    iv = spark.createDataFrame(
        [(10, T(2024, 1, 1), T(2024, 1, 2), "crm")],
        "user_id long, s timestamp, e timestamp, source string",
    )
    with pytest.raises(ValueError, match="source"):
        interval_join(pts, iv, "user_id", "ts", "s", "e",
                      bucket_minutes=60, how="left")
