"""Event-stream operators (batch + Structured Streaming shapes).

Beyond-reference operators for the events table: the same logical plans run
on a batch DataFrame or a streaming one — `F.window` event-time aggregation
is THE Structured Streaming agg primitive, and `sessionize` is the batch
twin of `session_window`/`applyInPandasWithState` sessionization (the gap
rule is identical; the streaming variant needs only a watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load_events(spark: SparkSession, path: str, ts_col: str = "ts") -> DataFrame:
    """Read an events parquet, MUTATING two session-wide confs as a side
    effect: ``spark.sql.legacy.parquet.nanosAsLong=true`` and
    ``spark.sql.session.timeZone=UTC``.  Any later query in the same
    session with local-time semantics will see UTC; call sites that need a
    different TZ must restore it themselves.

    Handles both testdata encodings seen across driver rounds:
    - TIMESTAMP(NANOS) parquet, which Spark's vectorized reader rejects —
      read nanos as long (``spark.sql.legacy.parquet.nanosAsLong``) and
      convert to micros;
    - TIMESTAMP(MICROS)/NTZ parquet — read natively and cast to the
      session-TZ timestamp type.

    Pins the session TZ to UTC so wall times match naive oracle timestamps.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(path)
    if ev.schema[ts_col].dataType.simpleString() == "bigint":
        return ev.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    return ev.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def windowed_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Event-time window aggregation: (window_start, key, n, sum).

    Tumbling by default; pass ``slide_duration`` for sliding windows (each
    event contributes to window/slide overlapping windows — Spark expands
    this natively inside the same hash aggregation).  Works unchanged on a
    streaming DataFrame; pass ``watermark`` there so state can be evicted
    for late data.
    """
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        df.groupBy(
            win.alias("w"),
            F.col(key_col),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "sum_value")
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization: one row per (user, session).

    session boundary = inter-event gap > gap_minutes; session_id is the
    running count of boundaries per user (one shuffle on user, two window
    passes). Streaming twin: ``F.session_window`` with a watermark.

    The gap is computed at full microsecond precision (``unix_micros``) —
    casting a timestamp to long truncates sub-second precision and can flip
    session membership when a gap straddles the boundary by <1s.  Tied
    timestamps don't affect session membership (a 0 gap never opens a
    session), but ``tiebreak_cols`` makes the window ordering deterministic
    for downstream per-row consumers.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    micros = F.unix_micros(F.col(ts_col))
    gap = micros - F.lag(micros).over(w)
    marked = events.withColumn(
        "_new",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0),
    )
    ws = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = marked.withColumn("session_id", F.sum("_new").over(ws))
    return (
        sess.groupBy(user_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )


def extract_json_prop(
    events: DataFrame, props_col: str = "props", path: str = "$.k", out: str = "prop_k"
) -> DataFrame:
    """Native JSON extraction (get_json_object — JVM-side, codegen)."""
    return events.withColumn(out, F.get_json_object(F.col(props_col), path))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gets the value columns of the
    most recent right row with ``right.ts <= left.ts`` for the same key
    (DuckDB/pandas ``ASOF JOIN`` semantics; Spark has no native operator).

    Scalable formulation — NOT a range join: tag both inputs, union them,
    and take ``last(value, ignorenulls=True)`` over a per-key window
    ordered by (ts, tag) with right rows sorting first at equal
    timestamps.  One shuffle on the key, no per-row range expansion, and
    the window is a running frame (rows between unbounded preceding and
    current row), which Spark evaluates in a single pass per partition.

    ``tolerance_seconds`` nulls out matches older than the tolerance,
    like pandas ``merge_asof(tolerance=...)``.

    Right rows should be unique per (key, ts); at duplicate timestamps
    the LAST in (ts, tag) order wins, which is deterministic only if the
    caller pre-aggregates duplicates away.
    """
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"_r_{v}") for v in value_cols],
        F.lit(None).cast("timestamp").alias("_r_ts"),
    )
    r_tagged = right.select(
        *[
            F.col(key_col) if c == key_col else F.col(ts_col) if c == ts_col
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_tag"),
        *[F.col(v).alias(f"_r_{v}") for v in value_cols],
        F.col(ts_col).alias("_r_ts"),
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched_ts = F.last("_r_ts", ignorenulls=True).over(w)
    out = u.select(
        *lcols,
        "_tag",
        matched_ts.alias("_m_ts"),
        *[
            F.last(f"_r_{v}", ignorenulls=True).over(w).alias(f"asof_{v}")
            for v in value_cols
        ],
    ).filter(F.col("_tag") == 1)
    if tolerance_seconds is not None:
        in_tol = (
            F.col("_m_ts").isNotNull()
            & (F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("_m_ts"))
               <= tolerance_seconds * 1_000_000)
        )
        out = out.select(
            *lcols,
            F.when(in_tol, F.col("_m_ts")).alias("asof_ts"),
            *[F.when(in_tol, F.col(f"asof_{v}")).alias(f"asof_{v}") for v in value_cols],
        )
    else:
        out = out.select(
            *lcols,
            F.col("_m_ts").alias("asof_ts"),
            *[F.col(f"asof_{v}") for v in value_cols],
        )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_minutes: int = 60,
) -> DataFrame:
    """Range join: each point row matched to every interval row of the same
    key with ``start <= ts <= end`` (inclusive).

    Spark plans a naive inequality join as BroadcastNestedLoop — quadratic
    per key.  This formulation stays an EQUI-join: intervals explode to
    every coarse time bucket they cover (``sequence`` of bucket ids),
    points carry their single bucket, the join runs on (key, bucket), and
    an exact containment filter follows.  A (point, interval) pair can
    only meet in the point's bucket, so no dedup step is needed.  Work is
    bounded by interval-duration / bucket size, not by row counts.
    """
    bucket_us = bucket_minutes * 60 * 1_000_000
    p = points.withColumn(
        "_b", F.floor(F.unix_micros(F.col(ts_col)) / F.lit(bucket_us))
    )
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / F.lit(bucket_us)),
                F.floor(F.unix_micros(F.col(end_col)) / F.lit(bucket_us)),
            )
        ),
    )
    joined = p.join(iv, [key_col, "_b"]).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("_b")
