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
