"""Event-stream operators (batch + Structured Streaming shapes).

Beyond-reference operators for the events table: the same logical plans run
on a batch DataFrame or a streaming one — `F.window` event-time aggregation
is THE Structured Streaming agg primitive, and `sessionize` is the batch
twin of `session_window`/`applyInPandasWithState` sessionization (the gap
rule is identical; the streaming variant needs only a watermark).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


@contextmanager
def scoped_conf(spark: SparkSession, **confs: str):
    """Set session confs for the duration of a ``with`` block, restoring
    each to its prior value (or unsetting it if it was unset) on exit.
    Conf keys use ``__`` as the ``.`` separator so they can be passed as
    Python keywords: ``scoped_conf(spark, spark__sql__session__timeZone="UTC")``.

    Restores happen even on exception.  Note that Spark confs are read at
    different times per conf — analysis-time confs (e.g. the parquet
    nanosAsLong flag) are safe to scope around an eager ``spark.read``;
    execution-time confs (e.g. the session time zone for window/date
    expressions) must still be set when the downstream LAZY plan actually
    runs, so scoping them around only the read would change results."""
    saved: dict[str, str | None] = {}
    try:
        for k, v in confs.items():
            key = k.replace("__", ".")
            try:
                saved[key] = spark.conf.get(key)
            except Exception:
                saved[key] = None
            spark.conf.set(key, v)
        yield spark
    finally:
        for key, old in saved.items():
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize a timestamp column from either testdata encoding:
    nanos-as-long (``spark.sql.legacy.parquet.nanosAsLong``) -> micros
    timestamp, or native timestamp/NTZ -> session-TZ timestamp.  Shared by
    the batch reader and the streaming contract query so the two paths
    cannot diverge."""
    if df.schema[ts_col].dataType.simpleString() == "bigint":
        return df.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def load_events(
    spark: SparkSession, path: str, ts_col: str = "ts", utc: bool = True
) -> DataFrame:
    """Read an events parquet, handling both testdata encodings seen
    across driver rounds:

    - TIMESTAMP(NANOS) parquet, which Spark's vectorized reader rejects —
      read nanos as long (``spark.sql.legacy.parquet.nanosAsLong``) and
      convert to micros;
    - TIMESTAMP(MICROS)/NTZ parquet — read natively and cast to the
      session-TZ timestamp type.

    Conf hygiene: ``nanosAsLong`` is an ANALYSIS-time conf — it is scoped
    to the eager ``spark.read`` below and restored before returning (the
    resolved scan keeps its behavior), so it never bleeds into later
    parquet reads in the session.  The session time zone, by contrast, is
    read when the downstream LAZY plan executes — restoring it here would
    silently shift window/date_trunc results at action time — so with the
    default ``utc=True`` it is pinned to UTC session-wide (matching
    :func:`session.get_spark`'s session-creation default, i.e. a no-op in
    sessions built by this package) so wall times match naive oracle
    timestamps.  Pass ``utc=False`` to leave the session TZ untouched, or
    use :func:`scoped_conf` for block-scoped control.
    """
    with scoped_conf(spark, spark__sql__legacy__parquet__nanosAsLong="true"):
        df = spark.read.parquet(path)
    if utc:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    return normalize_event_ts(df, ts_col)


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


def dedup_right_latest(
    right: DataFrame, key_col: str, ts_col: str, value_cols: list[str]
) -> DataFrame:
    """Collapse duplicate (key, ts) right-side rows deterministically for
    :func:`asof_join`: keep the lexicographically largest value tuple per
    timestamp (``max(struct(values))`` — one hash aggregate, engine-stable
    tie-break regardless of input order/partitioning)."""
    vs = F.max(F.struct(*[F.col(v).alias(v) for v in value_cols])).alias("_v")
    agg = right.groupBy(key_col, ts_col).agg(vs)
    return agg.select(key_col, ts_col, *[F.col(f"_v.{v}").alias(v) for v in value_cols])


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row gets the value columns of the matching
    right row for the same key (DuckDB ``ASOF JOIN`` / pandas
    ``merge_asof`` semantics; Spark has no native operator).

    ``direction``:
    - ``backward`` (default): most recent right row with ``r.ts <= l.ts``;
    - ``forward``: earliest right row with ``r.ts >= l.ts``;
    - ``nearest``: whichever of the two is closer in absolute time
      (tolerance is applied per side first; ties go backward, matching
      pandas ``merge_asof(direction="nearest")``).

    Scalable formulation — NOT a range join: tag both inputs, union them,
    and take ``last(match_struct, ignorenulls=True)`` over a per-key
    window ordered by (ts, tag) with right rows sorting first at equal
    timestamps (order reversed for forward).  One shuffle on the key, no
    per-row range expansion, and each window is a running frame (rows
    between unbounded preceding and current row) evaluated in a single
    pass per partition; ``nearest`` costs a second sort of the same
    exchange, not a second shuffle.

    The matched timestamp AND all value columns are extracted from ONE
    struct carried through the window, so every output column comes from
    the same matched right row even when right-side value columns contain
    NULLs (an independent ``last(col, ignorenulls)`` per column would
    stitch values from different rows — diverging from DuckDB/pandas,
    which take the single matched row including its NULLs).

    ``tolerance_seconds`` nulls out matches farther than the tolerance,
    like pandas ``merge_asof(tolerance=...)``.

    Right rows should be unique per (key, ts); at duplicate timestamps
    the winner is order-dependent — pre-aggregate with
    :func:`dedup_right_latest` (or your own groupBy) for determinism.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    reserved = {"_tag", "_r", "_m", "_mb", "_mf"} & set(left.columns)
    if reserved:
        raise ValueError(f"asof_join reserves column names {sorted(reserved)}; rename them")
    if "_ts" in value_cols:
        raise ValueError(
            "asof_join reserves '_ts' inside its match struct; rename the value column"
        )
    out_names = {"asof_ts"} | {f"asof_{v}" for v in value_cols}
    clash = out_names & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join would emit duplicate columns {sorted(clash)} — the left "
            "side already has them (chained as-of joins: rename the earlier "
            "outputs or the value columns first)"
        )
    lcols = [c for c in left.columns]
    # One struct per right row: non-null exactly for right rows, so
    # last(_r, ignorenulls=True) returns the whole matched row at once.
    r_struct_t = (
        "struct<_ts:timestamp,"
        + ",".join(f"`{v}`:{right.schema[v].dataType.simpleString()}" for v in value_cols)
        + ">"
    )
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r_struct_t).alias("_r"),
    )
    r_tagged = right.select(
        *[
            F.col(key_col) if c == key_col else F.col(ts_col) if c == ts_col
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_tag"),
        F.struct(
            F.col(ts_col).alias("_ts"), *[F.col(v).alias(v) for v in value_cols]
        ).alias("_r"),
    )
    u = l_tagged.unionByName(r_tagged)

    def matched(dir_: str):
        if dir_ == "backward":
            order = [F.col(ts_col).asc(), F.col("_tag").asc()]
        else:  # forward: scan in descending ts; right rows first at equal ts
            order = [F.col(ts_col).desc(), F.col("_tag").asc()]
        w = (
            Window.partitionBy(key_col)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("_r", ignorenulls=True).over(w)

    def in_tol(m, dir_):
        gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(m["_ts"])
        if dir_ == "forward":
            gap = -gap
        ok = m.isNotNull()
        if tolerance_seconds is not None:
            ok = ok & (gap <= tolerance_seconds * 1_000_000)
        return F.when(ok, m)

    if direction in ("backward", "forward"):
        out = u.select(*lcols, "_tag", in_tol(matched(direction), direction).alias("_m"))
    else:
        stage = u.select(
            *lcols, "_tag",
            in_tol(matched("backward"), "backward").alias("_mb"),
            in_tol(matched("forward"), "forward").alias("_mf"),
        )
        bgap = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("_mb._ts"))
        fgap = F.unix_micros(F.col("_mf._ts")) - F.unix_micros(F.col(ts_col))
        pick = (
            F.when(F.col("_mb").isNull(), F.col("_mf"))
            .when(F.col("_mf").isNull(), F.col("_mb"))
            .when(fgap < bgap, F.col("_mf"))
            .otherwise(F.col("_mb"))  # tie -> backward, as pandas
        )
        out = stage.select(*lcols, "_tag", pick.alias("_m"))
    return out.filter(F.col("_tag") == 1).select(
        *lcols,
        F.col("_m._ts").alias("asof_ts"),
        *[F.col(f"_m.{v}").alias(f"asof_{v}") for v in value_cols],
    )


def _auto_bucket_us(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    max_explode: int = 256,
) -> int:
    """Derive the interval-join bucket width from the data: the p95
    interval duration (so 95% of intervals explode to <= ~2 bucket rows),
    floored so the LONGEST interval explodes to at most ``max_explode``
    rows, and never below one minute.  One tiny two-column aggregate job
    over the interval side — cheap next to the join it sizes, and it makes
    a pathological months-long interval unable to silently inflate the
    explode (the caller-tuned fixed bucket could explode it to thousands
    of rows)."""
    dur = F.unix_micros(F.col(end_col)) - F.unix_micros(F.col(start_col))
    row = intervals.select(
        F.max(dur).alias("mx"), F.percentile_approx(dur, 0.95).alias("p95")
    ).first()
    if row is None or row["mx"] is None:
        return 60 * 1_000_000
    minute_us = 60 * 1_000_000
    p95 = max(int(row["p95"] or 0), minute_us)
    floor_us = int(row["mx"]) // max_explode + 1
    return max(p95, floor_us)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_minutes: int | None = None,
    persist_handles: list | None = None,
    how: str = "inner",
) -> DataFrame:
    """Range join: each point row matched to every interval row of the same
    key with ``start <= ts <= end`` (inclusive).

    ``how="left"`` keeps points with NO containing interval as one row
    with NULL interval columns (the as-of-join convention).  The
    unmatched set is computed with ``exceptAll`` over the point columns —
    multiset arithmetic, so duplicate point rows stay correct (each copy
    either matched >= 1 intervals, cancelling out, or survives) and no
    surrogate row id (``monotonically_increasing_id`` would need a
    persist to be branch-stable) is ever introduced.

    Spark plans a naive inequality join as BroadcastNestedLoop — quadratic
    per key.  This formulation stays an EQUI-join: intervals explode to
    every coarse time bucket they cover (``sequence`` of bucket ids),
    points carry their single bucket, the join runs on (key, bucket), and
    an exact containment filter follows.  A (point, interval) pair can
    only meet in the point's bucket, so no dedup step is needed.  Work is
    bounded by interval-duration / bucket size, not by row counts.

    ``bucket_minutes=None`` (default) auto-sizes the bucket from the
    interval-duration distribution (:func:`_auto_bucket_us`: p95 duration,
    floored so the longest interval explodes to a bounded row count);
    pass an explicit value only when the duration profile is known.
    Bucket width never changes the RESULT — only the explode/join shape.
    Auto-sizing runs an EAGER two-value aggregate at call time; the
    interval side is persisted around it so its (possibly expensive)
    lineage is computed once, not once for sizing and again for the join.
    Pass ``persist_handles`` (a list) to receive the cached DataFrame and
    ``unpersist()`` it once the join result is consumed — the same
    convention as the minhash/ngram/simhash pair joins; without it the
    cached blocks live until Spark's LRU evicts them.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    for side, name in ((points, "points"), (intervals, "intervals")):
        if "_b" in side.columns:
            raise ValueError(f"interval_join reserves column '_b'; rename it on {name}")
    if how == "left":
        clash = (set(points.columns) & set(intervals.columns)) - {key_col}
        if clash:
            # the complement re-select and unionByName would hit
            # AMBIGUOUS_REFERENCE at runtime — fail fast with the fix
            raise ValueError(
                f"interval_join(how='left') requires distinct non-key column "
                f"names; rename {sorted(clash)} on one side"
            )
        from pyspark.sql.types import ArrayType, MapType, StructType

        def _contains_map(dt) -> bool:
            # exceptAll rejects maps ANYWHERE in the type, including
            # nested inside structs/arrays — walk the whole type tree
            if isinstance(dt, MapType):
                return True
            if isinstance(dt, ArrayType):
                return _contains_map(dt.elementType)
            if isinstance(dt, StructType):
                return any(_contains_map(f.dataType) for f in dt.fields)
            return False

        maps = [f.name for f in points.schema.fields if _contains_map(f.dataType)]
        if maps:
            # the unmatched complement runs exceptAll over the point
            # columns, and Spark set operations reject MapType — fail
            # fast naming the real constraint instead of surfacing the
            # analyzer's generic error mid-plan
            raise ValueError(
                f"interval_join(how='left') computes the unmatched set with "
                f"exceptAll, which does not support map-typed point columns "
                f"{maps}; cast them (e.g. to_json) or drop them first"
            )
    if bucket_minutes is None:
        intervals = intervals.persist()
        if persist_handles is not None:
            persist_handles.append(intervals)
        bucket_us = _auto_bucket_us(intervals, start_col, end_col)
    else:
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
    out = joined.drop("_b")
    if how == "left":
        # the matched subtree feeds BOTH union branches (matches + the
        # exceptAll complement) — persist it so the bucketed join runs
        # once per action, not twice; same handle convention as the
        # interval sizing cache above
        out = out.persist()
        if persist_handles is not None:
            persist_handles.append(out)
        ival_types = {f.name: f.dataType for f in intervals.schema.fields}
        extra_cols = [c for c in intervals.columns if c != key_col]
        unmatched = points.exceptAll(out.select(*points.columns))
        nulls = unmatched.select(
            "*", *[F.lit(None).cast(ival_types[c]).alias(c) for c in extra_cols]
        )
        out = out.unionByName(nulls)
    return out
