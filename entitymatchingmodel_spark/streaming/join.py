"""Stream-stream event-time joins with bounded state.

The batch twin is ``operators.events.interval_join`` (bucketed range join).
On unbounded streams the same "points matched to containing/nearby
intervals" semantics needs bounded state: Structured Streaming supports
stream-stream inner joins when the join condition bounds event time on both
sides and both inputs carry watermarks — the engine then evicts join state
older than the watermark + bound instead of buffering streams forever.

Reference has no streaming joins at all (SURVEY §2.12); this is part of the
beyond-reference Structured Streaming surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_time_bounded_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    lookback_seconds: int = 3600,
    lookahead_seconds: int = 0,
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner join of two STREAMS on ``key_col`` where
    ``left_ts - lookback <= right_ts <= left_ts + lookahead``.

    Both sides are watermarked, and the time-range predicate is part of the
    join condition — exactly the shape Structured Streaming requires to
    bound join state: a right row's state can be dropped once the left
    watermark passes ``right_ts + lookback``, so state size is
    (arrival rate x time window), independent of stream length.

    Columns: all left columns plus the right side's non-key columns (the
    right timestamp arrives as ``right_ts``).  Use distinct column names on
    the right side (rename before calling).
    """
    if not left.isStreaming or not right.isStreaming:
        raise ValueError("stream_time_bounded_join requires two streaming DataFrames")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    l_ts, r_ts = F.col(left_ts), F.col(right_ts)
    cond = (
        (lw[key_col] == rw[key_col])
        & (r_ts >= l_ts - F.expr(f"INTERVAL {lookback_seconds} seconds"))
        & (r_ts <= l_ts + F.expr(f"INTERVAL {lookahead_seconds} seconds"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key_col])
