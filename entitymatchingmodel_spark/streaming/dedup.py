"""Streaming deduplication for continuous ingestion.

The batch dedup operators (operators/dedup.py) assume a bounded corpus; a
streaming ingestion pipeline needs the same exact-dedup guarantee over an
unbounded source with bounded state.  Structured Streaming's
``dropDuplicatesWithinWatermark`` keeps one state entry per content hash and
evicts it once the watermark passes — the standard bounded-state design:
duplicates arriving within the late-data horizon are suppressed exactly;
duplicates farther apart than the horizon are a deliberate recall trade-off
(state can't be unbounded at 100 TB/day ingest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_exact_duplicates_stream(
    stream: DataFrame,
    text_col: str,
    ts_col: str,
    watermark: str = "10 minutes",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Exact-dedup a streaming frame by normalized content hash.

    State = one row per distinct hash inside the watermark horizon, evicted
    automatically — bounded regardless of stream length.  The hash column is
    kept in the output for downstream lineage/auditing.
    """
    hashed = stream.withColumn(
        hash_col, F.md5(F.trim(F.lower(F.col(text_col))))
    ).withWatermark(ts_col, watermark)
    return hashed.dropDuplicatesWithinWatermark([hash_col])


def sessionize_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming gap sessionization via the native ``session_window`` —
    the Structured Streaming twin of ``operators.events.sessionize`` (same
    gap rule; the batch variant numbers sessions per user, here each
    session is keyed by its window).

    Output: (key, session_start, session_end, n_events) where
    ``session_end`` is the LAST EVENT time (session_window.end minus the
    gap), matching the batch operator's convention.

    State shape at scale: one state-store entry per open session per key;
    the watermark closes sessions whose gap has provably expired, so state
    is bounded by (active keys x open sessions), not by history.
    """
    from pyspark.sql import functions as F

    gap = f"{gap_minutes} minutes"
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            (F.col("session_window.end") - F.expr(f"INTERVAL {gap_minutes} minutes")).alias("session_end"),
            "n_events",
        )
    )
