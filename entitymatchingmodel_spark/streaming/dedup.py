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
    set_watermark: bool = True,
) -> DataFrame:
    """Exact-dedup a streaming frame by normalized content hash.

    State = one row per distinct hash inside the watermark horizon, evicted
    automatically — bounded regardless of stream length.  The hash column is
    kept in the output for downstream lineage/auditing.

    ``set_watermark=False`` skips the ``withWatermark`` call — required
    when this runs DOWNSTREAM of another stateful stage that already set
    the event-time watermark (Spark disallows redefining it mid-query;
    the horizon is then the upstream stage's).
    """
    hashed = stream.withColumn(hash_col, F.md5(F.trim(F.lower(F.col(text_col)))))
    if set_watermark:
        hashed = hashed.withWatermark(ts_col, watermark)
    return hashed.dropDuplicatesWithinWatermark([hash_col])


def drop_url_duplicates_stream(
    stream: DataFrame,
    url_col: str,
    ts_col: str,
    watermark: str = "10 minutes",
    key_col: str = "url_norm",
) -> DataFrame:
    """Streaming twin of ``operators.dedup.drop_url_duplicates`` — C4's
    URL-dedup applied ON INGEST: one state row per normalized URL inside
    the watermark horizon, evicted behind it (the exact bounded-state
    shape of :func:`drop_exact_duplicates_stream`).

    Rows whose URL normalizes to NULL are passed through UNDEDUPED (a
    missing URL is not a duplicate of another missing URL): the NULL-key
    rows never enter the state store — they ride a stateless filter
    unioned back onto the deduped flow.  The normalized key is kept in
    the output (``key_col``) for lineage.
    """
    from entitymatchingmodel_spark.functions.web import url_normalize

    keyed = stream.withColumn(key_col, url_normalize(F.col(url_col))).withWatermark(
        ts_col, watermark
    )
    deduped = keyed.filter(F.col(key_col).isNotNull()).dropDuplicatesWithinWatermark(
        [key_col]
    )
    return deduped.unionByName(keyed.filter(F.col(key_col).isNull()))


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
