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
