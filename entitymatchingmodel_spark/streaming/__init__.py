from entitymatchingmodel_spark.streaming.curate import curate_stream
from entitymatchingmodel_spark.streaming.dedup import (
    drop_exact_duplicates_stream,
    sessionize_stream,
)
from entitymatchingmodel_spark.streaming.join import stream_time_bounded_join
from entitymatchingmodel_spark.streaming.stateful import running_totals
from entitymatchingmodel_spark.streaming.transform import (
    match_stream,
    transform_foreach_batch,
)

__all__ = [
    "match_stream",
    "transform_foreach_batch",
    "running_totals",
    "drop_exact_duplicates_stream",
    "curate_stream",
    "sessionize_stream",
    "stream_time_bounded_join",
]
