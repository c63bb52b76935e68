"""Custom stateful streaming operators (applyInPandasWithState).

Beyond the reference (which has no stateful streaming at all, SURVEY §2.12):
a running per-key aggregate maintained in Spark's state store — the
primitive for streaming entity-resolution counters (events per account,
last-seen timestamps, drift counters) that tumbling windows can't express.

State layout per key: (count, sum, max_ts).  Output on every batch: the
updated running values, so downstream sinks always see the latest totals.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

_STATE = StructType(
    [
        StructField("count", LongType()),
        StructField("total", DoubleType()),
        StructField("max_ts", TimestampType()),
    ]
)


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming running (count, total, last_ts) per key.

    Works on a streaming DataFrame in update mode; state lives in the
    checkpointed state store, one entry per key — constant memory per key
    regardless of stream length.  Also runs on a batch DataFrame (state
    starts empty, one "batch" = the whole input), which is how the unit
    test pins semantics against a plain groupBy.
    """
    out_schema = StructType(
        [
            StructField("key", events.schema[key_col].dataType),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
            StructField("last_ts", TimestampType()),
        ]
    )

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            count, total, max_ts = state.get
        else:
            count, total, max_ts = 0, 0.0, None
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
            batch_max = pdf[ts_col].max()
            if max_ts is None or (batch_max is not pd.NaT and batch_max > max_ts):
                max_ts = batch_max
        state.update((count, total, max_ts))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [count],
             "total_value": [total], "last_ts": [max_ts]}
        )

    return events.select(key_col, ts_col, value_col).groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
