from entitymatchingmodel_spark.plans.inspect import (
    broadcast_join_count,
    exchange_count,
    explain_str,
    pushed_filters,
    scan_columns,
)

__all__ = [
    "exchange_count",
    "broadcast_join_count",
    "pushed_filters",
    "scan_columns",
    "explain_str",
]
