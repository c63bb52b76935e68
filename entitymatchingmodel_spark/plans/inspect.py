"""Physical-plan inspection helpers.

The engine's perf discipline is "explain the plan and iterate": these
helpers turn the executed-plan string into assertable facts (shuffle
count, broadcast joins, pushdown, scan schema) so tests can pin the plan
shape, not just the result — a regression that doubles shuffles fails CI
even though results stay correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def _executed(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def exchange_count(df: DataFrame, distinct: bool = True) -> int:
    """Number of shuffle exchanges in the executed plan.

    ``distinct=True`` counts unique plan ids (the plan string prints reused
    exchanges once per reference; same id = one physical shuffle).
    """
    plan = _executed(df)
    hits = re.findall(r"Exchange (?:hash|range|Single)\w*partitioning?[^\[]*\[plan_id=(\d+)\]", plan)
    if not hits:
        hits = re.findall(r"Exchange [^\n]*\[plan_id=(\d+)\]", plan)
    return len(set(hits)) if distinct else len(hits)


def broadcast_join_count(df: DataFrame) -> int:
    # non-greedy across the whole line: the broadcast mode spec itself
    # contains '[' (HashedRelationBroadcastMode(List(input[0, ...]))), so a
    # [^\[]* pattern would never reach the trailing [plan_id=N]
    plan = _executed(df)
    return len(set(re.findall(r"BroadcastExchange.*?\[plan_id=(\d+)\]", plan)))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    plan = _executed(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists per scan — catches missing column pruning."""
    plan = _executed(df)
    res = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        res.append(cols)
    return res
