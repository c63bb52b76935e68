"""Dump ``explain("formatted")`` for contract queries to plans/$EMM_PLANS_DIR (default r12).

Usage: python tools/explain_dump.py <tag> [name1,name2,...] [sf_dir]

Writes plans/<dir>/<query>_<tag>.txt for each named query (all queries when
the name list is omitted).  ``tag`` is typically ``before`` or ``after`` —
the r11 optimization-round evidence convention: the judge diffs the pair
to check each claimed plan change (Exchange count, join strategy,
PushedFilters, BatchEvalPython removal) without running Spark.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
NAMES = sys.argv[2].split(",") if len(sys.argv) > 2 and sys.argv[2] else None
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"


def main() -> None:
    import __spark_entry__ as E
    from entitymatchingmodel_spark.session import get_spark

    spark = get_spark("explain-dump", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(_REPO, "plans", os.environ.get("EMM_PLANS_DIR", "r12"))
    os.makedirs(out_dir, exist_ok=True)

    for name, fn in E.queries().items():
        if NAMES and name not in NAMES:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # pragma: no cover - diagnostic tool
            plan = f"ERROR: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{TAG}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
