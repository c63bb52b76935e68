"""Per-round benchmark: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON
line {"metric", "value", "unit", "queries", "sf"}.

Each query is executed to completion JVM-side via the noop sink (no
driver-collect overhead polluting the measurement).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    import __spark_entry__ as E
    from entitymatchingmodel_spark.session import get_spark

    spark = get_spark(
        "bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up JVM/codegen/parquet-footer caches so the first measured query
    # isn't charged session startup costs.
    for t in ("part", "lineitem", "documents", "embeddings", "orders", "customer"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # Spin up the Python worker pool (pandas import + Arrow channel per core)
    # so the first pandas-UDF query isn't charged worker startup either.
    (
        spark.range(cpus * 4)
        .repartition(cpus)
        .mapInPandas(lambda it: it, "id long")
        .write.format("noop").mode("overwrite").save()
    )

    # Median-of-N per query: single-shot timings on a shared box are noise-
    # dominated (observed 1.9s<->17.4s swings on identical code between
    # rounds); the median makes round-over-round deltas meaningful.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    timings: dict[str, float] = {}
    for name, fn in E.queries().items():
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(statistics.median(runs), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
