"""r10 pre-commit bench probes: scrubbed median-of-3 for the rows r10
touched (quality_clf_scores featurizer, curate_batch/c4_rules plants,
pareto_select predicate) and the two new rows, plus a gopher_repetition
band re-check (r9 driver read 7.9s vs the 5.5-7.5s note).  Protocol =
bench.py's: warmup scans + worker-pool spin-up, clearCache + System.gc
before each query's repeat block, consecutive repeats, median.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from entitymatchingmodel_spark.session import get_spark  # noqa: E402

NAMES = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "refinedweb_lines", "incremental_dedup", "quality_clf_scores",
    "curate_batch", "c4_rules", "pareto_select", "gopher_repetition",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("probe-r10", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("part", "lineitem", "documents", "embeddings", "orders", "customer"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    (
        spark.range(cpus * 4).repartition(cpus)
        .mapInPandas(lambda it: it, "id long")
        .write.format("noop").mode("overwrite").save()
    )
    jvm_system = spark.sparkContext._jvm.System
    qs = E.queries()
    for name in NAMES:
        spark.catalog.clearCache()
        jvm_system.gc()
        runs = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 2))
        print(f"{name}: median {statistics.median(runs)} {runs}", flush=True)


if __name__ == "__main__":
    main()
