"""One-off probe: is a query's measured time a function of WHICH query ran
just before it?  Pins the mechanism behind the r4 no-code-change bench
regressions (ivf_topk 2.06->5.32s, events_sessions 0.54->1.63s) by timing
the same query in three adjacency contexts inside one session:

  A. after a neutral cheap query (the r3-like "warm pocket");
  B. immediately after its r4 predecessor (the heavy query the r4
     `queries()` reorder placed in front of it);
  C. same as B, but with clearCache() + System.gc() between the
     predecessor and the probe — the r5 bench.py countermeasure.

If B >> A while C ~= A, the regression is adjacency (predecessor heap/
cache shadow), not the probe query's own plan.  Results recorded in
BENCH_NOTES.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from entitymatchingmodel_spark.session import get_spark  # noqa: E402


def run(spark, name, sf_dir):
    t0 = time.time()
    E.queries()[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("adjprobe", master=f"local[{cpus}]", shuffle_partitions=cpus)
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

    if len(sys.argv) > 2 and sys.argv[1] == "--redistribution":
        # r4->r5 shift attribution: the r5 bench scrubs (clearCache + gc)
        # before every query, so each query pays its own codegen/cache
        # cold costs instead of inheriting a predecessor's warm state.
        # For each named query, time it in both conditions within one
        # session: scrubbed (r5 methodology) vs warm repeat (r4-like).
        # scrubbed ~= r5 number and warm ~= r4 number ==> the shift is
        # methodology redistribution, not a plan change.
        for probe in sys.argv[2].split(","):
            spark.catalog.clearCache()
            jvm_system.gc()
            run(spark, probe, sf_dir)  # one unmeasured pass: codegen warm
            times_scrub, times_warm = [], []
            for _ in range(3):
                spark.catalog.clearCache()
                jvm_system.gc()
                times_scrub.append(run(spark, probe, sf_dir))
                times_warm.append(run(spark, probe, sf_dir))
            med = lambda xs: sorted(xs)[len(xs) // 2]
            print(f"{probe}: scrubbed(r5-cond)={med(times_scrub)}s "
                  f"{times_scrub}  warm(r4-cond)={med(times_warm)}s "
                  f"{times_warm}", flush=True)
        return

    cases = [
        ("ivf_topk", "text_stats", "simhash_near_pairs"),
        ("events_sessions", "text_stats", "streaming_sessions"),
        ("cossim_char_blocked", "text_stats", "supervised_score_only"),
    ]
    for probe, neutral, heavy in cases:
        out = {}
        for label, pred, scrub in (("A", neutral, False), ("B", heavy, False), ("C", heavy, True)):
            spark.catalog.clearCache()
            jvm_system.gc()
            run(spark, pred, sf_dir)
            if scrub:
                spark.catalog.clearCache()
                jvm_system.gc()
            out[label] = run(spark, probe, sf_dir)
        print(f"{probe}: after-{neutral}={out['A']}s  "
              f"after-{heavy}={out['B']}s  after-{heavy}+scrub={out['C']}s", flush=True)


if __name__ == "__main__":
    main()
