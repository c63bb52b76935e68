"""Plan-shape sweep over every contract query.

For each `__spark_entry__.queries()` entry, builds the DataFrame at a small
SF and reports shuffle-exchange count, broadcast-join count, and nested-
loop/cartesian flags from the physical plan.  A BroadcastNestedLoopJoin or
CartesianProduct anywhere is reported as a FAIL — at 100 TB those are
quadratic; every join in this engine is expected to be an equi-join (hash/
sort-merge/broadcast-hash).

Usage: python tools/plan_audit.py [sf_dir]
Exit code 1 if any query plans a nested loop / cartesian product.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> int:
    from entitymatchingmodel_spark.plans import (
        broadcast_join_count,
        exchange_count,
        explain_str,
    )
    from entitymatchingmodel_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "e", os.path.join(_REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = get_spark("plan-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    bad = 0
    print(f"{'query':30s} {'exchanges':>9s} {'broadcasts':>10s}  flags")
    for name, fn in mod.queries().items():
        try:
            df = fn(spark, SF_DIR)
            plan = explain_str(df)
            flags = []
            if "BroadcastNestedLoop" in plan or "CartesianProduct" in plan:
                # Documented exceptions where a cross product is the intended
                # LINEAR plan: the guarded naive indexer (SURVEY §2.5 J4) and
                # the IVF centroid assignment (corpus x nlist centroids — the
                # build side is a bounded nlist-row broadcast, so the "nested
                # loop" is a linear scan with nlist dot products per row).
                # (ivf_index_topk is the same assignment plan through the
                # index's save/load cycle)
                # (kmeans_clusters assigns through the same bounded k-row
                # broadcast — linear scan, k dots per row)
                # (ivf_pq_topk reuses the IVF centroid assignment verbatim;
                # its PQ stages are hash joins)
                # (ivf_pq_refined = ivf_pq_topk shortlist + an exact
                # rescore tail of pure equi-joins: its plan carries
                # exactly the base row's 2 BroadcastNestedLoops — the
                # bounded centroid assignments — and nothing new;
                # verified by BNLJ-count parity against ivf_pq_topk)
                if name in ("naive_pairs", "ivf_topk", "ivf_index_topk",
                            "kmeans_clusters", "cluster_balanced_sample",
                            "ivf_pq_topk", "ivf_pq_refined"):
                    flags.append("bounded cross-join (documented)")
                else:
                    flags.append("NESTED-LOOP <-- FAIL")
                    bad += 1
            print(f"{name:30s} {exchange_count(df):9d} {broadcast_join_count(df):10d}  {' '.join(flags)}")
        except Exception as e:  # pragma: no cover - diagnostic tool
            print(f"{name:30s} ERROR: {str(e)[:90]}")
            bad += 1
    print(f"\n{bad} problem(s)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
