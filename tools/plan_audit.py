"""Plan-shape sweep over every contract query.

For each `__spark_entry__.queries()` entry, builds the DataFrame at a small
SF and reports shuffle-exchange count, broadcast-join count, and nested-
loop/cartesian flags from the physical plan.  A BroadcastNestedLoopJoin or
CartesianProduct anywhere is reported as a FAIL — at 100 TB those are
quadratic; every join in this engine is expected to be an equi-join (hash/
sort-merge/broadcast-hash).

It then EXECUTES every query (noop write — full plan execution, nothing
collected) with the JVM's stderr captured, and fails any query whose run
logs a ``CodeGenerator ... Failed to compile`` ERROR: janino refusing a
>64KB generated method silently drops the whole stage to interpreted
row-at-a-time eval — results stay correct, so only this runtime canary
(not plan shape, which still shows WholeStageCodegen) catches it.  That
exact blind spot hid the r10 curation-front-door fallback.  Opt out with
``--no-exec`` (plan-shape-only, the pre-r11 behavior).

Usage: python tools/plan_audit.py [sf_dir] [--no-exec]
Exit code 1 if any query plans a nested loop / cartesian product, errors,
or logs a codegen compile failure during execution.
"""

from __future__ import annotations

import importlib.util
import os
import re
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = _ARGS[0] if _ARGS else "/root/testdata/sf0.001"
EXEC_CANARY = "--no-exec" not in sys.argv
ONLY = None
for _a in sys.argv[1:]:
    if _a.startswith("--only="):
        ONLY = set(_a[len("--only="):].split(","))

_MARK = "### CANARY-QUERY "


def _parse_canary_log(path: str) -> dict[str, int]:
    """Per-query count of codegen compile failures: the capture file is
    the JVM's stderr with `_MARK <name>` lines written (fd-level, so
    ordering with log4j's console appender holds) before each query."""
    fails: dict[str, int] = {}
    current = None
    for line in open(path, errors="replace"):
        if line.startswith(_MARK):
            current = line[len(_MARK):].strip()
            fails.setdefault(current, 0)
        elif "Failed to compile the generated Java code" in line:
            fails[current or "<pre-query>"] = fails.get(current or "<pre-query>", 0) + 1
    return fails


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

    # The codegen canary needs the JVM's stderr (log4j console appender):
    # redirect fd 2 to a file BEFORE the JVM launches so it inherits the
    # descriptor — a post-launch sys.stderr swap misses the child process.
    cap_path = None
    if EXEC_CANARY:
        cap = tempfile.NamedTemporaryFile(
            "w", suffix=".canary.log", delete=False
        )
        cap_path = cap.name
        os.dup2(cap.fileno(), 2)

    spark = get_spark("plan-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    bad = 0
    print(f"{'query':30s} {'exchanges':>9s} {'broadcasts':>10s}  flags")
    for name, fn in mod.queries().items():
        if ONLY and name not in ONLY:
            continue
        try:
            if EXEC_CANARY:
                os.write(2, f"{_MARK}{name}\n".encode())
            df = fn(spark, SF_DIR)
            if EXEC_CANARY:
                # full execution, zero collection — fires every stage's
                # codegen compile (plan-shape inspection alone cannot see
                # a janino fallback)
                df.write.format("noop").mode("overwrite").save()
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
    if EXEC_CANARY and cap_path:
        fails = _parse_canary_log(cap_path)
        red = {q: n for q, n in fails.items() if n}
        print(f"\ncodegen canary: {len(fails)} queries executed, "
              f"{len(red)} with compile failures")
        for q, n in sorted(red.items()):
            print(f"  CODEGEN-FALLBACK <-- FAIL  {q}: {n} "
                  "'Failed to compile' ERROR(s) — stage ran interpreted")
            bad += 1
        os.unlink(cap_path)
    print(f"\n{bad} problem(s)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
