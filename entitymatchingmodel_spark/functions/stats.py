"""Exact distributed order statistics.

``exact_quantiles`` computes EXACT type-1 (inverse-CDF) quantiles of a
numeric column without a global sort — the scale-correct alternative to
both ``approx_percentile`` (sketched, not exact) and Spark's exact
``percentile`` aggregate (which buffers every value of a group in one
aggregation buffer — a driver-sized hazard at 100 TB).

Shape (same family as functions/sampling.py ``_bucketed_prefix_sum``):

1. ``groupBy(value)`` distinct-value counts — ONE map-side-combined
   shuffle (the only corpus pass); duplicate-heavy columns collapse to
   their distinct values before anything is sorted;
2. (count, min, max) head scalars roll up from the persisted distinct
   table (sum of counts / min / max — identical by definition), three
   scalars to the driver with no second corpus scan (r11);
3. monotone uniform range-binning of the distinct values; per-bucket
   totals (``n_buckets`` rows to the driver) give every bucket its global
   offset, broadcast back as a literal map — correctness does NOT depend
   on the float details of the binning, only on its monotonicity (any
   monotone bucket function yields the same global cumulative counts);
4. a within-bucket running sum ordered by value (window partitioned BY
   BUCKET — no single global window partition) gives ``count_le(v)`` for
   every distinct value;
5. each requested q becomes rank ``max(1, ceil(q*n))`` and its quantile
   is ``min(v | count_le(v) >= rank)`` — one final global aggregate, and
   the (q, value) result is exploded back out IN-PLAN (no collect).

Semantics: NULL and NaN values are ignored (both engines order NaN
inconsistently with IEEE comparisons; excluding them keeps the oracle
exact).  q=0 returns the minimum, q=1 the maximum.  Values are compared
as doubles — results are bit-exact across engines because the quantile
is a SELECTED input value, never an interpolation.

Skew note: the within-bucket sort runs over DISTINCT values per bucket,
so mass concentration on few values costs nothing; the degenerate case
is n distinct values packed into one narrow range (uniform bins put them
in one bucket's sort).  Raise ``n_buckets`` or pre-scale such columns.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    n_buckets: int = 256,
    persist_handles: list | None = None,
) -> DataFrame:
    """Exact type-1 quantiles of ``value_col``: one row per requested q,
    columns ``(q double, value double)``.  See the module docstring for
    the distributed shape and semantics."""
    if not qs:
        raise ValueError("qs must be non-empty")
    bad = [q for q in qs if not (0.0 <= q <= 1.0)]
    if bad:
        raise ValueError(f"quantiles must be in [0, 1]: {bad}")
    if len(set(qs)) != len(qs):
        raise ValueError("duplicate quantiles requested")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")

    v = (
        df.select(F.col(value_col).cast("double").alias("_x"))
        .filter(F.col("_x").isNotNull() & ~F.isnan("_x"))
    )
    # ONE corpus pass (r11, guide §1.2): the distinct-value count table is
    # built and persisted FIRST, and the (n, lo, hi) head scalars derive
    # from it (sum of counts / min / max over distinct values — identical
    # scalars by definition) instead of a separate full scan; the
    # range-bucket column is then a narrow projection over the cached
    # table.  Before: head scan (pass 1) + distinct shuffle (pass 2).
    d_cached = v.groupBy("_x").agg(F.count("*").alias("_c")).persist()
    if persist_handles is not None:
        persist_handles.append(d_cached)
    head = d_cached.agg(
        F.sum("_c").alias("n"), F.min("_x").alias("lo"), F.max("_x").alias("hi")
    ).first()
    n, lo, hi = int(head["n"] or 0), head["lo"], head["hi"]
    if n == 0:
        d_cached.unpersist()
        raise ValueError(f"no non-NULL, non-NaN values in {value_col!r}")

    if hi > lo and math.isfinite(hi - lo):
        width = (hi - lo) / n_buckets
        bucket = F.least(
            F.floor((F.col("_x") - F.lit(lo)) / F.lit(width)), F.lit(n_buckets - 1)
        ).cast("int")
    else:
        # single distinct value, or an infinite range (+-Inf present):
        # one bucket is still monotone, just unbalanced
        bucket = F.lit(0)
    d = d_cached.withColumn("_b", bucket)
    try:
        totals = {
            r["_b"]: r["_t"]
            for r in d.groupBy("_b").agg(F.sum("_c").alias("_t")).collect()
        }
        offsets, acc = {}, 0
        for b in range(n_buckets):
            offsets[b] = acc
            acc += int(totals.get(b, 0) or 0)
        off_map = F.map_from_arrays(
            F.array(*[F.lit(b) for b in range(n_buckets)]),
            F.array(*[F.lit(offsets[b]) for b in range(n_buckets)]),
        )
        w = (
            Window.partitionBy("_b")
            .orderBy(F.col("_x").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = d.withColumn("_cum", off_map[F.col("_b")] + F.sum("_c").over(w))
        ranks = [(float(q), max(1, math.ceil(q * n))) for q in qs]
        row = cum.agg(
            *[
                F.min(F.when(F.col("_cum") >= r, F.col("_x"))).alias(f"_q{i}")
                for i, (_, r) in enumerate(ranks)
            ]
        )
        return row.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(q).alias("q"), F.col(f"_q{i}").alias("value")
                        )
                        for i, (q, _) in enumerate(ranks)
                    ]
                )
            ).alias("_s")
        ).select(F.col("_s.q").alias("q"), F.col("_s.value").alias("value"))
    finally:
        if persist_handles is None:
            # the returned plan re-derives the distinct frame if executed
            # after this (cheap: one scan + one shuffle); callers that want
            # the cache to outlive the call pass persist_handles
            d_cached.unpersist()


def grouped_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Exact type-1 quantiles PER GROUP — "p50/p95 document length per
    source" — one row per (group, q): ``(group_col, q double, value
    double)``.  Same semantics as :func:`exact_quantiles` (NULL/NaN
    ignored, q=0 min, q=1 max, result always a selected input value);
    groups whose values are all NULL/NaN are absent from the output.

    Fully in-plan (no driver state at all — group count is unbounded, so
    nothing here may collect): distinct ``(group, value)`` counts in one
    map-side-combined shuffle, a per-group running count ordered by
    value, a window total per group, then each q picks ``min(v |
    count_le(v) >= max(1, ceil(q*n_g)))`` in one aggregate.

    Skew note: the running count sorts each group's DISTINCT values in
    one task (duplicates collapse first).  That is the right trade for
    grouped data — a per-group bucket refinement would add a shuffle per
    group-size class; for a single giant group use
    :func:`exact_quantiles`, whose range-bucket pass bounds every task.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    bad = [q for q in qs if not (0.0 <= q <= 1.0)]
    if bad:
        raise ValueError(f"quantiles must be in [0, 1]: {bad}")
    if len(set(qs)) != len(qs):
        raise ValueError("duplicate quantiles requested")

    v = df.select(
        F.col(group_col).alias("_g"), F.col(value_col).cast("double").alias("_x")
    ).filter(F.col("_x").isNotNull() & ~F.isnan("_x"))
    d = v.groupBy("_g", "_x").agg(F.count("*").alias("_c"))
    wcum = (
        Window.partitionBy("_g")
        .orderBy(F.col("_x").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("_g")
    cum = d.withColumn("_cum", F.sum("_c").over(wcum)).withColumn(
        "_n", F.sum("_c").over(wall)
    )
    qlit = [float(q) for q in qs]
    out = (
        cum.groupBy("_g")
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("_cum")
                        >= F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("_n"))),
                        F.col("_x"),
                    )
                ).alias(f"_q{i}")
                for i, q in enumerate(qlit)
            ]
        )
    )
    return out.select(
        F.col("_g").alias(group_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(q).alias("q"), F.col(f"_q{i}").alias("value"))
                    for i, q in enumerate(qlit)
                ]
            )
        ).alias("_s"),
    ).select(group_col, F.col("_s.q").alias("q"), F.col("_s.value").alias("value"))
