"""Bit-exact parity of the Arrow vector kernels (r12) against the
interpreted ``zip_with``/``aggregate`` expression twins they replace.

The kernels preserve the expressions' left-fold order (column-by-column
accumulation), so every double is IEEE-identical, not just close — the
assertions compare with ``==`` (plus a both-NaN case), never a tolerance.
"""

import math
import random

from pyspark.sql import functions as F

from entitymatchingmodel_spark.operators.ann import _dot, _l2_normalize
from entitymatchingmodel_spark.operators.pq import _l2sq
from entitymatchingmodel_spark.operators.veckernel import (
    dot_kernel,
    l2sq_kernel,
)

PAIR_SCHEMA = "i long, a array<double>, b array<double>"


def _rand_pairs(n=200, seed=20260818):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        d = rng.choice([0, 1, 3, 8, 64])
        a = [rng.uniform(-2.0, 2.0) for _ in range(d)]
        b = [rng.uniform(-2.0, 2.0) for _ in range(d)]
        r = rng.random()
        if r < 0.06:
            a = None
        elif r < 0.12:
            b = None
        elif r < 0.18 and d:
            b = b[:-1]  # zip_with length mismatch -> NULL fold
        elif r < 0.24:
            a = [0.0] * d  # zero vector
        elif r < 0.28 and d:
            a = a[:-1] + [float("nan")]  # NaN propagates in both engines
        rows.append((i, a, b))
    # hand-picked edges: both empty, both None, huge magnitudes
    rows += [
        (n, [], []),
        (n + 1, None, None),
        (n + 2, [1e308, 1e308], [2.0, 2.0]),  # overflow -> inf, both engines
    ]
    return rows


def _assert_col_equal(rows, kcol, ecol):
    for r in rows:
        kv, ev = r[kcol], r[ecol]
        if ev is None or kv is None:
            assert kv is None and ev is None, (r["i"], kv, ev)
        elif isinstance(ev, float) and math.isnan(ev):
            assert math.isnan(kv), (r["i"], kv, ev)
        else:
            assert kv == ev, (r["i"], kv, ev)


def test_dot_and_l2sq_kernels_match_expressions(spark):
    df = spark.createDataFrame(_rand_pairs(), PAIR_SCHEMA)
    out = df.select(
        "i",
        dot_kernel("a", "b").alias("kd"),
        _dot(F.col("a"), F.col("b")).alias("ed"),
        l2sq_kernel("a", "b").alias("kl"),
        _l2sq(F.col("a"), F.col("b")).alias("el"),
    ).collect()
    _assert_col_equal(out, "kd", "ed")
    _assert_col_equal(out, "kl", "el")


def test_dot_kernel_float32_inputs_match(spark):
    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)],
         [rng.uniform(-1, 1) for _ in range(16)])
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "i long, a array<float>, b array<float>")
    out = df.select(
        "i",
        dot_kernel("a", "b").alias("kd"),
        _dot(F.col("a"), F.col("b")).alias("ed"),
    ).collect()
    _assert_col_equal(out, "kd", "ed")


def test_unit_kernel_matches_expression_normalize(spark, monkeypatch):
    rng = random.Random(20260818)
    rows = []
    for i in range(150):
        d = rng.choice([0, 2, 8, 64])
        v = [rng.uniform(-3.0, 3.0) for _ in range(d)]
        r = rng.random()
        if r < 0.08:
            v = None
        elif r < 0.16:
            v = [0.0] * d  # zero norm -> NULL in both shapes
        elif r < 0.2 and d:
            v = v[:-1] + [float("nan")]  # NaN norm: divides through (NaN>0)
        rows.append((i, v))
    df = spark.createDataFrame(rows, "i long, v array<double>")

    monkeypatch.setenv("EMM_VEC_KERNEL", "0")
    expr = {r["i"]: r["v"] for r in _l2_normalize(df, "v").collect()}
    monkeypatch.setenv("EMM_VEC_KERNEL", "1")
    kern = {r["i"]: r["v"] for r in _l2_normalize(df, "v").collect()}

    assert expr.keys() == kern.keys()
    for i, ev in expr.items():
        kv = kern[i]
        if ev is None or kv is None:
            assert kv is None and ev is None, (i, kv, ev)
            continue
        assert len(kv) == len(ev), i
        for x, y in zip(kv, ev):
            if isinstance(y, float) and math.isnan(y):
                assert math.isnan(x), (i, kv, ev)
            else:
                assert x == y, (i, kv, ev)


def test_float32_normalize_matches_expression(spark, monkeypatch):
    """float32 inputs go through cast(double)-then-divide in both shapes."""
    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "i long, v array<float>")
    monkeypatch.setenv("EMM_VEC_KERNEL", "0")
    expr = {r["i"]: r["v"] for r in _l2_normalize(df, "v").collect()}
    monkeypatch.setenv("EMM_VEC_KERNEL", "1")
    kern = {r["i"]: r["v"] for r in _l2_normalize(df, "v").collect()}
    for i, ev in expr.items():
        assert kern[i] == ev, (i, kern[i], ev)


def test_kernel_switch_shapes(spark, monkeypatch):
    """The default shape is ArrowEvalPython-free (r12 measurement: at
    bench scale the family is job-latency bound and the kernels lose);
    EMM_VEC_KERNEL=1 opts in to the kernel shape — the scale path."""
    df = spark.createDataFrame([(1, [1.0, 2.0])], "i long, v array<double>")
    monkeypatch.delenv("EMM_VEC_KERNEL", raising=False)
    plan_expr = _l2_normalize(df, "v")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan_expr
    monkeypatch.setenv("EMM_VEC_KERNEL", "1")
    plan_kern = _l2_normalize(df, "v")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan_kern
