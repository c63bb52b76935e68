"""Unit tests for exact distributed quantiles (functions/stats.py)."""

import math

import pytest
from pyspark.sql import functions as F

from entitymatchingmodel_spark.functions.stats import exact_quantiles


def _py_quantiles(values, qs):
    """Type-1 inverse-CDF reference: value at rank max(1, ceil(q*n))."""
    s = sorted(v for v in values if v is not None and not math.isnan(v))
    n = len(s)
    return {q: s[max(1, math.ceil(q * n)) - 1] for q in qs}


@pytest.fixture(scope="module")
def values(spark):
    vals = [5.0, 1.0, 3.0, 3.0, 3.0, 9.0, 7.0, 2.0, None, float("nan"), 4.0]
    return spark.createDataFrame([(v,) for v in vals], "x double")


def test_matches_sorted_reference(values):
    qs = (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    got = {r["q"]: r["value"] for r in
           exact_quantiles(values, "x", qs, n_buckets=4).collect()}
    raw = [r["x"] for r in values.collect()]
    assert got == _py_quantiles(raw, qs)


def test_duplicates_and_extremes(values):
    got = {r["q"]: r["value"] for r in
           exact_quantiles(values, "x", (0.0, 1.0)).collect()}
    assert got == {0.0: 1.0, 1.0: 9.0}


def test_bucket_count_invariance(values):
    qs = (0.3, 0.6, 0.9)
    a = sorted(map(tuple, exact_quantiles(values, "x", qs, n_buckets=1).collect()))
    b = sorted(map(tuple, exact_quantiles(values, "x", qs, n_buckets=64).collect()))
    assert a == b


def test_partition_invariance(spark):
    import random

    rng = random.Random(7)
    vals = [round(rng.uniform(-100, 100), 3) for _ in range(500)]
    # heavy duplication: mass on one value must collapse before any sort
    vals += [42.0] * 300
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    qs = (0.05, 0.5, 0.95)
    one = {r["q"]: r["value"] for r in
           exact_quantiles(df.coalesce(1), "x", qs).collect()}
    many = {r["q"]: r["value"] for r in
            exact_quantiles(df.repartition(13), "x", qs).collect()}
    assert one == many == _py_quantiles(vals, qs)


def test_single_distinct_value(spark):
    df = spark.createDataFrame([(2.5,)] * 10, "x double")
    got = {r["q"]: r["value"] for r in
           exact_quantiles(df, "x", (0.0, 0.5, 1.0)).collect()}
    assert got == {0.0: 2.5, 0.5: 2.5, 1.0: 2.5}


def test_validation_errors(values, spark):
    with pytest.raises(ValueError, match="non-empty"):
        exact_quantiles(values, "x", ())
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        exact_quantiles(values, "x", (0.5, 1.5))
    with pytest.raises(ValueError, match="duplicate"):
        exact_quantiles(values, "x", (0.5, 0.5))
    empty = spark.createDataFrame([(None,)], "x double")
    with pytest.raises(ValueError, match="no non-NULL"):
        exact_quantiles(empty, "x", (0.5,))


def test_grouped_matches_per_group_reference(spark):
    import random

    from entitymatchingmodel_spark.functions.stats import grouped_quantiles

    rng = random.Random(11)
    rows = []
    for g, n in (("a", 97), ("b", 4), ("c", 250)):
        rows += [(g, round(rng.uniform(0, 50), 2)) for _ in range(n)]
    rows += [("c", 7.5)] * 40          # heavy duplication inside one group
    rows += [("d", None), ("d", float("nan"))]  # all-invalid group: absent
    df = spark.createDataFrame(rows, "g string, x double")
    qs = (0.0, 0.1, 0.5, 0.9, 1.0)
    got = {}
    for r in grouped_quantiles(df.repartition(7), "g", "x", qs).collect():
        got.setdefault(r["g"], {})[r["q"]] = r["value"]
    by_group = {}
    for g, x in rows:
        if x is not None and not math.isnan(x):
            by_group.setdefault(g, []).append(x)
    expect = {g: _py_quantiles(vals, qs) for g, vals in by_group.items()}
    assert got == expect
    assert "d" not in got


def test_grouped_validation(spark):
    from entitymatchingmodel_spark.functions.stats import grouped_quantiles

    df = spark.createDataFrame([("a", 1.0)], "g string, x double")
    with pytest.raises(ValueError, match="non-empty"):
        grouped_quantiles(df, "g", "x", ())
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        grouped_quantiles(df, "g", "x", (2.0,))
    with pytest.raises(ValueError, match="duplicate"):
        grouped_quantiles(df, "g", "x", (0.5, 0.5))


def test_persist_handles_convention(values):
    handles: list = []
    out = exact_quantiles(values, "x", (0.5,), persist_handles=handles)
    assert out.count() == 1
    assert len(handles) == 1
    for h in handles:
        h.unpersist()
