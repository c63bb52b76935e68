"""rapidfuzz-parity ratio features (M1: ratio / partial_ratio / WRatio).

Expected values mirror reference tests/unit/test_feature_extractor.py:120-145
(rapidfuzz semantics; the reference stores int8-cast scores, so comparisons
truncate toward zero).
"""

import pytest
from pyspark.sql import functions as F

from entitymatchingmodel_spark.operators.features import (
    PAIR_FEATURES,
    _indel_ratio,
    _partial_ratio_py,
    _wratio_py,
    pair_features,
)


@pytest.mark.parametrize(
    "fn,a,b,expected",
    [
        (_indel_ratio, "abc", "abc", 100),
        (_indel_ratio, "abc", "xyz", 0),
        (_indel_ratio, "abc", "axbc", 85),
        (_wratio_py, "abc", "abc", 100),
        (_wratio_py, "abc", "xyz", 0),
        (_wratio_py, "abc", "axbc", 85),
        (_partial_ratio_py, "abc bcd abc", "abc abc xyz", 77),
        (_partial_ratio_py, "abc", "xyz abc xyz", 100),
        (_indel_ratio, "", "", 100),
        (_wratio_py, "", "abc", 0),
    ],
)
def test_reference_expectations(fn, a, b, expected):
    assert int(fn(a, b)) == expected


def test_partial_ratio_symmetric_and_bounded():
    pairs = [("abcd", "xabcdy"), ("q", "q"), ("ab", "ba"), ("", "x")]
    for a, b in pairs:
        r = _partial_ratio_py(a, b)
        assert r == _partial_ratio_py(b, a)
        assert 0.0 <= r <= 100.0
        assert r >= _indel_ratio(a, b) or len(a) == len(b)


def test_pair_features_has_all_eleven(spark):
    df = spark.createDataFrame(
        [("ing bank nv", "ing groep nv"), ("abc", "xyz"), (None, "x")],
        "preprocessed string, gt_preprocessed string",
    )
    out = pair_features(df)
    assert set(PAIR_FEATURES) <= set(out.columns)
    assert len(PAIR_FEATURES) == 11
    rows = out.collect()
    for r in rows:
        for f in ("f_ratio", "f_partial_ratio", "f_wratio"):
            assert r[f] is not None and 0.0 <= r[f] <= 100.0


def test_spark_values_match_python(spark):
    cases = [("abc bcd abc", "abc abc xyz"), ("abc", "axbc"), ("kitten", "sitting")]
    df = spark.createDataFrame(cases, "preprocessed string, gt_preprocessed string")
    out = {
        (r["preprocessed"], r["gt_preprocessed"]): r
        for r in pair_features(df, decimals=None).collect()
    }
    for a, b in cases:
        r = out[(a, b)]
        assert r["f_ratio"] == _indel_ratio(a, b)
        assert r["f_partial_ratio"] == _partial_ratio_py(a, b)
        assert r["f_wratio"] == _wratio_py(a, b)
