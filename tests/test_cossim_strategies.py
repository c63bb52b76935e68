"""The two cosine-join physical strategies must produce identical results."""

import pytest
from pyspark.sql import functions as F

from entitymatchingmodel_spark.operators.cossim_indexer import (
    CosSimIndexer,
    first_char_block,
)


@pytest.fixture(scope="module")
def data(spark):
    gt = spark.createDataFrame(
        [(i, n) for i, n in enumerate(
            ["apple inc", "apple computer inc", "microsoft corp", "micro systems",
             "netflix nv", "net services bv", "amazon ltd", "amazon web services"])],
        "gt_uid long, preprocessed string",
    )
    names = spark.createDataFrame(
        [(100, "apple incorporated"), (101, "microsoft"), (102, "amazon services"),
         (103, "zzz unknown tokens")],
        "uid long, preprocessed string",
    )
    return gt, names


def _collect(model, names):
    return sorted(
        (r["uid"], r["gt_uid"], round(r["score"], 9), r["rank"])
        for r in model.transform(names).collect()
    )


def test_strategies_identical(spark, data):
    gt, names = data
    kw = dict(tokenizer="words", ngram=1, k=3, lower_bound=0.05, score_decimals=6)
    inv = CosSimIndexer(strategy="inverted", **kw).fit(gt)
    bc = CosSimIndexer(strategy="broadcast", **kw).fit(gt)
    a, b = _collect(inv, names), _collect(bc, names)
    assert a == b
    assert a  # non-empty


def test_strategies_identical_char_ngrams(spark, data):
    gt, names = data
    kw = dict(tokenizer="characters", ngram=2, k=2, lower_bound=0.1, score_decimals=6)
    inv = CosSimIndexer(strategy="inverted", **kw).fit(gt)
    bc = CosSimIndexer(strategy="broadcast", **kw).fit(gt)
    assert _collect(inv, names) == _collect(bc, names)


def test_broadcast_rejects_blocking(spark, data):
    gt, names = data
    m = CosSimIndexer(strategy="broadcast", blocking_func=first_char_block).fit(gt)
    with pytest.raises(ValueError, match="inverted"):
        m.transform(names)


def test_invalid_strategy(spark):
    with pytest.raises(ValueError, match="strategy"):
        CosSimIndexer(strategy="magic")
