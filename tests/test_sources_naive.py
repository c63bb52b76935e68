"""Noiser, example data source, and naive indexer."""

import pytest
from pyspark.sql import functions as F

from entitymatchingmodel_spark import SparkEntityMatching
from entitymatchingmodel_spark.sources import (
    example_ground_truth,
    example_names_to_match,
    noise_names,
)


def test_noiser_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(f"company number {i} holdings international",) for i in range(50)],
        "name string",
    )
    a = noise_names(df, noise_level=1.0, seed=7).collect()
    b = noise_names(df, noise_level=1.0, seed=7).collect()
    assert [r["noised_name"] for r in a] == [r["noised_name"] for r in b]
    changed = sum(1 for r in a if r["noised_name"] != r["name"])
    assert changed > 25  # level 1.0: the vast majority must actually change
    c = noise_names(df, noise_level=0.0, seed=7).collect()
    assert all(r["noised_name"] == r["name"] for r in c)


def test_noiser_single_type_and_validation(spark):
    df = spark.createDataFrame([("alpha beta gamma delta",)], "name string")
    out = noise_names(df, noise_level=1.0, noise_type="drop_word", seed=3).collect()[0]
    assert len(out["noised_name"].split()) < 4
    with pytest.raises(ValueError, match="noise_type"):
        noise_names(df, noise_type="nonsense")


def test_example_data_end_to_end(spark):
    gt = example_ground_truth(spark)
    names = example_names_to_match(spark, noise_level=0.5, seed=2)
    assert gt.count() == names.count()
    em = SparkEntityMatching(
        indexers=[{"type": "cosine_similarity", "tokenizer": "characters",
                   "ngram": 2, "num_candidates": 1, "cos_sim_lower_bound": 0.1}]
    )
    em.fit(gt)
    out = em.transform(names).filter(F.col("gt_uid").isNotNull())
    # self-labelling: id is the true entity -> most top-1s should be correct
    hit = out.filter(F.col("entity_id") == F.col("gt_entity_id")).count()
    assert hit / gt.count() > 0.7


def test_naive_indexer_all_pairs_and_guard(spark):
    gt = spark.createDataFrame([(1, "a corp"), (2, "b corp")], "id long, name string")
    names = spark.createDataFrame([(9, "a corp"), (8, "x inc"), (7, "y inc")],
                                  "id long, name string")
    em = SparkEntityMatching(indexers=[{"type": "naive"}])
    em.fit(gt)
    out = em.transform(names)
    assert out.count() == 6  # 3 x 2 all pairs
    em2 = SparkEntityMatching(indexers=[{"type": "naive", "max_pairs": 5}])
    em2.fit(gt)
    with pytest.raises(ValueError, match="max_pairs"):
        em2.transform(names).count()


def test_sni_mapping_func(spark):
    from entitymatchingmodel_spark.operators.sni_indexer import SNIIndexer
    from pyspark.sql import functions as F

    gt = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")],
        "gt_uid long, preprocessed string",
    )
    names = spark.createDataFrame([(10, "ahpla")], "uid long, preprocessed string")
    # reversed-name sort keys: gt -> {ahpla, ateb, ammag}, name -> alpha;
    # 'alpha' sorts next to 'ahpla' (gt_uid 1), which plain SNI would miss
    m = SNIIndexer(window_length=3, mapping_func=F.reverse).fit(gt)
    out = {(r["uid"], r["gt_uid"]) for r in m.transform(names).collect()}
    assert any(gt_uid == 1 for (_, gt_uid) in out)


def test_sni_even_window_rejected():
    """Even windows are ambiguous (no center) — constructor must reject
    (ref tests/unit/test_indexers.py:145 even-window rejection)."""
    from entitymatchingmodel_spark.operators.sni_indexer import SNIIndexer

    with pytest.raises(ValueError, match="odd"):
        SNIIndexer(window_length=4)
    with pytest.raises(ValueError, match="odd"):
        SNIIndexer(window_length=0)
