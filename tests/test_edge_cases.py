"""Edge cases from FIXTURES.md / reference test suite: null & empty names,
unicode, franchise (identical name, different entities), no-match rows."""

import pytest
from pyspark.sql import functions as F

from entitymatchingmodel_spark import SparkEntityMatching


@pytest.fixture(scope="module")
def em(spark):
    gt = spark.createDataFrame(
        [(1, "Tzu Sun B.V."), (2, "Eddie Eagle"), (3, "Adam Mickiewicz"),
         (4, "Mikołaj Kopernik"), (5, "Tzu Sun B.V.")],  # franchise: same name, ids 1 & 5
        "id long, name string",
    )
    m = SparkEntityMatching(
        indexers=[{"type": "cosine_similarity", "tokenizer": "characters",
                   "ngram": 2, "num_candidates": 5, "cos_sim_lower_bound": 0.1}],
    )
    return m.fit(gt)


def test_null_and_empty_names_survive(spark, em):
    names = spark.createDataFrame(
        [(10, None), (11, ""), (12, "  "), (13, "tzu sun bv")],
        "id long, name string",
    )
    out = em.transform(names)
    rows = out.collect()
    # every input row appears (with_no_matches): null/empty names yield
    # no-candidate rows, not crashes or dropped rows
    assert {r["entity_id"] for r in rows} == {10, 11, 12, 13}
    by_id = {}
    for r in rows:
        by_id.setdefault(r["entity_id"], []).append(r)
    assert all(r["gt_uid"] is None for r in by_id[10])
    assert all(r["gt_uid"] is None for r in by_id[11])
    assert any(r["gt_uid"] is not None for r in by_id[13])


def test_unicode_names_match(spark, em):
    names = spark.createDataFrame([(20, "Mikolaj Kopernik")], "id long, name string")
    out = em.transform(names).filter("gt_uid is not null").collect()
    # accent-stripped preprocessing: ASCII query matches the unicode GT name
    assert any(r["gt_entity_id"] == 4 and r["score_0"] > 0.8 for r in out)


def test_franchise_identical_names_both_candidates(spark, em):
    names = spark.createDataFrame([(30, "Tzu Sun B.V.")], "id long, name string")
    out = em.transform(names).filter("gt_uid is not null").collect()
    assert {r["gt_entity_id"] for r in out} == {1, 5}


def test_no_match_rows_flagged_in_training(spark, em):
    names = spark.createDataFrame(
        [(40, "tzu sun bv"), (41, "NOCANDIDATE10")], "id long, name string"
    )
    pairs = em.create_training_name_pairs(names)
    flags = {r["entity_id"]: r["no_candidate"] for r in pairs.collect()}
    assert flags[41] is True
    assert flags[40] is False


def test_transform_before_fit_raises(spark):
    from entitymatchingmodel_spark import SparkEntityMatching

    em = SparkEntityMatching(indexers=[{"type": "sni", "window_length": 3}])
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(RuntimeError, match="before fit"):
        em.transform(df)
