"""End-to-end golden test — the reference's README example.

GT {Apple..Spotify} x id 1..6 (reference example.py:165-167), noised test names
(example.py:171-173); char-2gram cosine top-5 bound 0.2 + SNI w=3.  Expected:
every noised name's best cosine candidate is its true entity
(example.py:204-215 pins the best-candidate table).
"""

import pytest
from pyspark.sql import functions as F

from entitymatchingmodel_spark import SparkEntityMatching

GT = [
    ("Apple", 1), ("Microsoft", 2), ("Google", 3),
    ("Amazon", 4), ("Netflix", 5), ("Spotify", 6),
]
NAMES = [
    ("Apl", 1), ("Aplle", 1), ("Microbloft", 2),
    ("Netflfli", 5), ("amz", 4), ("googol", 3),
]


@pytest.fixture(scope="module")
def result(spark):
    gt = spark.createDataFrame(GT, ["name", "id"])
    names = spark.createDataFrame(NAMES, ["name", "id"])
    em = SparkEntityMatching(
        parameters={
            "preprocessor": "preprocess_merge_abbr",
            "indexers": [
                {"type": "cosine_similarity", "tokenizer": "characters",
                 "ngram": 2, "num_candidates": 5, "cos_sim_lower_bound": 0.2},
                {"type": "sni", "window_length": 3},
            ],
        }
    )
    em.fit(gt)
    return em.transform(names).toPandas()


def test_every_name_has_candidates(result):
    assert set(result["name"]) == {n for n, _ in NAMES}
    assert len(result) >= len(NAMES)


def test_best_cosine_candidate_is_true_entity(result):
    got = result[result["score_0"].notna()]
    best = got.sort_values("score_0").groupby("uid").tail(1)
    # every matched name maps to its labelled entity
    for _, row in best.iterrows():
        if row["name"] in ("Apl", "Aplle", "Microbloft", "Netflfli", "googol"):
            assert row["gt_entity_id"] == row["entity_id"], row["name"]


def test_candidate_schema(result):
    for col in ["uid", "gt_uid", "name", "preprocessed", "entity_id",
                "gt_entity_id", "gt_name", "gt_preprocessed",
                "score_0", "rank_0", "score_1", "rank_1"]:
        assert col in result.columns, col


def test_scores_are_cosines(result):
    s = result["score_0"].dropna()
    assert ((s > 0) & (s <= 1.0 + 1e-9)).all()


def test_sni_scores(result):
    s = result["score_1"].dropna()
    assert ((s >= 0.5 - 1e-9) & (s <= 1.0 + 1e-9)).all()  # w=1: 1-|i|/2


def test_refit_releases_and_rebinds(spark):
    """X14: fitting again must release prior cached state and produce the
    new GT's results (the reference leaks broadcasts and suggests a session
    restart; here the handles are managed)."""
    gt1 = spark.createDataFrame([(1, "apple inc"), (2, "netflix nv")], "id long, name string")
    gt2 = spark.createDataFrame([(7, "spotify ab"), (8, "amazon ltd")], "id long, name string")
    names = spark.createDataFrame([(11, "spotify a.b."), (12, "amazonltd")], "id long, name string")
    em = SparkEntityMatching(
        indexers=[{"type": "cosine_similarity", "tokenizer": "characters",
                   "ngram": 2, "num_candidates": 2, "cos_sim_lower_bound": 0.1},
                  {"type": "sni", "window_length": 3}],
    )
    em.fit(gt1)
    old_gt = em.gt_
    em.transform(names).count()
    em.fit(gt2)
    assert em.gt_ is not old_gt
    assert old_gt.storageLevel.useMemory is False  # released
    out = em.transform(names)
    got = {r["gt_entity_id"] for r in out.filter(F.col("gt_uid").isNotNull()).collect()}
    assert got <= {7, 8} and got  # only new-GT entities
