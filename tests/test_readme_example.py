"""Golden parity test: the reference's README/example query.

GT {Apple..Spotify}, test names {Apl, Aplle, Microbloft, Netflfli, amz,
googol} with char-2gram cossim (k=5, bound 0.2) + SNI w=3 must reproduce the
best-candidate table pinned in reference example.py:204-215 (SURVEY §7
"minimum end-to-end slice").
"""

import pytest

from entitymatchingmodel_spark import SparkEntityMatching

GOLDEN = {
    ("Apl", "Apple", 1),
    ("Aplle", "Apple", 1),
    ("Microbloft", "Microsoft", 2),
    ("Netflfli", "Netflix", 5),
    ("amz", "Amazon", 4),
    ("googol", "Google", 3),
}


@pytest.fixture(scope="module")
def model(spark):
    gt = spark.createDataFrame(
        [("Apple", 1), ("Microsoft", 2), ("Google", 3),
         ("Amazon", 4), ("Netflix", 5), ("Spotify", 6)],
        ["name", "id"],
    )
    m = SparkEntityMatching({
        "name_only": True,
        "entity_id_col": "id",
        "name_col": "name",
        "indexers": [
            {"type": "cosine_similarity", "tokenizer": "characters", "ngram": 2,
             "num_candidates": 5, "cos_sim_lower_bound": 0.2},
            {"type": "sni", "window_length": 3},
        ],
        "supervised_on": False,
    })
    m.fit(gt)
    return m


def test_candidates_match_reference_example(spark, model):
    test_names = spark.createDataFrame(
        [("Apl", 1), ("Aplle", 1), ("Microbloft", 2),
         ("Netflfli", 5), ("amz", 4), ("googol", 3)],
        ["name", "id"],
    )
    out = model.transform(test_names)
    got = {
        (r["name"], r["gt_name"], r["gt_entity_id"])
        for r in out.filter("score_0 > 0").select("name", "gt_name", "gt_entity_id").collect()
    }
    assert got == GOLDEN


def test_supervised_example_trains_and_ranks(spark, model):
    train_names = spark.createDataFrame(
        [("MicorSoft", 2), ("Gugle", 3), ("Netfliks", 5), ("Spot-on", 6), ("Spot-off", 6)],
        ["name", "id"],
    )
    test_names = spark.createDataFrame(
        [("Apl", 1), ("Microbloft", 2), ("googol", 3)], ["name", "id"]
    )
    model.fit_classifier(train_names, create_negative_sample_fraction=0.5, max_iter=5)
    out = model.transform(test_names)
    best = {
        r["name"]: r["gt_entity_id"]
        for r in out.filter("best_match").collect()
    }
    assert best == {"Apl": 1, "Microbloft": 2, "googol": 3}
    model.supervised_on = False  # restore fixture state
    model.supervised_model_ = None


def test_curated_example_stats(spark):
    """Mirror of reference tests/integration/test_readme_example.py:
    every name-to-match gets a best candidate and the correct-match count
    clears the same ~89% bar the reference pins (1600/1800)."""
    from entitymatchingmodel_spark.sources.example_data import example

    n_gt, n_noised, n_test, n_best, n_correct, n_incorrect = example(spark)
    assert n_gt == 62
    assert n_noised == n_gt
    assert n_test == n_gt
    assert n_best == n_test          # every test name matched
    assert n_correct >= 0.85 * n_best, (n_correct, n_best)
    assert n_correct + n_incorrect == n_best
