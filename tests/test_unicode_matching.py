"""Non-Latin name matching (F1 full-Unicode transliteration).

Mirrors reference tests/integration/test_entity_matching.py:365-410
(test_non_latin_name_matching): Greek (including polytonic, which requires
the NFKD fallback), Cyrillic, and accented-Latin GT names must normalize
to the same ASCII form on both the GT and query side so the cosine indexer
finds them.
"""

import pytest
from pyspark.sql import functions as F

from entitymatchingmodel_spark.functions.preprocessing import (
    apply_pipeline,
    strip_accents,
    strip_accents_unicode,
)
from entitymatchingmodel_spark.pipeline import SparkEntityMatching


def _translit(spark, s: str, fn=strip_accents_unicode) -> str:
    df = spark.createDataFrame([(s,)], "name string")
    return df.select(fn(F.col("name")).alias("t")).collect()[0]["t"]


def test_native_tables_cover_greek_cyrillic_latin(spark):
    assert _translit(spark, "Société Générale", strip_accents) == "Societe Generale"
    assert _translit(spark, "Ελληνική Τράπεζα", strip_accents) == "Ellenike Trapeza"
    assert _translit(spark, "Щёлково Агрохим", strip_accents) == "Shchelkovo Agrokhim"
    assert _translit(spark, "Объединённые", strip_accents) == "Obedinennye"


def test_nfkd_fallback_handles_polytonic_greek(spark):
    # polytonic chars (Greek Extended block) only resolve via NFKD
    assert _translit(spark, "ἄyχi πapaoτάς") == "aykhi papaotas"
    # ASCII passes through untouched
    assert _translit(spark, "plain ascii & co") == "plain ascii & co"


@pytest.mark.parametrize("tokenizer,ngram", [("words", 1), ("characters", 3)])
def test_non_latin_name_matching(spark, tokenizer, ngram):
    """Reference test_entity_matching.py:365-410 rebuilt on this API."""
    nm = SparkEntityMatching(
        {
            "preprocessor": "preprocess_with_punctuation",
            "indexers": [
                {
                    "type": "cosine_similarity",
                    "tokenizer": tokenizer,
                    "ngram": ngram,
                    "num_candidates": 1,
                    "cos_sim_lower_bound": 0.1,
                }
            ],
            "entity_id_col": "id",
            "name_col": "name",
        }
    )
    ground_truth = [
        "a b c",
        "bździągwa",
        "ϰaὶ τότ ἐyὼ Kύϰλωπa πpooηύδωv ἄyχi πapaoτάς",
    ]
    gt_sdf = spark.createDataFrame(list(enumerate(ground_truth)), ["id", "name"])
    nm.fit(gt_sdf)

    queries = [
        "a b",  # latin sanity check
        "bzdziagwa",  # accents already stripped on the query side
        "a b c ϰaὶ τότ ἐyὼ Kύϰλωπa πpooηύδωv ἄyχi πapaoτάς",  # greek dominates
    ]
    q_sdf = spark.createDataFrame(
        [(i + 100, q) for i, q in enumerate(queries)], ["id", "name"]
    )
    matched = nm.transform(q_sdf).toPandas()
    got = (
        matched.sort_values("score_0", ascending=False)
        .groupby("entity_id")
        .first()["gt_entity_id"]
    )
    assert len(got) == len(queries)
    for qid, expected in zip((100, 101, 102), (0, 1, 2)):
        assert got.loc[qid] == expected, (qid, got)


def test_pipeline_output_is_ascii_for_covered_scripts(spark):
    names = [
        "Ελληνική Τράπεζα Α.Ε.",
        "Банк «Москвы» ООО",
        "Crédit Agricole S.A.",
        "ϰaὶ τότ ἐyὼ Kύϰλωπa",
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    out = [
        r["p"]
        for r in df.select(apply_pipeline(F.col("name")).alias("p")).collect()
    ]
    assert all(p.isascii() and p == p.lower() for p in out), out
