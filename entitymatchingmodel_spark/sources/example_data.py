"""Example / test data source (ref emm/data/create_data.py:100-250).

The reference downloads a public KVK company-name CSV; this environment is
offline, so the example tables derive deterministically from the driver-
provided TPC-H-ish parquet (part names) — same shape: a ground truth
(name, id) and a noised names-to-match set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entitymatchingmodel_spark.sources.noiser import noise_names

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


# Curated example ground truth: well-known international company names
# (public facts), with legal-entity forms — the offline stand-in for the
# reference's downloaded KVK register (ref emm/data/create_data.py:100-144).
CURATED_COMPANY_NAMES = [
    "Apple Inc", "Microsoft Corp", "Alphabet Inc", "Amazon com Inc",
    "Netflix Inc", "Spotify Technology SA", "Koninklijke Philips NV",
    "ING Groep NV", "ABN AMRO Bank NV", "Rabobank UA", "Heineken NV",
    "Unilever PLC", "Royal Dutch Shell PLC", "ASML Holding NV",
    "Adyen NV", "TomTom NV", "Siemens AG", "Volkswagen AG", "BMW AG",
    "Bayer AG", "BASF SE", "SAP SE", "Allianz SE", "Deutsche Bank AG",
    "Nestle SA", "Novartis AG", "Roche Holding AG", "UBS Group AG",
    "Credit Suisse Group AG", "LVMH Moet Hennessy Louis Vuitton SE",
    "TotalEnergies SE", "BNP Paribas SA", "Societe Generale SA",
    "Banco Santander SA", "Telefonica SA", "Ferrari NV", "Eni SpA",
    "UniCredit SpA", "Nokia Oyj", "Ericsson AB", "Volvo AB",
    "Statoil ASA", "Maersk AS", "Toyota Motor Corp", "Sony Group Corp",
    "Hitachi Ltd", "Nintendo Co Ltd", "Samsung Electronics Co Ltd",
    "Tata Consultancy Services Ltd", "Infosys Ltd", "Tencent Holdings Ltd",
    "Alibaba Group Holding Ltd", "HSBC Holdings PLC", "Barclays PLC",
    "BP PLC", "GlaxoSmithKline PLC", "Rio Tinto PLC", "Vodafone Group PLC",
    "Accenture PLC", "Medtronic PLC", "Orlen SA", "CD Projekt SA",
]


def curated_ground_truth(spark: SparkSession) -> DataFrame:
    """(name, id) ground truth of real, well-known company names."""
    return spark.createDataFrame(
        list(enumerate(CURATED_COMPANY_NAMES)), ["id", "name"]
    ).select("name", "id")


def example(spark: SparkSession, seed: int = 43) -> tuple[int, int, int, int, int, int]:
    """The reference's README example end-to-end (ref example.py:30-97),
    on the curated company names: noise the GT, split train/test, fit a
    char-2gram cosine + SNI matcher with the supervised layer
    (with_legal_entity_forms_match on, as the reference README sets), and
    return the same stats tuple: (n_ground_truth, n_noised_names,
    n_names_to_match, n_best_match, n_correct, n_incorrect).
    """
    from pyspark.sql import functions as FF

    from entitymatchingmodel_spark.pipeline import SparkEntityMatching

    gt = curated_ground_truth(spark)
    train = noise_names(gt, "name", "noised", noise_level=0.5, seed=seed).select(
        FF.col("noised").alias("name"), "id"
    )
    test = noise_names(gt, "name", "noised", noise_level=0.5, seed=seed + 1).select(
        FF.col("noised").alias("name"), "id"
    )
    m = SparkEntityMatching(
        {
            "name_only": True,
            "entity_id_col": "id",
            "name_col": "name",
            "indexers": [
                {"type": "cosine_similarity", "tokenizer": "characters",
                 "ngram": 2, "num_candidates": 5, "cos_sim_lower_bound": 0.2},
                {"type": "sni", "window_length": 3},
            ],
            "supervised_on": True,
            "with_legal_entity_forms_match": True,
        }
    )
    m.fit(gt)
    m.fit_classifier(train, create_negative_sample_fraction=0.5, max_iter=10)
    out = m.transform(test).toPandas()
    best = out[out["best_match"]]
    n_correct = int((best["gt_entity_id"] == best["entity_id"]).sum())
    return (
        gt.count(), train.count(), test.count(),
        len(best), n_correct, len(best) - n_correct,
    )


def example_ground_truth(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """(name, id) ground truth from distinct part names."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return part.groupBy(F.col("p_name").alias("name")).agg(
        F.min("p_partkey").alias("id")
    )


def example_names_to_match(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    noise_level: float = 0.5,
    seed: int = 1,
) -> DataFrame:
    """(name, id) names-to-match: noised copies of the ground-truth names;
    ``id`` is the true entity id, so transforms are self-labelling."""
    gt = example_ground_truth(spark, sf_dir)
    noised = noise_names(gt, "name", "noised_name", noise_level=noise_level, seed=seed)
    return noised.select(F.col("noised_name").alias("name"), "id")
