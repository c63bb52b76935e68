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
