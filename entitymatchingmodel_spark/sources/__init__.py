from entitymatchingmodel_spark.sources.example_data import (
    example_ground_truth,
    example_names_to_match,
)
from entitymatchingmodel_spark.sources.noiser import noise_names

__all__ = ["example_ground_truth", "example_names_to_match", "noise_names"]
