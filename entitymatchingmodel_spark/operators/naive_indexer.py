"""Naive all-pairs indexer (ref emm/indexing/pandas_naive_indexer.py:42-66).

Test-oracle indexer: every (name, gt) pair is a candidate with score 1.
Physical plan is a cartesian product — O(n*m), only for small fixtures; a
``max_pairs`` guard refuses to run when the estimated pair count explodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entitymatchingmodel_spark import schema as S


class NaiveIndexerModel:
    def __init__(self, gt_uids: DataFrame, max_pairs: int | None):
        self.gt_uids = gt_uids
        self.max_pairs = max_pairs

    def unpersist(self) -> None:
        self.gt_uids.unpersist()

    def transform(self, names: DataFrame) -> DataFrame:
        if self.max_pairs is not None:
            n = names.count() * self.gt_uids.count()
            if n > self.max_pairs:
                raise ValueError(
                    f"naive indexer would produce {n} pairs > max_pairs="
                    f"{self.max_pairs}; use a real indexer at this scale"
                )
        return (
            names.select(S.UID)
            .crossJoin(self.gt_uids)
            .select(
                S.UID,
                "gt_uid",
                F.lit(1.0).alias("score"),
                F.lit(1).cast("int").alias("rank"),
            )
        )


class NaiveIndexer:
    def __init__(self, max_pairs: int | None = 10_000_000, input_col: str = S.PREPROCESSED):
        self.max_pairs = max_pairs
        self.input_col = input_col

    def fit(self, gt: DataFrame) -> NaiveIndexerModel:
        return NaiveIndexerModel(gt.select("gt_uid").persist(), self.max_pairs)
