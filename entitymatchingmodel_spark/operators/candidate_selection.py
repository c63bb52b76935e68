"""Candidate-selection combinator: union per-indexer pairs, dedup, rejoin info.

Reference: emm/indexing/spark_candidate_selection.py:200-283 (transform),
:233-240 (union + groupBy max), :296-325 (GT rejoin), :259-265 (left-outer
names rejoin for no-candidate rows).

All pure DataFrame.  The GT-info join is broadcastable when GT fits the
threshold; otherwise AQE picks a shuffle-hash join on gt_uid.  No checkpoint
is needed (uids are deterministic content hashes, see schema.with_uid).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entitymatchingmodel_spark import schema as S


def combine_candidates(per_indexer: dict[str, DataFrame]) -> DataFrame:
    """{indexer_name -> (uid, gt_uid, score, rank)} -> one row per (uid, gt_uid)
    with score_<i>/rank_<i> columns (max-merged across indexers)."""
    renamed = []
    for i, (iname, df) in enumerate(per_indexer.items()):
        renamed.append(
            df.select(
                S.UID,
                "gt_uid",
                F.col("score").alias(f"score_{i}"),
                F.col("rank").alias(f"rank_{i}"),
            )
        )
    unioned = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), renamed
    )
    aggs = []
    for i in range(len(per_indexer)):
        aggs.append(F.max(f"score_{i}").alias(f"score_{i}"))
        aggs.append(F.max(f"rank_{i}").alias(f"rank_{i}"))
    return unioned.groupBy(S.UID, "gt_uid").agg(*aggs)


def attach_gt_info(cands: DataFrame, gt: DataFrame) -> DataFrame:
    """candidates ⋈ GT on gt_uid to attach gt_* columns (ref J5)."""
    return cands.join(gt, "gt_uid", "left")


def attach_names(
    cands: DataFrame, names: DataFrame, with_no_matches: bool = True
) -> DataFrame:
    """names ⋈ candidates on uid; left-outer manufactures one all-null
    candidate row per unmatched name when with_no_matches (ref J6)."""
    how = "left" if with_no_matches else "inner"
    return names.join(cands, S.UID, how)
