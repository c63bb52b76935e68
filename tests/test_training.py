"""Training-pair prep, negative reranking, threshold curves, AUC (M10-M13)."""

import pytest
from pyspark.sql import functions as F

from entitymatchingmodel_spark import SparkEntityMatching
from entitymatchingmodel_spark.operators import training as T


def test_negative_rerank_cossim(spark):
    # uid 1: correct pair at rank 2 of 3 -> drop it, rerank 1..2, drop rank 2 (max=3 -> keep <3)
    df = spark.createDataFrame(
        [(1, 10, 1.0, False), (1, 11, 2.0, True), (1, 12, 3.0, False),
         (2, 20, 1.0, False), (2, 21, 2.0, False), (2, 22, 3.0, False)],
        "uid long, gt_uid long, rank_0 double, correct boolean",
    )
    out = T.negative_rerank_cossim(df, "rank_0", rank_max=3).collect()
    got = {(r["uid"], r["gt_uid"]): r["rank_0"] for r in out}
    # uid 1: gt 10 -> 1, gt 12 -> 2 but 2 < 3 so kept
    assert got[(1, 10)] == 1.0 and got[(1, 12)] == 2.0
    # uid 2 (no correct): ranks 1,2 kept; old rank 3 reranked to 3 -> dropped
    assert got[(2, 20)] == 1.0 and got[(2, 21)] == 2.0
    assert (2, 22) not in got


def test_negative_rerank_sni_shift(spark):
    # correct at rank +1: ranks beyond +1 shift toward 0; negative side unchanged
    df = spark.createDataFrame(
        [(1, 10, -1.0, False), (1, 11, 1.0, True), (1, 12, 2.0, False)],
        "uid long, gt_uid long, rank_1 double, correct boolean",
    )
    out = T.negative_rerank_sni(df, "rank_1", rank_max=2).collect()
    got = {(r["uid"], r["gt_uid"]): r["rank_1"] for r in out}
    assert got[(1, 10)] == -1.0
    assert got[(1, 12)] == 1.0  # shifted 2 -> 1, |1| < 2 kept


def test_negative_rerank_sni_exact_correct_no_shift(spark):
    # correct at rank 0 -> no shift
    df = spark.createDataFrame(
        [(1, 10, 0.0, True), (1, 11, 1.0, False), (1, 12, -1.0, False)],
        "uid long, gt_uid long, rank_1 double, correct boolean",
    )
    out = T.negative_rerank_sni(df, "rank_1", rank_max=2).collect()
    got = {(r["uid"], r["gt_uid"]): r["rank_1"] for r in out}
    assert got == {(1, 11): 1.0, (1, 12): -1.0}


def test_create_training_pairs_end_to_end(spark):
    gt = spark.createDataFrame(
        [(i, n) for i, n in enumerate(
            ["apple inc", "microsoft corp", "netflix nv", "amazon ltd",
             "spotify ab", "alphabet bv", "meta plc", "tesla gmbh"])],
        "id long, name string",
    )
    names = gt.select("id", F.col("name"))
    em = SparkEntityMatching(
        indexers=[
            {"type": "cosine_similarity", "tokenizer": "characters", "ngram": 2,
             "num_candidates": 3, "cos_sim_lower_bound": 0.1},
            {"type": "sni", "window_length": 3},
        ]
    )
    em.fit(gt)
    pairs = em.create_training_name_pairs(names, fraction_positive=0.5, seed=7)
    rows = pairs.collect()
    assert rows, "no training pairs"
    cols = pairs.columns
    assert {"correct", "positive_set", "rank_0", "rank_1"} <= set(cols)
    # negative-set names must have no correct candidate left
    neg_correct = [r for r in rows if not r["positive_set"] and r["correct"]]
    assert not neg_correct


def test_threshold_curves_and_calc(spark):
    scored = spark.createDataFrame(
        [(0.9, True), (0.8, True), (0.7, False), (0.6, True), (0.5, False)],
        "nm_score double, correct boolean",
    )
    curves = T.threshold_curves(scored, positive_set_col=None)
    rows = {r["threshold"]: r for r in curves.collect()}
    assert rows[0.9]["tp"] == 1.0 and rows[0.9]["fp"] == 0.0
    assert rows[0.5]["tp"] == 3.0 and rows[0.5]["fp"] == 2.0
    # precision >= 1.0 achievable down to 0.8
    assert T.calc_threshold(curves, "all", "precision", 1.0) == 0.8
    with pytest.raises(ValueError, match="no threshold"):
        T.calc_threshold(curves, "all", "recall", 1.5)


def test_auc_matches_manual(spark):
    scored = spark.createDataFrame(
        [(0.9, True), (0.8, True), (0.7, False), (0.6, True), (0.5, False)],
        "nm_score double, correct boolean",
    )
    # manual: pairs (pos, neg) where pos > neg: 3 pos x 2 neg = 6 pairs,
    # (0.9,0.7)(0.9,0.5)(0.8,0.7)(0.8,0.5)(0.6,0.5) win = 5 -> 5/6
    assert abs(T.auc_score(scored) - 5 / 6) < 1e-12


def test_grouped_stratified_split(spark):
    rows = [(u, g, u % 3 == 0) for u in range(200) for g in range(3)]
    df = spark.createDataFrame(rows, "uid long, gt_uid long, correct boolean")
    out = T.grouped_stratified_split(
        df, group_col="uid", n_folds=5, stratum_cols=("correct",)
    ).collect()
    # grouping: all rows of a uid share one fold
    by_uid = {}
    for r in out:
        by_uid.setdefault(r["uid"], set()).add(r["fold"])
    assert all(len(s) == 1 for s in by_uid.values())
    # fold range + all folds populated at 200 groups
    folds = {r["fold"] for r in out}
    assert folds <= set(range(5)) and len(folds) == 5
    # deterministic on recompute
    out2 = T.grouped_stratified_split(
        df, group_col="uid", n_folds=5, stratum_cols=("correct",)
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    with pytest.raises(ValueError, match="n_folds"):
        T.grouped_stratified_split(df, group_col="uid", n_folds=1)


def test_uid_constant_cols(spark):
    df = spark.createDataFrame(
        [(1, "a", 10, None), (1, "a", 20, None), (2, "b", 30, 5)],
        "uid long, name string, score int, extra int",
    )
    # name constant within each uid; score varies within uid 1; extra is
    # null-only for uid 1 (nulls don't count) and single-valued for uid 2
    assert T.uid_constant_cols(df) == ["name", "extra"]
    assert T.uid_constant_cols(df, candidates=["score"]) == []
