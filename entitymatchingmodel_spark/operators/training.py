"""Training-pair preparation and threshold decision (SURVEY §2.10 M10-M13).

Reference does all of this driver-side in pandas after a full
``toPandas()`` collect (emm/data/prepare_name_pairs.py:29-31 — a cluster->
driver boundary on every training run).  Here every step is a DataFrame
transformation; nothing leaves the cluster until the final (tiny) threshold
curve is read.

Semantics mirrored from the reference:
- label: ``correct = entity_id == gt_entity_id``  (prepare_name_pairs.py:96)
- positive/negative split by entity id             (prepare_name_pairs.py:100-108)
- negative-sample reranking per indexer            (negative_data_creation.py:28-253):
  cossim: drop correct pairs, rerank 1..n, drop highest rank;
  SNI: drop correct pairs, shift ranks on the correct pair's side one step
  toward zero (unless the correct rank was 0, absent, or duplicated),
  drop |rank| == max.
- threshold curves: per name-set {all, positive, negative} confusion
  matrices at every distinct score threshold (threshold/threshold_decision
  .py:27-149) — computed as a groupBy + cumulative window, not sklearn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_candidates(cands: DataFrame, entity_id_col: str = "entity_id",
                     gt_entity_id_col: str = "gt_entity_id") -> DataFrame:
    """correct = entity_id == gt_entity_id (null-safe: null gt -> False)."""
    return cands.withColumn(
        "correct",
        F.when(
            F.col(entity_id_col).isNotNull() & F.col(gt_entity_id_col).isNotNull(),
            F.col(entity_id_col) == F.col(gt_entity_id_col),
        ).otherwise(F.lit(False)),
    )


def split_positive_set(
    cands: DataFrame,
    entity_id_col: str = "entity_id",
    fraction: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Deterministic entity-level positive/negative split.

    The reference samples entity ids with a driver rng (prepare_name_pairs
    .py:100-108); here the split is a pure hash of the entity id — same
    result on any cluster, no collect, stable across reruns.
    """
    bucket = F.pmod(F.xxhash64(F.col(entity_id_col).cast("string"), F.lit(seed)), F.lit(1000))
    return cands.withColumn("positive_set", bucket < int(fraction * 1000))


def negative_rerank_cossim(
    df: DataFrame, rank_col: str, rank_max: int, uid_col: str = "uid"
) -> DataFrame:
    """(uid, gt_uid, new_rank) for surviving negative-set cossim candidates."""
    neg = df.filter(~F.col("correct") & F.col(rank_col).isNotNull())
    w = Window.partitionBy(uid_col).orderBy(F.col(rank_col).asc())
    return (
        neg.withColumn("_nr", F.row_number().over(w))
        .filter(F.col("_nr") < rank_max)
        .select(uid_col, "gt_uid", F.col("_nr").cast("double").alias(rank_col))
    )


def negative_rerank_sni(
    df: DataFrame, rank_col: str, rank_max: int, uid_col: str = "uid"
) -> DataFrame:
    """(uid, gt_uid, new_rank) for surviving negative-set SNI candidates.

    Shift logic per ref negative_data_creation.py:120-146: with r_pc the
    rank of the removed correct pair — skip when r_pc in {0, null} or when
    another candidate kept rank r_pc; else ranks strictly beyond r_pc on
    its side move one step toward zero.
    """
    has = df.filter(F.col(rank_col).isNotNull())
    pc = (
        has.filter(F.col("correct"))
        .groupBy(uid_col)
        .agg(F.last(rank_col).alias("_r_pc"))
    )
    neg = has.filter(~F.col("correct")).join(pc, uid_col, "left")
    same_rank = F.max(
        F.when(F.col(rank_col) == F.col("_r_pc"), 1).otherwise(0)
    ).over(Window.partitionBy(uid_col))
    neg = neg.withColumn("_dup", same_rank == 1)
    shift = (
        F.when(
            F.col("_r_pc").isNull() | (F.col("_r_pc") == 0) | F.col("_dup"), F.col(rank_col)
        )
        .when(
            (F.col("_r_pc") > 0) & (F.col(rank_col) > F.col("_r_pc")),
            F.col(rank_col) - 1,
        )
        .when(
            (F.col("_r_pc") < 0) & (F.col(rank_col) < F.col("_r_pc")),
            F.col(rank_col) + 1,
        )
        .otherwise(F.col(rank_col))
    )
    return (
        neg.withColumn("_nr", shift)
        .filter(F.abs(F.col("_nr")) < rank_max)
        .select(uid_col, "gt_uid", F.col("_nr").cast("double").alias(rank_col))
    )


def create_positive_negative_samples(
    df: DataFrame, uid_col: str = "uid", readd_no_candidates: bool = True
) -> DataFrame:
    """Distributed twin of ref create_positive_negative_samples (:172-253).

    Input: labelled candidates with ``correct``, ``positive_set`` and one or
    more ``rank_<i>`` columns.  Output: the merged positive+negative training
    set with per-indexer reranked rank columns; pairs dropped by every
    indexer disappear, but names whose candidates were ALL dropped come back
    as one no-candidate row (ref prepare_name_pairs.py:149-163 anti-join,
    SURVEY §2.5 J9) so the classifier still sees them as negatives.
    """
    rank_cols = [c for c in df.columns if c.startswith("rank_")]
    if not rank_cols:
        raise ValueError("no rank_* columns found")
    df = df.persist()

    bounds = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in rank_cols],
        *[F.max(F.abs(F.col(c))).alias(f"max_{c}") for c in rank_cols],
    ).collect()[0]

    pos = df.filter(F.col("positive_set"))
    neg = df.filter(~F.col("positive_set"))

    merged: DataFrame | None = None
    for c in rank_cols:
        rank_min = bounds[f"min_{c}"]
        rank_max = max(abs(bounds[f"max_{c}"] or 0), abs(rank_min or 0))
        if rank_min is not None and rank_min < 0:
            neg_i = negative_rerank_sni(neg, c, rank_max, uid_col)
        else:
            neg_i = negative_rerank_cossim(neg, c, rank_max, uid_col)
        pos_i = (
            pos.filter(F.col(c).isNotNull() & (F.abs(F.col(c)) < rank_max))
            .select(uid_col, "gt_uid", F.col(c).cast("double").alias(c))
        )
        both = neg_i.unionByName(pos_i)
        merged = both if merged is None else merged.join(both, [uid_col, "gt_uid"], "full")

    base = df.drop(*rank_cols)
    out = base.join(merged, [uid_col, "gt_uid"])
    if readd_no_candidates:
        survivors = merged.select(uid_col).distinct()
        gt_side = [c for c in base.columns if c.startswith("gt_") or c.startswith("score_")]
        missing = (
            base.join(survivors, uid_col, "left_anti")
            .dropDuplicates([uid_col])
            .withColumns({c: F.lit(None).cast(base.schema[c].dataType) for c in gt_side})
            .withColumn("correct", F.lit(False))
        )
        for c in rank_cols:
            missing = missing.withColumn(c, F.lit(None).cast("double"))
        out = out.unionByName(missing)
    return out


def create_training_pairs(
    em,
    names: DataFrame,
    fraction_positive: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Full M10 path: widened-window transform -> label -> split -> rerank.

    Window widening (+1 candidate / +2 SNI window, ref base_indexer.py:59-96,
    spark_entity_matching.py:397-404) is applied to the FITTED models for the
    duration of the transform, then restored — reranking then shrinks the
    negative set back to the original window.
    """
    models = list(em.indexer_models_.values())
    saved = []
    for m in models:
        if hasattr(m, "k"):
            saved.append(("k", m.k))
            m.k += 1
        else:
            saved.append(("w", m.w))
            m.w += 1
    sup, agg = em.supervised_on, em.aggregation_layer
    em.supervised_on, em.aggregation_layer = False, False
    try:
        cands = em.transform(names)
    finally:
        em.supervised_on, em.aggregation_layer = sup, agg
        for m, (attr, v) in zip(models, saved):
            setattr(m, attr, v)
    cands = label_candidates(cands)
    cands = split_positive_set(cands, fraction=fraction_positive, seed=seed)
    out = create_positive_negative_samples(cands)
    # no_candidate flag (ref prepare_name_pairs.py training-set column)
    return out.withColumn("no_candidate", F.col("gt_uid").isNull())


def uid_constant_cols(
    df: DataFrame, uid_col: str = "uid", candidates: list[str] | None = None
) -> list[str]:
    """Columns whose value is constant within every ``uid`` group (SURVEY
    §2.6 A8; ref prepare_name_pairs.py:133-135 does a pandas ``nunique``).

    Used to decide which name-level columns can be carried through per-uid
    training aggregation without ambiguity.  One distributed two-level
    aggregation; nulls don't count as a distinct value (pandas parity).
    """
    cols = [c for c in (candidates or df.columns) if c != uid_col]
    if not cols:
        return []
    per = df.groupBy(uid_col).agg(
        *[F.countDistinct(F.col(c)).alias(c) for c in cols]
    )
    mx = per.agg(*[F.max(c).alias(c) for c in cols]).first()
    return [c for c in cols if (mx[c] or 0) <= 1]


def grouped_stratified_split(
    df: DataFrame,
    group_col: str,
    n_folds: int = 5,
    stratum_cols: tuple[str, ...] = (),
    salt: str = "fold",
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic grouped (and stratified) k-fold assignment (SURVEY §2.10
    M11; ref base_supervised_model.py:255-266 uses sklearn's
    StratifiedGroupKFold on the driver).

    Guarantees:
    - *grouping*: every row of a group lands in the same fold — fold is a
      pure function of the group key (and the group's stratum);
    - *stratification*: fold membership is a uniform md5 hash, so within
      each stratum the folds receive equal shares in expectation.  The
      group's stratum (element-wise max of ``stratum_cols`` over the group)
      is folded into the hash salt so re-salting one stratum reshuffles only
      that stratum.

    Unlike the sklearn path this never leaves the cluster, is stable across
    engines/runs/partitionings (md5 of the key, same scheme as
    functions/sampling.py), and costs at most one window shuffle on
    ``group_col`` — zero extra shuffles downstream of any per-group stage
    already partitioned that way.
    """
    from entitymatchingmodel_spark.functions.sampling import _unit_hash

    if n_folds < 2:
        raise ValueError("n_folds must be >= 2")
    key = F.col(group_col).cast("string")
    if stratum_cols:
        w = Window.partitionBy(group_col)
        strat = [
            F.max(F.col(c).cast("long")).over(w).cast("string") for c in stratum_cols
        ]
        key = F.concat_ws("#", *strat, key)
    fold = F.floor(_unit_hash(key, salt) * n_folds).cast("int")
    return df.withColumn(fold_col, fold)


# ---------------------------------------------------------------------------
# Threshold decision curves (M12) + AUC (M13)
# ---------------------------------------------------------------------------

def threshold_curves(
    scored: DataFrame,
    score_col: str = "nm_score",
    correct_col: str = "correct",
    positive_set_col: str | None = "positive_set",
) -> DataFrame:
    """Confusion-matrix curves at every distinct score threshold.

    Returns (name_set, threshold, tn, fp, fn, tp): predicting positive for
    score >= threshold.  Pure groupBy + cumulative window — the driver never
    sees individual scores, only |distinct scores| curve rows.
    """
    sets = [("all", None)]
    if positive_set_col and positive_set_col in scored.columns:
        sets += [("positive", F.col(positive_set_col)), ("negative", ~F.col(positive_set_col))]

    out: DataFrame | None = None
    for name, cond in sets:
        sub = scored.filter(cond) if cond is not None else scored
        sub = sub.filter(F.col(score_col).isNotNull())
        g = sub.groupBy(F.col(score_col).alias("threshold")).agg(
            F.sum(F.col(correct_col).cast("long")).alias("_pos"),
            F.count("*").alias("_n"),
        )
        w = Window.orderBy(F.desc("threshold")).rowsBetween(Window.unboundedPreceding, 0)
        wa = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        cur = (
            g.withColumn("tp", F.sum("_pos").over(w).cast("double"))
            .withColumn("fp", (F.sum("_n").over(w) - F.sum("_pos").over(w)).cast("double"))
            .withColumn("fn", (F.sum("_pos").over(wa) - F.col("tp")).cast("double"))
            .withColumn("tn", (F.sum("_n").over(wa) - F.sum("_pos").over(wa) - F.col("fp")).cast("double"))
            .select(F.lit(name).alias("name_set"), "threshold", "tn", "fp", "fn", "tp")
        )
        out = cur if out is None else out.unionByName(cur)
    return out


def calc_threshold(
    curves: DataFrame,
    name_set: str = "all",
    metric: str = "precision",
    min_value: float = 0.9,
) -> float:
    """Lowest threshold whose metric meets ``min_value`` (max recall subject
    to the constraint) — ref base_entity_matching.py:211-288."""
    c = curves.filter(F.col("name_set") == name_set)

    def _ratio(num, den):
        # degenerate curve rows (e.g. recall on an all-negative set) have a
        # zero denominator; NULL (row fails the >= filter) instead of an
        # ANSI DIVIDE_BY_ZERO throw
        return F.when(den > 0, num / den)

    m = {
        "precision": _ratio(F.col("tp"), F.col("tp") + F.col("fp")),
        "recall": _ratio(F.col("tp"), F.col("tp") + F.col("fn")),
        "accuracy": _ratio(
            F.col("tp") + F.col("tn"),
            F.col("tp") + F.col("tn") + F.col("fp") + F.col("fn"),
        ),
        "f1": _ratio(2 * F.col("tp"), 2 * F.col("tp") + F.col("fp") + F.col("fn")),
    }[metric]
    row = (
        c.withColumn("_m", m)
        .filter(F.col("_m") >= min_value)
        .agg(F.min("threshold").alias("t"))
        .collect()[0]
    )
    if row["t"] is None:
        raise ValueError(f"no threshold reaches {metric} >= {min_value}")
    return float(row["t"])


def auc_frame(
    scored: DataFrame, score_col: str = "nm_score", correct_col: str = "correct"
) -> DataFrame:
    """ROC AUC as a ONE-ROW DataFrame ``(auc, n_pos, n_neg)`` — the
    rank-sum identity of :func:`auc_score` kept entirely as a plan (no
    driver collect), so the metric can ride inside a larger query (e.g.
    the supervised quality-gate contract row).  ``auc`` is NULL when a
    class is absent (the scalar twin raises instead)."""
    sub = scored.filter(F.col(score_col).isNotNull())
    # Aggregate per distinct score first: the tied-rank average of a score
    # group is cum_count_before + (n+1)/2, so the global window runs over
    # |distinct scores| rows, not |candidates| rows.
    g = sub.groupBy(F.col(score_col).alias("_s")).agg(
        F.count("*").alias("_n"),
        F.sum(F.col(correct_col).cast("long")).alias("_pos"),
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.withColumn(
        "r", F.coalesce(F.sum("_n").over(w), F.lit(0)) + (F.col("_n") + 1) / 2.0
    )
    agg = ranked.agg(
        F.sum(F.col("_pos") * F.col("r")).alias("rs"),
        F.sum("_pos").alias("np"),
        F.sum("_n").alias("n"),
    )
    n_pos, n_neg = F.col("np"), F.col("n") - F.col("np")
    return agg.select(
        F.when(
            (n_pos > 0) & (n_neg > 0),
            (F.col("rs") - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg),
        ).alias("auc"),
        n_pos.cast("long").alias("n_pos"),
        n_neg.cast("long").alias("n_neg"),
    )


def auc_score(
    scored: DataFrame, score_col: str = "nm_score", correct_col: str = "correct"
) -> float:
    """ROC AUC via the rank-sum (Mann-Whitney) identity — one groupBy, no
    per-row collect (ref test helper pandas_entity_matching.py:527-559).
    Scalar twin of :func:`auc_frame` (the single bounded collect is the
    one-row metric); raises when a class is absent."""
    row = auc_frame(scored, score_col, correct_col).collect()[0]
    if row["auc"] is None:
        raise ValueError("need both classes for AUC")
    return float(row["auc"])
