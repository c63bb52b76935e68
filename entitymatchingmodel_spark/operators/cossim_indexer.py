"""Cosine-similarity top-k candidate indexer — pure-Catalyst inverted-index join.

Reference (emm/indexing/spark_cos_sim_matcher.py) collects the whole GT TF-IDF
matrix to the driver, broadcasts it, and runs a C++ sparse-matmul kernel inside
``rdd.mapPartitions`` (spark_indexing_utils.py:51-100, spark_cos_sim_matcher.py
:295-318, 645-675).  That design caps GT size at driver/executor memory and
bypasses Catalyst entirely.

This engine expresses the same *exact* top-k cosine join declaratively
(SURVEY.md §2.5 J1 strategy (b)):

    names weights (uid, token, w)  ⋈ token ⋈  gt weights (gt_uid, token, w)
    -> groupBy(uid, gt_uid).sum(w*w')         # cosine numerator; L2-normed
    -> filter score > lower_bound             # threshold pushdown (X4)
    -> row_number over (uid, score desc)      # top-k (X3), ties gt_uid desc

Scale properties: no driver collect, no manual broadcast; the token join
shuffles on token (AQE handles skew), the score agg shuffles on (uid, gt_uid)
with map-side partial aggregation.  Blocking (X2) becomes an extra equi-join
key, i.e. real partition pruning.  Hot-token guard: optional ``max_df_frac``
drops tokens present in > frac of GT docs (their idf ~ 0, so they contribute
negligible score but quadratic join work).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from entitymatchingmodel_spark import schema as S
from entitymatchingmodel_spark.operators.tfidf import TfIdfModel, TfIdfVectorizer


def first_char_block(c: Column) -> Column:
    """Default blocking function (ref helper/blocking_functions.py:31-46)."""
    return F.substring(F.regexp_replace(c, "\\s", ""), 1, 1)


class CosSimIndexerModel:
    def __init__(
        self,
        tfidf: TfIdfModel,
        gt_weights: DataFrame,  # (gt_uid, token [, block], gt_weight)
        k: int,
        lower_bound: float,
        blocking_func,
        input_col: str,
        score_decimals: int | None = None,
    ):
        self.tfidf = tfidf
        self.gt_weights = gt_weights
        self.k = k
        self.lower_bound = lower_bound
        self.blocking_func = blocking_func
        self.input_col = input_col
        self.score_decimals = score_decimals

    def transform(self, names: DataFrame) -> DataFrame:
        """names (uid, preprocessed, ...) -> (uid, gt_uid, score, rank)."""
        q = self.tfidf.transform(names, S.UID)
        join_keys = ["token"]
        if self.blocking_func is not None:
            blocks = names.select(
                S.UID, self.blocking_func(F.col(self.input_col)).alias("block")
            )
            q = q.join(blocks, S.UID)
            join_keys = ["token", "block"]
        pairs = q.join(self.gt_weights, join_keys)
        score = F.sum(F.col("weight") * F.col("gt_weight"))
        if self.score_decimals is not None:
            # Round BEFORE threshold/rank (ref rounds before ranking, SURVEY
            # §4 X15) so summation-order float noise cannot flip the top-k set.
            score = F.round(score, self.score_decimals)
        scores = (
            pairs.groupBy(S.UID, "gt_uid")
            .agg(score.alias("score"))
            .filter(F.col("score") > F.lit(self.lower_bound))
        )
        w = Window.partitionBy(S.UID).orderBy(F.desc("score"), F.desc("gt_uid"))
        return (
            scores.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= self.k)
            .select(
                S.UID,
                "gt_uid",
                F.col("score").cast("double").alias("score"),
                F.col("rank").cast("int").alias("rank"),
            )
        )


class CosSimIndexer:
    """Estimator half: fit(gt) builds the vocabulary + GT inverted index.

    Parameters mirror the reference indexer spec (emm/parameters.py:34-47):
    tokenizer 'words'|'characters', ngram, num_candidates k, cos_sim_lower_bound,
    optional blocking_func.
    """

    def __init__(
        self,
        tokenizer: str = "words",
        ngram: int = 1,
        k: int = 10,
        lower_bound: float = 0.5,
        blocking_func=None,
        binary: bool = True,
        input_col: str = S.PREPROCESSED,
        max_vocab: int | None = 2**25,
        max_df_frac: float | None = None,
        score_decimals: int | None = None,
    ):
        self.tokenizer = tokenizer
        self.ngram = ngram
        self.k = k
        self.lower_bound = lower_bound
        self.blocking_func = blocking_func
        self.binary = binary
        self.input_col = input_col
        self.max_vocab = max_vocab
        self.max_df_frac = max_df_frac
        self.score_decimals = score_decimals

    def fit(self, gt: DataFrame) -> CosSimIndexerModel:
        vec = TfIdfVectorizer(
            input_col=self.input_col,
            analyzer=self.tokenizer,
            ngram=self.ngram,
            binary=self.binary,
            max_vocab=self.max_vocab,
        )
        model = vec.fit(gt, "gt_uid")
        if self.max_df_frac is not None:
            model.vocab = model.vocab.filter(
                F.col("df") <= F.lit(self.max_df_frac * model.n_docs)
            )
        gt_w = model.transform(gt, "gt_uid", out_prefix="gt_")
        if self.blocking_func is not None:
            blocks = gt.select(
                "gt_uid", self.blocking_func(F.col(self.input_col)).alias("block")
            )
            gt_w = gt_w.join(blocks, "gt_uid")
        # GT index is reused by every transform: persist once.
        gt_w = gt_w.persist()
        return CosSimIndexerModel(
            tfidf=model,
            gt_weights=gt_w,
            k=self.k,
            lower_bound=self.lower_bound,
            blocking_func=self.blocking_func,
            input_col=self.input_col,
            score_decimals=self.score_decimals,
        )
