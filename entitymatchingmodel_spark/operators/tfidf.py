"""Normalized TF-IDF in long (inverted-index) form.

Reference: emm/indexing/spark_normalized_tfidf.py — CountVectorizer + IDF into a
SparseVector column, with a custom L2 normalization that penalizes
out-of-vocabulary tokens: ``norm = sqrt(sum(w_i^2) + n_oov * max_idf^2)``
(spark_normalized_tfidf.py:53-76, 129-174).

Spark-first redesign: no VectorUDT, no vocabulary collected to the driver.
The vocabulary IS a DataFrame ``(token, idf)`` and a document's vector IS a set
of rows ``(uid, token, weight)``.  Everything — fit, transform, and the cosine
join that consumes it — is then plain joins/aggregations that Catalyst plans,
broadcast when small, shuffle-hash when not.  This removes the reference's two
scale cliffs: the driver-side GT matrix collect (spark_indexing_utils.py:51-100)
and the multi-GB manual broadcast (spark_cos_sim_matcher.py:716-719).

IDF convention matches Spark MLlib's: ``idf = ln((N+1)/(df+1))`` (the reference
aligns its pandas twin to this, pandas_normalized_tfidf.py:83-97).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from entitymatchingmodel_spark.functions import tokenize as T

TOKENIZERS = {
    "words": lambda c, n: T.word_ngrams(c, n),
    "characters": lambda c, n: T.char_ngrams(c, n),
}


def tokens_col(c: Column, analyzer: str = "words", ngram: int = 1) -> Column:
    return TOKENIZERS[analyzer](c, ngram)


@dataclass
class TfIdfModel:
    """Fitted vocabulary: DataFrame (token, df, idf) + corpus stats."""

    vocab: DataFrame  # (token string, df long, idf double)
    n_docs: int
    max_idf: float
    analyzer: str
    ngram: int
    binary: bool
    input_col: str

    def transform(self, df: DataFrame, id_col: str, out_prefix: str = "") -> DataFrame:
        """Docs -> L2-normalized token weights: (id_col, token, weight).

        OOV tokens contribute ``max_idf`` to the norm but produce no output
        rows (they can never match the fitted corpus), reproducing the
        reference's OOV penalty exactly.
        """
        toks = tokens_col(F.col(self.input_col), self.analyzer, self.ngram)
        # explode_outer + null-filter (not inner explode): avoids the
        # inferred size>0 filter whose pushdown tokenizes every row twice.
        if self.binary:
            exploded = (
                df.select(id_col, F.explode_outer(T.distinct_tokens(toks)).alias("token"))
                .filter(F.col("token").isNotNull())
                .withColumn("tf", F.lit(1.0))
            )
        else:
            exploded = (
                df.select(id_col, F.explode_outer(toks).alias("token"))
                .filter(F.col("token").isNotNull())
                .groupBy(id_col, "token")
                .agg(F.count("*").cast("double").alias("tf"))
            )
        # Left join vocab: null idf marks OOV. Vocab is typically small
        # relative to the corpus — Catalyst/AQE broadcast it when it fits.
        weighted = exploded.join(self.vocab.select("token", "idf"), "token", "left")
        w = F.col("tf") * F.coalesce(F.col("idf"), F.lit(float(self.max_idf)))
        weighted = weighted.withColumn("w", w)
        # Single shuffle on id_col: compute norm per doc, then normalize rows.
        norms = weighted.groupBy(id_col).agg(
            F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("_norm")
        )
        out = (
            weighted.filter(F.col("idf").isNotNull())
            # A zero norm is reachable on real data: a name whose every
            # token appears in ALL GT docs has idf 0 across the board
            # (ln((N+1)/(N+1))) and no OOV contribution — its vector is
            # exactly zero.  Under Spark 4 ANSI a bare w/_norm would THROW
            # DIVIDE_BY_ZERO on that one name and kill the job; dropping
            # the rows matches the all-OOV case (no representation, no
            # candidates) and what a lenient-division engine effectively
            # does (NULL weights that no cosine threshold passes).
            .join(norms.filter(F.col("_norm") > 0), id_col)
            .select(
                id_col,
                "token",
                (F.col("w") / F.col("_norm")).cast("double").alias(out_prefix + "weight"),
            )
        )
        return out


class TfIdfVectorizer:
    """Estimator: fit(corpus) -> TfIdfModel.

    binary=True matches the reference default (CountVectorizer(binary=True),
    parameters.py:82-84).
    """

    def __init__(
        self,
        input_col: str = "preprocessed",
        analyzer: str = "words",
        ngram: int = 1,
        binary: bool = True,
        min_df: int = 1,
        max_vocab: int | None = None,
    ):
        self.input_col = input_col
        self.analyzer = analyzer
        self.ngram = ngram
        self.binary = binary
        self.min_df = min_df
        self.max_vocab = max_vocab

    def fit(self, corpus: DataFrame, id_col: str) -> TfIdfModel:
        n_docs = corpus.count()
        toks = tokens_col(F.col(self.input_col), self.analyzer, self.ngram)
        df_counts = (
            corpus.select(id_col, F.explode_outer(T.distinct_tokens(toks)).alias("token"))
            .filter(F.col("token").isNotNull())
            .groupBy("token")
            .agg(F.count("*").alias("df"))
        )
        if self.min_df > 1:
            df_counts = df_counts.filter(F.col("df") >= self.min_df)
        if self.max_vocab:
            # vocabSize cap (ref parameters.py:82-84): keep most-frequent tokens.
            from pyspark.sql import Window

            wnd = Window.orderBy(F.desc("df"), "token")
            df_counts = (
                df_counts.withColumn("_r", F.row_number().over(wnd))
                .filter(F.col("_r") <= self.max_vocab)
                .drop("_r")
            )
        vocab = df_counts.withColumn(
            "idf", F.log((F.lit(float(n_docs + 1))) / (F.col("df") + F.lit(1.0)))
        )
        # max_idf = idf of an unseen token = ln((N+1)/1); the reference uses the
        # max over the fitted vocab — for df>=1 vocab max is ln((N+1)/2); OOV
        # penalty in the reference uses max(idf) of the vocabulary.
        row = vocab.agg(F.max("idf").alias("m")).collect()[0]
        max_idf = float(row["m"]) if row["m"] is not None else 0.0
        vocab = vocab.persist()
        return TfIdfModel(
            vocab=vocab,
            n_docs=n_docs,
            max_idf=max_idf,
            analyzer=self.analyzer,
            ngram=self.ngram,
            binary=self.binary,
            input_col=self.input_col,
        )
