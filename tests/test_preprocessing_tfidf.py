"""Preprocessing pipeline variants and TF-IDF OOV-penalty semantics."""

import math

import pytest
from pyspark.sql import functions as F

from entitymatchingmodel_spark.functions.preprocessing import PIPELINES, apply_pipeline
from entitymatchingmodel_spark.operators.cossim_indexer import CosSimIndexer, first_char_block
from entitymatchingmodel_spark.operators.tfidf import TfIdfVectorizer


def _run(spark, pipeline, names):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    return [r["out"] for r in df.select(apply_pipeline(F.col("name"), pipeline).alias("out")).collect()]


def test_preprocess_name_basic(spark):
    out = _run(spark, "preprocess_name", ["  Ätna-Café  GmbH!", "A\nB"])
    assert out[0] == "atna cafe gmbh"
    assert out[1] == "a b"


def test_preprocess_merge_abbr_default(spark):
    out = _run(spark, "preprocess_merge_abbr", [
        "Tzu Sun B.V.", "H & M Stores", "Stichting Pensioenfonds", "Public Limited Co X",
    ])
    assert out[0] == "tzu sun bv"          # B.V. -> bv
    assert out[1] == "hm stores"           # H & M -> HM
    assert out[2] == "stg pensioenfonds"   # shorthand mapping
    assert out[3] == "plc x"               # public limited co -> plc


def test_preprocess_merge_legal_abbr_only_legal(spark):
    out = _run(spark, "preprocess_merge_legal_abbr", ["Tzu Sun B. V.", "A. B. C. Consulting"])
    assert out[0] == "tzu sun bv"
    # 'abc' is not a legal form -> letters must NOT be merged
    assert "abc" not in out[1]


def test_all_pipelines_null_safe(spark):
    df = spark.createDataFrame([(None,)], "name string")
    for name in PIPELINES:
        val = df.select(apply_pipeline(F.col("name"), name).alias("o")).collect()[0]["o"]
        assert val == "", name


def test_tfidf_oov_penalty(spark):
    """OOV tokens add max_idf^2 to the norm but emit no rows (ref
    spark_normalized_tfidf.py:129-174 semantics)."""
    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma"), (3, "alpha delta")],
        "id long, preprocessed string",
    )
    model = TfIdfVectorizer(analyzer="words", ngram=1).fit(corpus, "id")
    test = spark.createDataFrame([(9, "beta zzz")], "id long, preprocessed string")
    rows = model.transform(test, "id").collect()
    # zzz is OOV: no output row, but it inflates the norm of beta's weight
    assert len(rows) == 1 and rows[0]["token"] == "beta"
    idf_beta = math.log(4 / 2)
    expected = idf_beta / math.sqrt(idf_beta**2 + model.max_idf**2)
    assert abs(rows[0]["weight"] - expected) < 1e-12


def test_cossim_blocking_restricts_pairs(spark):
    gt = spark.createDataFrame(
        [(1, "alpha corp"), (2, "beta corp"), (3, "gamma inc")],
        "id long, name string",
    ).select(F.col("id").alias("gt_uid"), F.col("name").alias("preprocessed"))
    names = spark.createDataFrame(
        [(10, "alpha corp x")], "uid long, preprocessed string"
    )
    plain = CosSimIndexer(tokenizer="words", ngram=1, k=5, lower_bound=0.01).fit(gt)
    blocked = CosSimIndexer(
        tokenizer="words", ngram=1, k=5, lower_bound=0.01,
        blocking_func=first_char_block,
    ).fit(gt)
    p = {(r["uid"], r["gt_uid"]) for r in plain.transform(names).collect()}
    b = {(r["uid"], r["gt_uid"]) for r in blocked.transform(names).collect()}
    # 'corp' token links alpha->beta without blocking; first-char blocking
    # ('a' vs 'b') must prune the beta pair
    assert (10, 2) in p
    assert (10, 2) not in b
    assert (10, 1) in b


def test_tfidf_zero_norm_name_does_not_crash(spark):
    """A name whose every token appears in ALL GT docs has a zero TF-IDF
    vector (idf 0 everywhere, no OOV term) — under ANSI mode a bare
    w/norm would throw DIVIDE_BY_ZERO on that single name and kill the
    corpus job.  Such names drop their token rows (no representation),
    everything else is unaffected."""
    from pyspark.sql import functions as F

    from entitymatchingmodel_spark.operators.tfidf import TfIdfVectorizer

    gt = spark.createDataFrame(
        [("inc alpha",), ("inc beta",), ("inc gamma",), ("inc",)],
        "preprocessed string",
    ).withColumn("uid", F.monotonically_increasing_id())
    v = TfIdfVectorizer(analyzer="words", ngram=1).fit(gt, "uid")
    out = v.transform(gt, "uid").collect()
    reps = {r["uid"] for r in out}
    # 'inc' is in all 4 docs -> idf 0 -> the bare 'inc' name has a zero
    # vector and no rows; the other three keep their discriminative tokens
    assert len(reps) == 3
    # surviving rows all carry finite weights (the zero-idf 'inc' token may
    # appear with weight 0.0 inside nonzero-norm names — harmless)
    assert all(r["weight"] is not None and r["weight"] == r["weight"] for r in out)
