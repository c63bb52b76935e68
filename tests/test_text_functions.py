"""Unit tests for text-analysis functions (functions/text.py)."""

from pyspark.sql import functions as F

from entitymatchingmodel_spark.functions.text import repetition_stats


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b c"),   # 5 tokens, 3 unique; top bigram "a b" x2
            (2, "x"),           # single token: no bigrams
            (3, ""),            # empty
            (4, "w w w w"),     # maximal repetition: "w w" x3 of 4 tokens
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert rows[1]["dup_token_ratio"] == 0.4          # 1 - 3/5
    assert rows[1]["top_bigram_ratio"] == 0.8         # 2*2/5
    assert rows[2]["dup_token_ratio"] == 0.0
    assert rows[2]["top_bigram_ratio"] == 0.0
    assert rows[3]["dup_token_ratio"] == 0.0
    assert rows[3]["top_bigram_ratio"] == 0.0
    assert rows[4]["dup_token_ratio"] == 0.75         # 1 - 1/4
    assert rows[4]["top_bigram_ratio"] == 1.5         # 2*3/4 (overlapping)


def test_bpe_token_count_hand_cases(spark):
    from entitymatchingmodel_spark.functions.text import bpe_token_count
    from pyspark.sql import functions as F

    cases = [
        ("Hello world, it's 2024!", 7),  # Hello/ world/,/ it/'s/ 2024/!
        ("foo", 1),
        ("", 0),
        ("a  b", 3),  # letter run, whitespace run, letter run
    ]
    df = spark.createDataFrame(cases, "text string, expected int")
    out = df.select("expected", bpe_token_count(F.col("text")).alias("got")).collect()
    for r in out:
        assert r["got"] == r["expected"], r
