"""PII scrubbing + benchmark decontamination (training-data pipeline ops)."""

from pyspark.sql import functions as F

from entitymatchingmodel_spark.functions.pii import scrub_documents, scrub_pii
from entitymatchingmodel_spark.operators.decontaminate import (
    benchmark_contamination,
)


def test_scrub_pii_hand_cases(spark):
    cases = [
        ("mail me at jo.doe+x@corp.example.org today",
         "mail me at [EMAIL] today"),
        ("server 192.168.001.1 is down", "server [IP] is down"),
        ("call +31 (0)6 1234 5678 now", "call [PHONE] now"),
        ("card 4111111111111111 expired", "card [NUMBER] expired"),
        ("year 2024 and 2025 stay", "year 2024 and 2025 stay"),
        ("no pii here", "no pii here"),
    ]
    df = spark.createDataFrame(cases, "text string, expected string")
    out = df.select("expected", scrub_pii(F.col("text")).alias("got")).collect()
    for r in out:
        assert r["got"] == r["expected"], r


def test_scrub_documents_counts(spark):
    df = spark.createDataFrame(
        [(1, "a@b.io and c@d.io from 10.0.0.1")], "doc_id long, text string"
    )
    r = scrub_documents(df, "doc_id", "text").collect()[0]
    assert r["n_email"] == 2 and r["n_ipv4"] == 1
    assert r["scrubbed"] == "[EMAIL] and [EMAIL] from [IP]"


def test_contamination_ratio(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # fully leaked
            (2, "completely unrelated words in this sentence here today"),
            (3, "too short"),                                     # no shingles
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in benchmark_contamination(docs, bench, "doc_id", "text", ngram=5).collect()
    }
    assert out[1]["contamination"] == 1.0 and out[1]["n_shingles"] == 5
    assert out[2]["contamination"] == 0.0 and out[2]["n_contaminated"] == 0
    assert out[3]["n_shingles"] == 0 and out[3]["contamination"] == 0.0
