"""Corpus-wide exact line dedup (C4/RefinedWeb-style curation)."""

from entitymatchingmodel_spark.operators.dedup import line_dedup


def test_line_dedup_first_occurrence_wins(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta\ncommon footer\ngamma"),
            (2, "common footer\ndelta"),          # footer seen in doc 1
            (3, "COMMON FOOTER  \nalpha beta"),   # normalized dups of doc 1
            (4, "common footer"),                 # fully duplicate doc
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in line_dedup(docs, "doc_id", "text").collect()}
    assert got[1]["text"] == "alpha beta\ncommon footer\ngamma"
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (3, 3)
    assert got[2]["text"] == "delta" and got[2]["n_kept"] == 1
    assert got[3]["text"] == "" and got[3]["n_kept"] == 0
    assert got[4]["text"] == "" and got[4]["n_kept"] == 0


def test_line_dedup_within_doc_and_order(spark):
    docs = spark.createDataFrame(
        [(1, "x\ny\nx\nz")],  # within-doc duplicate line
        "doc_id long, text string",
    )
    r = line_dedup(docs, "doc_id", "text").collect()[0]
    assert r["text"] == "x\ny\nz" and r["n_lines"] == 4 and r["n_kept"] == 3


def test_line_dedup_no_normalize(spark):
    docs = spark.createDataFrame(
        [(1, "A\na")], "doc_id long, text string"
    )
    r = line_dedup(docs, "doc_id", "text", normalize=False).collect()[0]
    assert r["n_kept"] == 2


def test_line_dedup_metachar_separator(spark):
    """sep must split literally even when it is a regex metacharacter."""
    docs = spark.createDataFrame(
        [(1, "aa|bb|aa"), (2, "bb|cc")], "doc_id long, text string"
    )
    got = {r["id"]: r for r in line_dedup(docs, "doc_id", "text", sep="|").collect()}
    assert got[1]["text"] == "aa|bb" and got[1]["n_lines"] == 3
    assert got[2]["text"] == "cc"
