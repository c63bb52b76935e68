"""Unit tests for DSIR importance weighting (functions/selection.py)."""

import hashlib
import math

import pytest

from entitymatchingmodel_spark.functions.selection import (
    MICRO,
    dsir_bucket_logratios,
    dsir_scores,
    dsir_scores_rowwise,
)


def _bucket(gram: str, n_buckets: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % n_buckets


def _expected_scores(target, raw, n_buckets, alpha):
    """Driver-side mirror of the whole DSIR pipeline (python md5 + integer
    micro-units) — the exactness witness for the Spark plan."""

    def grams(text):
        toks = [t for t in "".join(
            ch if ch.isalnum() else " " for ch in text.lower()
        ).split() if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def counts(docs):
        c = {}
        for _, text in docs:
            for g in grams(text):
                b = _bucket(g, n_buckets)
                c[b] = c.get(b, 0) + 1
        return c

    ct, cr = counts(target), counts(raw)
    tt, tr = sum(ct.values()), sum(cr.values())
    aB = alpha * n_buckets

    def lr_micro(b):
        lr = math.log((ct.get(b, 0) + alpha) / (tt + aB)) - math.log(
            (cr.get(b, 0) + alpha) / (tr + aB)
        )
        return round(lr * MICRO)

    out = {}
    for doc_id, text in raw:
        gs = grams(text)
        s = sum(lr_micro(_bucket(g, n_buckets)) for g in gs)
        out[doc_id] = (len(gs), round(s / MICRO, 6) if gs else None)
    return out


@pytest.fixture(scope="module")
def corpora(spark):
    target = [(101, "clean curated text about science and method")]
    raw = [
        (1, "clean curated text about science and method"),  # == target
        (2, "spam spam click here buy now"),                  # disjoint
        (3, "science method text"),                           # partial
        (4, ""),                                              # zero grams
        (5, None),                                            # null text
    ]
    t = spark.createDataFrame(target, "doc_id long, text string")
    r = spark.createDataFrame(raw, "doc_id long, text string")
    return t, r, target, raw


def test_scores_match_python_mirror_exactly(corpora):
    t, r, target, raw = corpora
    B, A = 64, 1.0
    ratios = dsir_bucket_logratios(t, r, "doc_id", "text", n_buckets=B, alpha=A)
    got = {
        row["doc_id"]: (row["n_grams"], row["dsir_logratio"])
        for row in dsir_scores(r, ratios, "doc_id", "text", n_buckets=B).collect()
    }
    want = _expected_scores(target, [(i, x or "") for i, x in raw], B, A)
    assert got == want


def test_target_like_scores_above_disjoint(corpora):
    t, r, *_ = corpora
    ratios = dsir_bucket_logratios(t, r, "doc_id", "text", n_buckets=256)
    s = {
        row["doc_id"]: row["dsir_logratio"]
        for row in dsir_scores(r, ratios, "doc_id", "text", n_buckets=256).collect()
    }
    # the doc IDENTICAL to the target must beat the disjoint spam doc,
    # and so must the partial-overlap doc (target-seen grams score
    # positive log-ratios; spam grams all score negative)
    assert s[1] > s[2]
    assert s[3] > s[2]
    assert s[4] is None and s[5] is None


def test_zero_gram_rows_survive_with_zero_counts(corpora):
    t, r, *_ = corpora
    ratios = dsir_bucket_logratios(t, r, "doc_id", "text", n_buckets=64)
    rows = {
        row["doc_id"]: row["n_grams"]
        for row in dsir_scores(r, ratios, "doc_id", "text", n_buckets=64).collect()
    }
    assert rows[4] == 0 and rows[5] == 0
    assert len(rows) == 5


def test_ratio_table_bounded_by_buckets(corpora):
    t, r, *_ = corpora
    ratios = dsir_bucket_logratios(t, r, "doc_id", "text", n_buckets=8)
    assert ratios.count() <= 8
    cols = set(ratios.columns)
    assert cols == {"bucket", "lr_micro", "lr_default_micro", "n_buckets"}
    # the fit stamps its modulus; scoring with a contradicting value raises
    with pytest.raises(ValueError, match="does not match"):
        dsir_scores(r, ratios, "doc_id", "text", n_buckets=16)


def test_validation(corpora):
    t, r, *_ = corpora
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_bucket_logratios(t, r, "doc_id", "text", n_buckets=1)
    with pytest.raises(ValueError, match="alpha"):
        dsir_bucket_logratios(t, r, "doc_id", "text", alpha=0.0)


def test_rowwise_matches_batch_exactly(spark):
    """dsir_scores_rowwise (the streaming shape: python md5 + integer
    micro-units in a mapInPandas projection) must equal the batch
    scorer's output exactly on the real documents table."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ratios = dsir_bucket_logratios(
        docs.where("lang = 'en'"), docs, "doc_id", "text", n_buckets=512
    )
    batch = {
        r["doc_id"]: (r["n_grams"], r["dsir_logratio"])
        for r in dsir_scores(docs, ratios, "doc_id", "text",
                             n_buckets=512).collect()
    }
    rowwise = {
        r["doc_id"]: (r["n_grams"], r["dsir_logratio"])
        for r in dsir_scores_rowwise(docs, ratios, "text",
                                     n_buckets=512).collect()
    }
    assert rowwise == batch


def test_rowwise_column_clash_fails_fast(spark):
    df = spark.createDataFrame([(1, "x", 0.5)],
                               "doc_id long, text string, dsir_logratio double")
    t = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    ratios = dsir_bucket_logratios(t, t, "doc_id", "text", n_buckets=8)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="adds columns"):
        dsir_scores_rowwise(df, ratios, "text", n_buckets=8)


def test_dsir_resample_matches_python_mirror(spark):
    """Gumbel-top-k selection must be exactly reproducible from the
    hashlib mirror of the md5 uniform (same salt, same clamp, same key
    formula) — the engine-portability witness."""
    import math

    from entitymatchingmodel_spark.functions.selection import dsir_resample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ratios = dsir_bucket_logratios(
        docs.where("lang = 'en'"), docs, "doc_id", "text", n_buckets=256
    )
    scores = dsir_scores(docs, ratios, "doc_id", "text", n_buckets=256)
    K, T, SEED = 25, 2.0, 7
    got = sorted(r["doc_id"] for r in
                 dsir_resample(scores, "doc_id", K, temperature=T,
                               seed=SEED).collect())

    def unit_hash(doc_id):
        h = int(hashlib.md5(f"dsir{SEED}|{doc_id}".encode()).hexdigest()[:7], 16)
        return h / float(1 << 28)

    rows = scores.collect()
    keyed = []
    for r in rows:
        if r["dsir_logratio"] is None:
            continue
        u = max(unit_hash(r["doc_id"]), 1e-12)
        keyed.append((r["dsir_logratio"] / T - math.log(-math.log(u)),
                      -r["doc_id"]))
    want = sorted(-d for _, d in sorted(keyed, reverse=True)[:K])
    assert got == want


def test_dsir_resample_validation_and_determinism(spark):
    from entitymatchingmodel_spark.functions.selection import dsir_resample

    df = spark.createDataFrame(
        [(1, 0.5), (2, -1.0), (3, None)], "doc_id long, dsir_logratio double"
    )
    with pytest.raises(ValueError, match="k must"):
        dsir_resample(df, "doc_id", 0)
    with pytest.raises(ValueError, match="temperature"):
        dsir_resample(df, "doc_id", 1, temperature=0.0)
    a = sorted(r["doc_id"] for r in dsir_resample(df, "doc_id", 2).collect())
    b = sorted(r["doc_id"] for r in dsir_resample(df, "doc_id", 2).collect())
    assert a == b and 3 not in a and len(a) == 2


def test_rowwise_rejects_oversized_ratio_table(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    big = spark.range(100).select(
        F.col("id").alias("bucket"),
        F.lit(0).cast("long").alias("lr_micro"),
        F.lit(0).cast("long").alias("lr_default_micro"),
    )
    with pytest.raises(ValueError, match="more than n_buckets"):
        dsir_scores_rowwise(df, big, "text", n_buckets=8)


# ---------------------------------------------------------------------------
# group_reputation + reputation_filter
# ---------------------------------------------------------------------------

def _rep_fixture(spark):
    # good: mean 0.8 (n=3); edge: mean exactly 0.5 (n=2); bad: mean 0.2
    # (n=2); tiny: mean 1.0 but n=1; nullg: NULL group
    rows = [
        (1, "good", 0.9), (2, "good", 0.8), (3, "good", 0.7),
        (4, "edge", 0.6), (5, "edge", 0.4),
        (6, "bad", 0.3), (7, "bad", 0.1),
        (8, "tiny", 1.0),
        (9, None, 1.0),
    ]
    return spark.createDataFrame(rows, "doc_id long, grp string, score double")


def test_group_reputation_integer_micro_sums(spark):
    from entitymatchingmodel_spark.functions.selection import group_reputation

    rep = {r["grp"]: (r["grp_score_micro"], r["grp_docs"])
           for r in group_reputation(_rep_fixture(spark), "grp", "score").collect()}
    assert rep["good"] == (2_400_000, 3)
    assert rep["edge"] == (1_000_000, 2)
    assert rep["bad"] == (400_000, 2)
    assert rep["tiny"] == (1_000_000, 1)
    assert rep[None] == (1_000_000, 1)


def test_reputation_filter_threshold_and_min_docs(spark):
    from entitymatchingmodel_spark.functions.selection import reputation_filter

    df = _rep_fixture(spark)
    # boundary group "edge" (mean exactly 0.5) must be KEPT (>=), tiny
    # (n=1 < min_docs) and the NULL group must be dropped
    got = sorted(r["doc_id"] for r in
                 reputation_filter(df, "grp", "score", 0.5, min_docs=2).collect())
    assert got == [1, 2, 3, 4, 5]
    # schema passes through untouched
    assert reputation_filter(df, "grp", "score", 0.5, min_docs=2).columns == df.columns
    # raising the bar drops the edge group
    got = sorted(r["doc_id"] for r in
                 reputation_filter(df, "grp", "score", 0.500001, min_docs=2).collect())
    assert got == [1, 2, 3]
    # min_docs=1 admits the tiny group
    got = sorted(r["doc_id"] for r in
                 reputation_filter(df, "grp", "score", 0.5, min_docs=1).collect())
    assert got == [1, 2, 3, 4, 5, 8]


def test_reputation_filter_historical_evidence(spark):
    """Score the current batch against a reputation built on a PAST
    snapshot — the incremental posture (domains keep their record)."""
    from entitymatchingmodel_spark.functions.selection import (
        group_reputation,
        reputation_filter,
    )

    history = _rep_fixture(spark)
    rep = group_reputation(history, "grp", "score")
    batch = spark.createDataFrame(
        [(100, "good", 0.0), (101, "bad", 1.0), (102, "new", 0.9)],
        "doc_id long, grp string, score double",
    )
    # decisions come from HISTORY: good passes despite a 0.0 batch score,
    # bad fails despite a 1.0, unknown group "new" has no record -> drop
    got = sorted(r["doc_id"] for r in
                 reputation_filter(batch, "grp", "score", 0.5,
                                   reputation=rep).collect())
    assert got == [100]


def test_reputation_filter_null_scores_count_docs_not_evidence(spark):
    from entitymatchingmodel_spark.functions.selection import group_reputation

    df = spark.createDataFrame(
        [(1, "g", 0.9), (2, "g", None)], "doc_id long, grp string, score double"
    )
    rep = group_reputation(df, "grp", "score").collect()[0]
    assert (rep["grp_score_micro"], rep["grp_docs"]) == (900_000, 2)


def test_reputation_filter_validation(spark):
    import pytest

    from entitymatchingmodel_spark.functions.selection import reputation_filter

    df = _rep_fixture(spark)
    with pytest.raises(ValueError, match="min_docs"):
        reputation_filter(df, "grp", "score", 0.5, min_docs=0)
    with pytest.raises(ValueError, match="group_reputation"):
        reputation_filter(df, "grp", "score", 0.5,
                          reputation=df.select("grp"))
