"""QualityClassifier (fastText-style target-vs-crawl filter) + the
deterministic Pareto threshold rule."""

import hashlib
import math

import pytest

from tests.conftest import *  # noqa: F401,F403  (spark fixture)

GOOD = [
    "the quiet library held many careful essays about science and history",
    "a thoughtful article explained the evidence with clear careful prose",
    "the museum catalog described each painting with notes and sources",
]
BAD = [
    "click here buy now cheap deals win prize free free free",
    "xxx hot singles click banner now cheap pills casino jackpot",
    "buy cheap now win now free spins casino bonus click click",
]


def _corpora(spark, n_t=60, n_r=120):
    t = spark.createDataFrame(
        [(i, GOOD[i % 3] + f" variant {i}") for i in range(n_t)],
        "doc_id long, text string",
    )
    r = spark.createDataFrame(
        [(1000 + i, BAD[i % 3] + f" variant {i}") for i in range(n_r)],
        "doc_id long, text string",
    )
    return t, r


def test_quality_clf_separates_and_roundtrips(spark, tmp_path):
    from entitymatchingmodel_spark.operators.quality_clf import (
        QualityClassifier,
    )

    target, raw = _corpora(spark)
    clf = QualityClassifier.fit(
        target, raw, "doc_id", "text", n_features=4096, max_iter=30
    )
    both = target.unionByName(raw)
    scored = {r["doc_id"]: r["quality_prob"]
              for r in clf.score(both, "doc_id", "text").collect()}
    t_scores = [v for k, v in scored.items() if k < 1000]
    r_scores = [v for k, v in scored.items() if k >= 1000]
    assert min(t_scores) > 0.8, min(t_scores)
    assert max(r_scores) < 0.2, max(r_scores)
    # schema: input columns + quality_prob, ML internals dropped
    out_cols = clf.score(both, "doc_id", "text").columns
    assert out_cols == ["doc_id", "text", "quality_prob"]

    # save/load scores byte-identical
    clf.save(spark, str(tmp_path / "m"))
    clf2 = QualityClassifier.load(spark, str(tmp_path / "m"))
    scored2 = {r["doc_id"]: r["quality_prob"]
               for r in clf2.score(both, "doc_id", "text").collect()}
    assert scored == scored2


def test_quality_clf_gramless_and_null_docs_keep_rows(spark):
    from entitymatchingmodel_spark.operators.quality_clf import (
        QualityClassifier,
    )

    target, raw = _corpora(spark, n_t=20, n_r=20)
    clf = QualityClassifier.fit(
        target, raw, "doc_id", "text", n_features=1024, max_iter=10
    )
    odd = spark.createDataFrame(
        [(1, None), (2, ""), (3, "!!! ???")], "doc_id long, text string"
    )
    got = clf.score(odd, "doc_id", "text").collect()
    assert len(got) == 3
    assert all(r["quality_prob"] is not None for r in got)


def test_gram_array_is_per_row_even_with_duplicate_ids(spark):
    """The featurizer must key on NOTHING: rows sharing an id (the
    target-overlaps-raw fit framing, or plain dirty data) get exactly
    their OWN text's grams — an id-keyed rollup would merge/double
    them across rows."""
    from entitymatchingmodel_spark.operators.quality_clf import _gram_array

    df = spark.createDataFrame(
        [(1, "alpha beta"), (1, "alpha beta"), (1, "gamma delta epsilon")],
        "doc_id long, text string",
    )
    got = [sorted(r["_grams"])
           for r in _gram_array(df, "doc_id", "text").collect()]
    assert sorted(map(tuple, got)) == sorted([
        ("alpha", "alpha beta", "beta"),
        ("alpha", "alpha beta", "beta"),
        ("delta", "delta epsilon", "epsilon", "gamma", "gamma delta"),
    ])
    with pytest.raises(ValueError, match="id column"):
        _gram_array(df, "nope", "text")


def test_quality_clf_fit_with_target_subset_of_raw(spark):
    """The GPT-3 framing: target is a SLICE of raw, ids overlap.  The
    fitted model must be identical to fitting against the same raw rows
    under disjoint ids — overlapping ids must not inflate the feature
    vectors of the shared docs (the r9 id-keyed rollup doubled them)."""
    from entitymatchingmodel_spark.operators.quality_clf import (
        QualityClassifier,
    )

    target, junk = _corpora(spark, n_t=30, n_r=60)
    raw = target.unionByName(junk)  # target ⊆ raw, same doc_ids
    raw_disjoint = target.withColumn(
        "doc_id", target["doc_id"] + 100000
    ).unionByName(junk)

    kw = dict(n_features=2048, max_iter=15, max_raw_ratio=100.0)
    clf_overlap = QualityClassifier.fit(target, raw, "doc_id", "text", **kw)
    clf_disjoint = QualityClassifier.fit(
        target, raw_disjoint, "doc_id", "text", **kw
    )
    import numpy as np

    a = clf_overlap.model.coefficients.toArray()
    b = clf_disjoint.model.coefficients.toArray()
    assert np.allclose(a, b, rtol=1e-9, atol=1e-12)
    assert abs(clf_overlap.model.intercept - clf_disjoint.model.intercept) < 1e-9
    # and the overlap-fit model still separates
    scored = {r["doc_id"]: r["quality_prob"]
              for r in clf_overlap.score(junk, "doc_id", "text").collect()}
    assert max(scored.values()) < 0.5


def test_pareto_keep_matches_hashlib_mirror(spark):
    from entitymatchingmodel_spark.operators.quality_clf import pareto_keep

    rows = [(i, round(i / 99.0, 6)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, quality_prob double")
    kept = {r["doc_id"] for r in pareto_keep(df, "doc_id", alpha=9.0).collect()}

    def mirror(i, score, alpha=9.0, salt="pareto"):
        # the micro-unit quantized rule pareto_keep pins (round-half-up
        # on both sides, matching Spark's F.round / DuckDB's round)
        h = hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:7]
        u = int(h, 16) / float(1 << 28)
        x = (1.0 - u) ** (-1.0 / alpha) - 1.0
        thr_micro = math.floor((1.0 - x) * 1e6 + 0.5)
        return math.floor(score * 1e6 + 0.5) > thr_micro

    expect = {i for i, s in rows if mirror(i, s)}
    assert kept == expect
    # soft cliff, witnessed on a designed low scorer: alpha=1 makes the
    # noise heavy-tailed enough that a 0.2-scorer sometimes survives
    low = spark.createDataFrame(
        [(i, 0.2) for i in range(200)], "doc_id long, quality_prob double"
    )
    n_low = pareto_keep(low, "doc_id", alpha=1.0).count()
    # P(keep) = P(x > 0.8) = 1/1.8 ~ 0.56 under Pareto(1); the hash draw
    # is deterministic, so this count is a constant, not a flake
    assert 60 < n_low < 160, n_low
    # hard floor under the default alpha: perfect scores always survive
    assert all(i in kept for i, s in rows if s > 0.999)


def test_pareto_threshold_margin_on_contract_corpora():
    """The documented boundary-separation argument for the micro-unit
    quantized pareto predicate: engines can only disagree if their
    libm pow results straddle a 0.5-micro-unit rounding boundary.
    Measure the ACTUAL distance of every threshold in the contract
    corpora (sf0.001 + sf0.01 doc_ids — the driver's oracle inputs) to
    the nearest boundary: the minimum is >= 1e-3 micro-units, ~1e6 x
    pow's worst-case cross-engine error (a few ulp of a ~1e0 value,
    ~1e-10 micro-units)."""
    import pyarrow.parquet as pq

    alpha = 9.0
    min_gap = 1.0
    for sf in ("sf0.001", "sf0.01"):
        ids = pq.read_table(
            f"/root/testdata/{sf}/documents.parquet", columns=["doc_id"]
        ).column("doc_id").to_pylist()
        assert ids
        for i in ids:
            h = hashlib.md5(f"pareto|{i}".encode()).hexdigest()[:7]
            u = int(h, 16) / float(1 << 28)
            thr_micro = (1.0 - ((1.0 - u) ** (-1.0 / alpha) - 1.0)) * 1e6
            gap = abs((thr_micro - math.floor(thr_micro)) - 0.5)
            min_gap = min(min_gap, gap)
    assert min_gap >= 1e-3, min_gap


def test_pareto_keep_null_scores_drop_and_validation(spark):
    from entitymatchingmodel_spark.operators.quality_clf import pareto_keep

    df = spark.createDataFrame(
        [(1, None), (2, 1.0)], "doc_id long, quality_prob double"
    )
    got = {r["doc_id"] for r in pareto_keep(df, "doc_id").collect()}
    assert got == {2}
    with pytest.raises(ValueError, match="alpha"):
        pareto_keep(df, "doc_id", alpha=0.0)


def test_quality_clf_validation(spark):
    from entitymatchingmodel_spark.operators.quality_clf import (
        QualityClassifier,
    )

    target, raw = _corpora(spark, n_t=5, n_r=5)
    with pytest.raises(ValueError, match="n_features"):
        QualityClassifier.fit(target, raw, "doc_id", "text", n_features=1)
    with pytest.raises(ValueError, match="max_raw_ratio"):
        QualityClassifier.fit(target, raw, "doc_id", "text", max_raw_ratio=0)
    with pytest.raises(ValueError, match="empty"):
        QualityClassifier.fit(
            target.filter("doc_id < 0"), raw, "doc_id", "text"
        )
    clf = QualityClassifier.fit(
        target, raw, "doc_id", "text", n_features=256, max_iter=5
    )
    with pytest.raises(ValueError, match="rename"):
        clf.score(
            target.withColumn("quality_prob", target["doc_id"] * 1.0),
            "doc_id", "text",
        )
