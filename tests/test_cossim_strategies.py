"""The two cosine-join physical strategies must produce identical results."""

import pytest
from pyspark.sql import functions as F

from entitymatchingmodel_spark.operators.cossim_indexer import (
    CosSimIndexer,
    first_char_block,
)


@pytest.fixture(scope="module")
def data(spark):
    gt = spark.createDataFrame(
        [(i, n) for i, n in enumerate(
            ["apple inc", "apple computer inc", "microsoft corp", "micro systems",
             "netflix nv", "net services bv", "amazon ltd", "amazon web services"])],
        "gt_uid long, preprocessed string",
    )
    names = spark.createDataFrame(
        [(100, "apple incorporated"), (101, "microsoft"), (102, "amazon services"),
         (103, "zzz unknown tokens")],
        "uid long, preprocessed string",
    )
    return gt, names


def _collect(model, names):
    return sorted(
        (r["uid"], r["gt_uid"], round(r["score"], 9), r["rank"])
        for r in model.transform(names).collect()
    )


def test_strategies_identical(spark, data):
    gt, names = data
    kw = dict(tokenizer="words", ngram=1, k=3, lower_bound=0.05, score_decimals=6)
    inv = CosSimIndexer(strategy="inverted", **kw).fit(gt)
    bc = CosSimIndexer(strategy="broadcast", **kw).fit(gt)
    a, b = _collect(inv, names), _collect(bc, names)
    assert a == b
    assert a  # non-empty


def test_strategies_identical_char_ngrams(spark, data):
    gt, names = data
    kw = dict(tokenizer="characters", ngram=2, k=2, lower_bound=0.1, score_decimals=6)
    inv = CosSimIndexer(strategy="inverted", **kw).fit(gt)
    bc = CosSimIndexer(strategy="broadcast", **kw).fit(gt)
    assert _collect(inv, names) == _collect(bc, names)


def test_broadcast_rejects_blocking(spark, data):
    gt, names = data
    m = CosSimIndexer(strategy="broadcast", blocking_func=first_char_block).fit(gt)
    with pytest.raises(ValueError, match="inverted"):
        m.transform(names)


def test_invalid_strategy(spark):
    with pytest.raises(ValueError, match="strategy"):
        CosSimIndexer(strategy="magic")


def test_lsh_subset_of_inverted_with_exact_scores(spark, data):
    """The lsh strategy returns EXACT cosine scores on a candidate SUBSET:
    every (uid, gt_uid) it emits must appear in the exhaustive inverted
    output with the identical score, and identical-token-set pairs (all
    bands shared) are guaranteed candidates, so a name equal to a GT name
    must keep its rank-1 score-1 match."""
    gt, names = data
    kw = dict(tokenizer="words", ngram=1, k=3, lower_bound=0.05, score_decimals=6)
    inv = CosSimIndexer(strategy="inverted", **kw).fit(gt)
    lsh = CosSimIndexer(strategy="lsh", **kw).fit(gt)

    inv_scores = {(u, g): s for u, g, s, _ in _collect(inv, names)}
    got = _collect(lsh, names)
    assert got  # non-empty
    for u, g, s, _ in got:
        assert (u, g) in inv_scores, (u, g)
        assert s == inv_scores[(u, g)], (u, g)

    # exact-name probe: identical token set => identical signature =>
    # every band collides => candidate guaranteed; exact rescore gives 1.0
    exact = spark.createDataFrame([(200, "microsoft corp")],
                                  "uid long, preprocessed string")
    top = lsh.transform(exact).filter(F.col("rank") == 1).collect()
    assert len(top) == 1 and top[0]["gt_uid"] == 2 and top[0]["score"] == 1.0
    inv.unpersist(); lsh.unpersist()


def test_lsh_transform_cache_does_not_grow(spark, data):
    """Fit-once/transform-many on one 'lsh' model must NOT accumulate
    cached names-side frames: the model rotates a single names-cache slot
    (plus the static GT bands), so the JVM storage-block count after
    transform N equals the count after transform 1 (round-7 review: the
    old append-only list leaked one persisted frame per batch)."""
    gt, names = data
    kw = dict(tokenizer="words", ngram=1, k=3, lower_bound=0.05, score_decimals=6)
    spark.catalog.clearCache()

    def cached_ids():
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().keySet().iterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    # The persistent-RDD table is JVM-GLOBAL and earlier tests' async
    # unpersist() calls (DataFrame.unpersist defaults to non-blocking) can
    # remove THEIR entries between our two measurements — so count only the
    # ids this model created (RDD ids are monotonic; anything not in the
    # pre-fit baseline is ours).
    baseline = cached_ids()
    m = CosSimIndexer(strategy="lsh", **kw).fit(gt)

    def ours():
        return cached_ids() - baseline

    m.transform(names).count()
    after_first = ours()
    for _ in range(3):
        m.transform(names).count()
    # rotation may REPLACE the slot (new id, old id dropped) but must not
    # accumulate: the live set our model holds never grows
    assert len(ours()) <= len(after_first)
    m.unpersist()
    # unpersist() releases the rotating slot and the GT bands too
    baseline2 = cached_ids()
    m2 = CosSimIndexer(strategy="lsh", **kw).fit(gt)
    m2.transform(names).count()
    before = cached_ids() - baseline2
    assert before
    m2.unpersist()
    assert len(cached_ids() - baseline2) < len(before)


def test_lsh_params_fail_fast(spark):
    """bands * rows_per_band > num_hashes is an impossible banding layout
    and must raise at CONSTRUCTION, not as an unresolved-column error
    deep inside transform()."""
    with pytest.raises(ValueError, match="exceeds lsh_num_hashes"):
        CosSimIndexer(strategy="lsh", lsh_num_hashes=32, lsh_bands=16,
                      lsh_rows_per_band=4)
    with pytest.raises(ValueError, match=">= 1"):
        CosSimIndexer(strategy="lsh", lsh_num_hashes=32, lsh_bands=0,
                      lsh_rows_per_band=4)
    # a legal layout constructs fine; the non-lsh strategies don't care
    CosSimIndexer(strategy="lsh", lsh_num_hashes=32, lsh_bands=8,
                  lsh_rows_per_band=4)
    CosSimIndexer(strategy="inverted", lsh_num_hashes=1, lsh_bands=99,
                  lsh_rows_per_band=99)


def test_lsh_rejects_blocking(spark, data):
    gt, names = data
    m = CosSimIndexer(strategy="lsh", blocking_func=first_char_block).fit(gt)
    with pytest.raises(ValueError, match="pruning mechanism"):
        m.transform(names)
    m.unpersist()


def test_lsh_strategy_persistence_roundtrip(spark, tmp_path):
    """An 'lsh'-strategy model round-trips through save/load with its
    banding parameters and produces identical results after reload."""
    from entitymatchingmodel_spark import SparkEntityMatching, load_model, save_model

    gt = spark.createDataFrame(
        [(1, "Apple Inc."), (2, "Microsoft Corp."), (3, "Alphabet B.V."),
         (4, "Amazon Ltd"), (5, "Netflix N.V.")],
        "id long, name string",
    )
    names = spark.createDataFrame(
        [(101, "apple"), (102, "microsof corp"), (103, "netflx nv")],
        "id long, name string",
    )
    em = SparkEntityMatching(indexers=[{
        "type": "cosine_similarity", "tokenizer": "words", "ngram": 1,
        "num_candidates": 3, "cos_sim_lower_bound": 0.05,
        "strategy": "lsh", "lsh_bands": 8, "lsh_rows_per_band": 4,
    }])
    em.fit(gt)

    def canon(df):
        # unmatched names survive the left-outer rejoin with NULL scores
        return sorted(
            (r["uid"], r["gt_uid"],
             None if r["score_0"] is None else round(r["score_0"], 6))
            for r in df.select("uid", "gt_uid", "score_0").collect()
        )

    want = canon(em.transform(names))
    path = str(tmp_path / "lsh_model")
    save_model(em, path)
    em2 = load_model(spark, path)
    m2 = list(em2.indexer_models_.values())[0]
    assert m2.strategy == "lsh" and m2.lsh_bands == 8 and m2.lsh_rows_per_band == 4
    got = canon(em2.transform(names))
    assert got == want and got
