"""Unit tests for bigram-LM quality scoring (operators/lm.py)."""

import math
import re

import pytest
from pyspark.sql import functions as F

from entitymatchingmodel_spark.operators.lm import bigram_lm_scores


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", (t or "").lower()) if w]


def _py_scores(docs, ref, a=1.0, dec=6):
    """Quadratic mirror of the documented Laplace-bigram semantics."""
    c12, c1, vocab = {}, {}, set()
    for _, t in ref:
        ts = _toks(t)
        vocab.update(ts)
        for w1, w2 in zip(ts, ts[1:]):
            c12[(w1, w2)] = c12.get((w1, w2), 0) + 1
            c1[w1] = c1.get(w1, 0) + 1
    v = len(vocab)
    out = {}
    for i, t in docs:
        bgs = list(zip(_toks(t), _toks(t)[1:]))
        if not bgs:
            out[i] = (0, None, None)
            continue
        lps = [
            math.log2((c12.get(b, 0) + a) / (c1.get(b[0], 0) + a * v))
            for b in bgs
        ]
        avg = round(sum(lps) / len(lps), dec)
        out[i] = (len(bgs), avg, round(2.0 ** (-avg), dec))
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "a cat and a dog"),
        (4, "one"),     # <2 tokens: NULL scores
        (5, None),      # NULL text: NULL scores
        (6, "the cat sat on the mat"),  # duplicate of 1: identical scores
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_pure_python_reference(corpus):
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    expect = _py_scores(rows, rows)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["perplexity"])
        for r in bigram_lm_scores(corpus, "doc_id", "text", score_decimals=6).collect()
    }
    assert got == expect


def test_separate_reference_corpus(spark, corpus):
    """CCNet posture: train on a clean reference, score another corpus —
    a doc made of bigrams the reference never saw floors at the smoothed
    minimum, below any in-reference doc."""
    ref = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["avg_logp"] for r in
           bigram_lm_scores(corpus, "doc_id", "text", reference=ref,
                            score_decimals=6).collect()}
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    expect = _py_scores(rows, [(100, "the quick brown fox jumps over the lazy dog")])
    assert out == {i: t[1] for i, t in expect.items()}


def test_duplicate_docs_score_identically(corpus):
    got = {r["doc_id"]: (r["avg_logp"], r["perplexity"]) for r in
           bigram_lm_scores(corpus, "doc_id", "text", score_decimals=6).collect()}
    assert got[1] == got[6]


def test_short_and_null_docs_keep_rows(corpus):
    got = {r["doc_id"]: r for r in
           bigram_lm_scores(corpus, "doc_id", "text").collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}
    for i in (4, 5):
        assert got[i]["n_bigrams"] == 0
        assert got[i]["avg_logp"] is None and got[i]["perplexity"] is None


def test_validation(spark, corpus):
    with pytest.raises(ValueError, match="smoothing"):
        bigram_lm_scores(corpus, "doc_id", "text", smoothing=0.0)
    empty_ref = spark.createDataFrame([(1, "???")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        bigram_lm_scores(corpus, "doc_id", "text", reference=empty_ref)


def test_partition_invariance(corpus):
    a = sorted(map(tuple, bigram_lm_scores(corpus, "doc_id", "text",
                                           score_decimals=6).collect()))
    b = sorted(map(tuple, bigram_lm_scores(corpus.repartition(7), "doc_id",
                                           "text", score_decimals=6).collect()))
    assert a == b


def test_fit_once_score_many_equals_one_call(spark, corpus):
    """BigramLM.fit(ref).score(docs) is pinned EQUAL to the one-call
    bigram_lm_scores path, and a second score() on the same fitted model
    returns the same rows (fit-once/score-many)."""
    from entitymatchingmodel_spark.operators.lm import BigramLM

    one_call = sorted(
        map(tuple, bigram_lm_scores(corpus, "doc_id", "text",
                                    score_decimals=6).collect())
    )
    model = BigramLM.fit(corpus, "text", score_decimals=6)
    first = sorted(map(tuple, model.score(corpus, "doc_id", "text").collect()))
    second = sorted(map(tuple, model.score(corpus, "doc_id", "text").collect()))
    model.unpersist()
    assert first == one_call
    assert second == one_call


def test_bigram_lm_save_load_roundtrip(spark, corpus, tmp_path):
    """save -> load in-session: integer counts + the V scalar round-trip
    through parquet/json exactly, so the loaded model's scores are
    byte-identical; params survive too."""
    from entitymatchingmodel_spark.operators.lm import BigramLM

    model = BigramLM.fit(corpus, "text", smoothing=0.5, score_decimals=6)
    path = str(tmp_path / "lm")
    model.save(path)
    expect = sorted(map(tuple, model.score(corpus, "doc_id", "text").collect()))
    model.unpersist()

    handles: list = []
    loaded = BigramLM.load(spark, path, persist_handles=handles)
    assert loaded.vocab == model.vocab
    assert loaded.smoothing == 0.5
    assert loaded.score_decimals == 6
    got = sorted(map(tuple, loaded.score(corpus, "doc_id", "text").collect()))
    assert got == expect
    for h in handles:
        h.unpersist()


def test_bigram_lm_train_clean_score_crawl(spark, corpus):
    """The CCNet posture: fit on a clean reference, score a different
    corpus — matches the quadratic python mirror with that reference."""
    from entitymatchingmodel_spark.operators.lm import BigramLM

    ref_rows = [(10, "the cat sat on the mat"), (11, "the dog sat on the rug")]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    docs_rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    expect = _py_scores(docs_rows, ref_rows)

    model = BigramLM.fit(ref, "text", score_decimals=6)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["perplexity"])
        for r in model.score(corpus, "doc_id", "text").collect()
    }
    model.unpersist()
    assert got == expect


def test_bigram_lm_validation(spark, corpus):
    from entitymatchingmodel_spark.operators.lm import BigramLM

    with pytest.raises(ValueError, match="smoothing"):
        BigramLM.fit(corpus, "text", smoothing=0.0)
    empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        BigramLM.fit(empty, "text")


def test_perplexity_bands(spark, corpus):
    """head/middle/tail thresholds are the exact per-group type-1
    quantile values; unscored docs keep a NULL band; every non-empty
    group's lowest-perplexity doc is 'head' and highest is 'tail' (when
    the group has >= 3 distinct scores)."""
    from entitymatchingmodel_spark.operators.lm import BigramLM, perplexity_bands

    docs = corpus.withColumn(
        "grp", (F.col("doc_id") % 2 == 0).cast("string")
    )
    model = BigramLM.fit(docs, "text", score_decimals=6)
    out = perplexity_bands(docs, "doc_id", "text", model, "grp").collect()
    model.unpersist()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == docs.count()
    # docs 4 (1 token) and 5 (NULL) are unscored -> NULL band
    assert by_id[4]["band"] is None and by_id[5]["band"] is None
    # duplicate docs (1 and 6) score identically -> identical band
    assert by_id[1]["perplexity"] == by_id[6]["perplexity"]
    # python mirror of the banding over the scored rows
    import math

    for g in {r["grp"] for r in out}:
        vals = sorted(r["perplexity"] for r in out
                      if r["grp"] == g and r["perplexity"] is not None)
        if not vals:
            continue
        n = len(vals)
        t_lo = vals[max(1, math.ceil(n / 3)) - 1]
        t_hi = vals[max(1, math.ceil(2 * n / 3)) - 1]
        for r in out:
            if r["grp"] != g or r["perplexity"] is None:
                continue
            want = ("head" if r["perplexity"] <= t_lo
                    else "middle" if r["perplexity"] <= t_hi else "tail")
            assert r["band"] == want, (r, t_lo, t_hi)
    with pytest.raises(ValueError, match="lo_q"):
        perplexity_bands(docs, "doc_id", "text",
                         BigramLM.fit(docs, "text"), "grp", lo_q=0.9, hi_q=0.1)

def test_perplexity_bands_rejects_equal_quantiles(spark):
    """lo_q == hi_q must fail in perplexity_bands' own validation, not as
    grouped_quantiles' confusing 'duplicate quantiles' (round-8 review)."""
    import pytest
    from entitymatchingmodel_spark.operators.lm import BigramLM, perplexity_bands

    docs = spark.createDataFrame(
        [(1, "a b a b", "g"), (2, "b a b a", "g")], "id long, text string, grp string"
    )
    model = BigramLM.fit(docs, "text")
    try:
        with pytest.raises(ValueError, match="lo_q < hi_q"):
            perplexity_bands(docs, "id", "text", model, "grp", lo_q=0.5, hi_q=0.5)
    finally:
        model.unpersist()

def test_score_rowwise_pinned_equal_to_batch(spark, tmp_path):
    """The stateless row-wise scorer (broadcast dicts + pandas UDF) is
    pinned EQUAL to the batch join/aggregate scorer on rounded scores —
    including through a save/load cycle — and its guard fails fast with
    a pointer to batch scoring."""
    import pytest
    from entitymatchingmodel_spark.operators.lm import BigramLM

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = BigramLM.fit(docs.filter("lang = 'en'"), "text", score_decimals=6)
    path = str(tmp_path / "lm")
    model.save(path)
    model.unpersist()
    loaded = BigramLM.load(spark, path)
    try:
        batch = {
            r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["perplexity"])
            for r in loaded.score(docs, "doc_id", "text").collect()
        }
        roww = {
            r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["perplexity"])
            for r in loaded.score_rowwise(docs, "text").select(
                "doc_id", "n_bigrams", "avg_logp", "perplexity"
            ).collect()
        }
        assert batch == roww
        assert len(batch) == docs.count()
        with pytest.raises(ValueError, match="BigramLM.score"):
            loaded.score_rowwise(docs, "text", max_model_rows=10)
    finally:
        loaded.unpersist()
