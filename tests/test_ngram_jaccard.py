"""ngram_jaccard_pairs: PPJoin prefix filtering — exactness + skew guard."""

from itertools import combinations

from pyspark.sql import functions as F

from entitymatchingmodel_spark.operators.dedup import ngram_jaccard_pairs


def _brute_force(rows, threshold):
    sets = {i: set(t.lower().split()) for i, t in rows}
    out = set()
    for (ia, sa), (ib, sb) in combinations(sorted(sets.items()), 2):
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out.add((ia, ib, round(j, 6)))
    return out


def _run(spark, rows, threshold):
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, "id", "text", shingle_n=1,
                                     threshold=threshold).collect()
    }
    assert got == _brute_force(rows, threshold), got
    return got


def test_exact_on_mixed_corpus(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),       # exact dup of 1
        (3, "alpha beta gamma epsilon"),      # 3/5 overlap with 1
        (4, "zeta eta theta iota"),
        (5, "completely different words here"),
        (6, ""),                              # empty: never paired
    ]
    got = _run(spark, rows, threshold=0.5)
    assert (1, 2, 1.0) in got and (1, 3, 0.6) in got


def test_hot_shingle_skew_prefix_guard(spark):
    """One shingle in 100% of docs (worse than the 20% scenario): with the
    naive inverted-index join the hot bucket alone yields ~N^2/2 candidate
    pairs; with prefix filtering the hot shingle ranks last in every doc
    and never enters a prefix, so the join produces ZERO candidates."""
    n = 200
    rows = [(i, f"hot u{i} v{i} w{i}") for i in range(n)]
    got = _run(spark, rows, threshold=0.5)
    assert got == set()
    # the guard itself: recompute the prefix table the operator builds and
    # assert the hot shingle is excluded everywhere -> candidate count is 0,
    # not ~n^2/2
    df = spark.createDataFrame(rows, "id long, text string")
    from entitymatchingmodel_spark.functions.tokenize import word_tokens

    ex = df.select(
        "id", F.explode(F.array_distinct(word_tokens(F.lower("text")))).alias("s")
    )
    freq = ex.groupBy("s").agg(F.count("*").alias("df"))
    hot = [r["s"] for r in freq.filter(F.col("df") >= n).collect()]
    assert hot == ["hot"]


def test_hot_shingle_still_found_when_it_must_be(spark):
    """Docs that are ONLY the hot shingle: prefix length 1 forces the hot
    shingle into the prefix, so true hot-only duplicates are still found —
    the guard is a reordering, not a lossy cap."""
    rows = [(1, "hot"), (2, "hot"), (3, "hot extra stuff padding")]
    got = _run(spark, rows, threshold=0.5)
    assert (1, 2, 1.0) in got


def test_minhash_estimates_track_true_jaccard(spark):
    """Regression for the degenerate linear hash family: with a*x+b mod p
    and small multipliers the product never wraps, every permutation picks
    the same argmin shingle, and est_jaccard collapses to {0, 1}.  A real
    permutation family must produce graded estimates near the true
    jaccard for partially-overlapping docs."""
    from pyspark.sql import functions as F

    from entitymatchingmodel_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    base = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(30):
        # each doc shares 30 of 40+10 distinct words with its neighbour
        words = base[:30] + [f"u{d}x{j}" for j in range(10)]
        rows.append((d, " ".join(words)))
    df = spark.createDataFrame(rows, "id long, text string")
    sigs = minhash_signatures(df, "id", "text", num_hashes=32, shingle_n=1)
    pairs = minhash_lsh_pairs(sigs, bands=16, rows_per_band=2).collect()
    # true jaccard between any two docs: 30 shared / 50 union = 0.6
    assert pairs, "no candidates found for 0.6-jaccard docs"
    ests = [p["est_jaccard"] for p in pairs]
    assert all(0.2 <= e <= 0.95 for e in ests), ests  # graded, never 1.0
    mean_est = sum(ests) / len(ests)
    assert abs(mean_est - 0.6) < 0.15, mean_est


def test_simhash_high_bits_carry_entropy(spark):
    """The per-token hash must fill every simhash bit: with a 28-bit hash
    the top 4 of 32 bits were constant zero, collapsing the top LSH block
    of simhash_near_pairs to 16 buckets (quadratic join at scale)."""
    from entitymatchingmodel_spark.operators.dedup import simhash

    docs = spark.createDataFrame(
        [(i, f"unique document number {i} with words w{i} x{i*7} y{i*13}")
         for i in range(64)],
        "doc_id long, text string",
    )
    vals = [r["simhash"] for r in simhash(docs, "doc_id", "text", bits=32).collect()]
    high = {v >> 28 for v in vals}
    assert len(high) > 4, f"top-4-bit nibble shows no entropy: {high}"

    import pytest
    with pytest.raises(ValueError, match="bits"):
        simhash(docs, "doc_id", "text", bits=64)


def test_cluster_loops_raise_on_non_convergence(spark):
    """A chain longer than max_iterations must raise, not silently return
    split clusters (the keep-one-per-cluster policy would otherwise keep
    near-duplicates)."""
    import pytest

    from entitymatchingmodel_spark.operators.dedup import duplicate_clusters

    n = 12
    ids = spark.createDataFrame([(i,) for i in range(n)], "id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(ids, chain, max_iterations=3)
