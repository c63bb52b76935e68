"""embedding_near_pairs: size guard + IVF-bucketed variant."""

import math
import random

import pytest

from entitymatchingmodel_spark.operators.dedup import (
    embedding_near_pairs,
    embedding_near_pairs_bucketed,
)


def _corpus(n=300, dim=16, n_dups=10, seed=7):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append((i, [rnd.gauss(0, 1) for _ in range(dim)]))
    # planted near-duplicates: tiny perturbations of existing vectors
    for j in range(n_dups):
        base_id = j * 7
        v = [x + rnd.gauss(0, 0.01) for x in rows[base_id][1]]
        rows.append((n + j, v))
    return rows


def test_size_guard_refuses_large_collect(spark):
    df = spark.range(50).selectExpr("id", "array(cast(id as float), 1.0F) as v")
    with pytest.raises(ValueError, match="bucketed"):
        embedding_near_pairs(df, "id", "v", max_collect_rows=10)


def test_bucketed_matches_exact_on_planted_dups(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "id long, v array<double>")
    exact = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_pairs(df, "id", "v", threshold=0.9).collect()
    }
    bucketed = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_pairs_bucketed(
            df, "id", "v", threshold=0.9, nlist=8
        ).collect()
    }
    assert len(exact) >= 10  # all planted dups found by the exact baseline
    assert bucketed == exact


def test_bucketed_dedupes_multi_probe_pairs(spark):
    # two identical vectors equidistant from everything: multi-probe puts
    # them in several buckets; the pair must still appear exactly once
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0]), (4, [-1.0, 0.1])]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = embedding_near_pairs_bucketed(
        df, "id", "v", threshold=0.99, nlist=4, probe_margin=2.0
    ).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in out]
    assert pairs == [(1, 2)]
    assert out[0]["cosine"] == 1.0


def test_bucketed_derived_margin_is_exact_at_low_threshold(spark):
    """probe_margin=None derives sqrt(2-2t), which provably covers every
    qualifying pair's centroid-cosine gap -> bucketed output == exact
    all-pairs output even at a LOW threshold (the regime where a fixed
    small margin is recall-lossy and data-dependent)."""
    import random

    from entitymatchingmodel_spark.operators.dedup import (
        embedding_near_pairs,
        embedding_near_pairs_bucketed,
    )

    rng = random.Random(11)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    exact = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_pairs(df, "id", "v", threshold=0.3).collect()
    }
    bucketed = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_pairs_bucketed(
            df, "id", "v", threshold=0.3, nlist=8
        ).collect()
    }
    assert bucketed == exact and len(exact) > 0


def test_semantic_dedup_keeps_one_per_cluster(spark):
    """semantic_dedup composition: planted near-dup clusters collapse to
    their min-id representative; singletons survive; cluster_size accounts
    for every input row; extra payload columns pass through."""
    import random

    from entitymatchingmodel_spark.operators.dedup import semantic_dedup

    rng = random.Random(7)

    def jitter(v, eps=0.01):
        return [x + rng.gauss(0, eps) for x in v]

    base_a = [rng.gauss(0, 1) for _ in range(8)]
    base_b = [rng.gauss(0, 1) for _ in range(8)]
    rows = []
    # cluster A: ids 0..3, cluster B: ids 10..12, singletons: 20..29
    for i in range(4):
        rows.append((i, jitter(base_a), "a"))
    for i in range(10, 13):
        rows.append((i, jitter(base_b), "b"))
    for i in range(20, 30):
        rows.append((i, [rng.gauss(0, 1) for _ in range(8)], "s"))
    df = spark.createDataFrame(rows, "id long, v array<double>, tag string")
    out = semantic_dedup(df, "id", "v", threshold=0.95, nlist=4).collect()
    kept = {r["id"]: (r["cluster_size"], r["tag"]) for r in out}
    assert kept[0] == (4, "a"), kept
    assert kept[10] == (3, "b"), kept
    assert set(kept) == {0, 10} | set(range(20, 30))
    assert all(kept[i] == (1, "s") for i in range(20, 30))
    assert sum(s for s, _ in kept.values()) == len(rows)
    # star variant agrees
    star = {
        r["id"]: r["cluster_size"]
        for r in semantic_dedup(df, "id", "v", threshold=0.95, nlist=4,
                                use_star=True).collect()
    }
    assert star == {i: s for i, (s, _) in kept.items()}
