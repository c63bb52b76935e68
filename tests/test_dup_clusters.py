"""Connected-components variants: min-label propagation vs large-/small-star."""

import random

from entitymatchingmodel_spark.operators.dedup import (
    duplicate_clusters,
    duplicate_clusters_star,
)


def _union_find(n_ids, edges):
    parent = list(range(n_ids))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # cluster id = min member id
    comp = {}
    for i in range(n_ids):
        r = find(i)
        comp.setdefault(r, []).append(i)
    return {i: min(members) for r, members in comp.items() for i in members}


def _check(spark, n, edges, fn, **kw):
    ids = spark.createDataFrame([(i,) for i in range(n)], "id long")
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(None, None)],
        "id_a long, id_b long",
    ).dropna()
    got = {r["id"]: r["cluster_id"] for r in fn(ids, pairs, **kw).collect()}
    assert got == _union_find(n, edges)


def test_star_matches_union_find_random_graph(spark):
    rnd = random.Random(3)
    n = 120
    edges = [(rnd.randrange(n), rnd.randrange(n)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, n, edges, duplicate_clusters_star)
    _check(spark, n, edges, duplicate_clusters)


def test_star_converges_on_long_chain_in_log_rounds(spark):
    """A 120-node path has diameter 119: min-label propagation needs ~119
    rounds (more than its max_iterations default), while large-/small-star
    needs O(log n) — it must produce the exact components well within 15
    rounds."""
    n = 120
    edges = [(i, i + 1) for i in range(n - 1)]
    _check(spark, n, edges, duplicate_clusters_star, max_iterations=15)


def test_star_singletons_and_empty_edges(spark):
    _check(spark, 5, [], duplicate_clusters_star)


def test_reliable_checkpoint_flag(spark, tmp_path):
    """reliable_checkpoint=True writes to the session checkpoint dir and
    produces the same clusters; without a dir set it raises with guidance."""
    import pytest

    rng = random.Random(3)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(40)]
    # adversarial long chain forces several rounds through the checkpoint
    edges += [(i, i + 1) for i in range(30, 55)]

    old = spark.sparkContext.getCheckpointDir()
    assert old is None or "reliable_ckpt" not in str(old)
    with pytest.raises(ValueError, match="setCheckpointDir"):
        _check(spark, n, edges, duplicate_clusters_star, reliable_checkpoint=True)

    spark.sparkContext.setCheckpointDir(str(tmp_path / "reliable_ckpt"))
    try:
        _check(spark, n, edges, duplicate_clusters_star, reliable_checkpoint=True)
        _check(spark, n, edges, duplicate_clusters, reliable_checkpoint=True)
    finally:
        spark.sparkContext.setCheckpointDir(old)


def test_loop_shuffle_sizing_restores_confs(spark):
    """Session confs (shuffle partitions, AQE) must be restored after the
    sized loop, including on error."""
    import pytest

    from entitymatchingmodel_spark.operators.dedup import _loop_shuffle_partitions

    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    with _loop_shuffle_partitions(spark, n_rows=10):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "2"
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.shuffle.partitions") == old_sp
    assert spark.conf.get("spark.sql.adaptive.enabled") == old_aqe

    with pytest.raises(RuntimeError):
        with _loop_shuffle_partitions(spark, n_rows=10):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == old_sp
    assert spark.conf.get("spark.sql.adaptive.enabled") == old_aqe

    # large-volume sizing keeps the session setting and leaves AQE on
    with _loop_shuffle_partitions(spark, n_rows=100_000_000):
        assert spark.conf.get("spark.sql.shuffle.partitions") == old_sp
        assert spark.conf.get("spark.sql.adaptive.enabled") == old_aqe


def test_fuzzy_dedup_one_call_composition(spark):
    """fuzzy_dedup: planted near-identical docs collapse to their min-id
    representative, cluster sizes account for every input row, payload
    columns pass through, star variant agrees."""
    from entitymatchingmodel_spark.operators.dedup import fuzzy_dedup

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "into the deep green forest before the morning light")
    rows = [
        (1, base, "a"),
        (2, base + " extra", "a"),            # near-dup of 1
        (3, base.replace("quick", "fast"), "a"),   # near-dup of 1
        (10, "completely different text about spark sql aggregation engines "
             "and columnar storage formats for analytics", "b"),
        (20, "third unrelated document mentioning streaming watermarks and "
             "stateful session windows in structured streaming", "c"),
    ]
    df = spark.createDataFrame(rows, "id long, text string, src string")
    out = fuzzy_dedup(df, "id", "text", num_hashes=32, shingle_n=3,
                      bands=16, rows_per_band=2, min_jaccard=0.4)
    kept = {r["id"]: (r["cluster_size"], r["src"]) for r in out.collect()}
    assert kept[1] == (3, "a"), kept
    assert set(kept) == {1, 10, 20}
    assert sum(s for s, _ in kept.values()) == len(rows)
    star = {r["id"]: r["cluster_size"]
            for r in fuzzy_dedup(df, "id", "text", num_hashes=32, shingle_n=3,
                                 bands=16, rows_per_band=2, min_jaccard=0.4,
                                 use_star=True).collect()}
    assert star == {i: s for i, (s, _) in kept.items()}
