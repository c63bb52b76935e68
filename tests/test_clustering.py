"""Unit tests for distributed spherical k-means (operators/clustering.py).

The semantics under test are the oracle-pinned ones documented in the
module docstring: md5-sample init, rounded-dot assignment with lowest-id
tie-break, rounded means, renormalize-and-round, empty clusters keep the
previous centroid, zero-norm rows dropped.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from entitymatchingmodel_spark.operators.clustering import (
    kmeans_assign,
    kmeans_clusters,
    kmeans_fit,
)

_HASH_SPACE = float(16 ** 7)


def _unit_hash(key, seed=42):
    """Pure-python mirror of functions/sampling._unit_hash with the km salt."""
    h = hashlib.md5(f"km{seed}|{key}".encode()).hexdigest()[:7]
    return int(h, 16) / _HASH_SPACE


def _py_kmeans(rows, k, n_iter, dec=6, seed=42):
    """Quadratic pure-python mirror of the documented iteration semantics."""

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return None if n == 0 else [x / n for x in v]

    un = {i: unit(v) for i, v in rows if v is not None and unit(v) is not None}
    order = sorted(un, key=lambda i: (_unit_hash(i, seed), i))[:k]
    cents = {c: [round(x, dec) for x in un[i]] for c, i in enumerate(order)}

    def assign(cents):
        out = {}
        for i, v in un.items():
            scored = sorted(
                ((round(sum(a * b for a, b in zip(v, cu)), dec), c)
                 for c, cu in cents.items()),
                key=lambda t: (-t[0], t[1]),
            )
            out[i] = (scored[0][1], scored[0][0])
        return out

    for _ in range(n_iter):
        a = assign(cents)
        new = {}
        for c, cu in cents.items():
            members = [un[i] for i, (ci, _) in a.items() if ci == c]
            if not members:
                new[c] = cu
                continue
            m = [round(sum(col) / len(col), dec)
                 for col in zip(*members)]
            n2 = sum(x * x for x in m)
            if n2 <= 0:
                new[c] = cu
            else:
                n = math.sqrt(n2)
                new[c] = [round(x / n, dec) for x in m]
        cents = new
    return assign(cents)


@pytest.fixture(scope="module")
def blobs(spark):
    # three well-separated directions plus a zero vector
    rows = [
        (1, [1.0, 0.05, 0.0]),
        (2, [1.0, -0.05, 0.0]),
        (3, [0.95, 0.0, 0.1]),
        (4, [0.0, 1.0, 0.05]),
        (5, [0.05, 1.0, 0.0]),
        (6, [0.0, 0.95, -0.05]),
        (7, [0.0, 0.05, 1.0]),
        (8, [-0.05, 0.0, 1.0]),
        (9, [0.0, 0.0, 0.0]),  # zero-norm: dropped
        (10, None),  # NULL vector: dropped
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_matches_pure_python_reference(blobs):
    rows = [(r["vec_id"], r["embedding"]) for r in blobs.collect()]
    expect = _py_kmeans(rows, k=3, n_iter=2)
    got = {
        r["vec_id"]: (r["cluster"], r["score"])
        for r in kmeans_clusters(
            blobs, "vec_id", "embedding", k=3, n_iter=2,
            score_decimals=6, cent_decimals=6,
        ).collect()
    }
    assert got == expect


def test_drops_zero_and_null_vectors(blobs):
    out = kmeans_clusters(blobs, "vec_id", "embedding", k=2, n_iter=1,
                          score_decimals=6, cent_decimals=6)
    ids = {r["vec_id"] for r in out.collect()}
    assert 9 not in ids and 10 not in ids
    assert len(ids) == 8


def test_partition_invariance(blobs):
    base = kmeans_clusters(blobs, "vec_id", "embedding", k=3, n_iter=2,
                           score_decimals=6, cent_decimals=6)
    spread = kmeans_clusters(blobs.repartition(7), "vec_id", "embedding",
                             k=3, n_iter=2, score_decimals=6, cent_decimals=6)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, spread.collect()))


def test_well_separated_blobs_converge(blobs):
    # seed 0 inits one centroid per blob (k-means is init-sensitive; the
    # default seed lands three centroids in one blob and settles in a
    # different — also legitimate — local optimum)
    out = kmeans_clusters(blobs, "vec_id", "embedding", k=3, n_iter=3, seed=0,
                          score_decimals=6, cent_decimals=6).collect()
    groups = {}
    for r in out:
        groups.setdefault(r["cluster"], set()).add(r["vec_id"])
    # the three direction blobs must land in three distinct clusters
    assert sorted(map(sorted, groups.values())) == [[1, 2, 3], [4, 5, 6], [7, 8]]
    # every row scores close to its own centroid
    assert all(r["score"] > 0.9 for r in out)


def test_lloyd_fixed_point(blobs):
    # on well-separated blobs the assignment stabilizes: one more
    # iteration must not move any row
    a = kmeans_clusters(blobs, "vec_id", "embedding", k=3, n_iter=3, seed=0,
                        score_decimals=6, cent_decimals=6)
    b = kmeans_clusters(blobs, "vec_id", "embedding", k=3, n_iter=4, seed=0,
                        score_decimals=6, cent_decimals=6)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_empty_cluster_keeps_previous_centroid(spark):
    # k=3 over two identical vectors + one other: init picks duplicate
    # directions, ties go to the lowest cent_id, so one centroid ends
    # empty — the operator must still emit exactly k centroid rows and
    # every input row exactly once.
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(df, "vec_id", "embedding", k=3, n_iter=2,
                       score_decimals=6, cent_decimals=6)
    assert cents.count() == 3
    out = kmeans_assign(df, cents, "vec_id", "embedding", score_decimals=6)
    assert out.count() == 3
    assert {r["vec_id"] for r in out.collect()} == {1, 2, 3}


def test_fit_once_assign_many(blobs):
    handles: list = []
    cents = kmeans_fit(blobs, "vec_id", "embedding", k=3, n_iter=2,
                       score_decimals=6, cent_decimals=6,
                       persist_handles=handles)
    one = kmeans_assign(blobs, cents, "vec_id", "embedding", score_decimals=6)
    two = kmeans_clusters(blobs, "vec_id", "embedding", k=3, n_iter=2,
                          score_decimals=6, cent_decimals=6)
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, two.collect()))
    for h in handles:
        h.unpersist()


def test_cluster_balanced_sample_caps_each_cluster(blobs):
    from entitymatchingmodel_spark.operators.clustering import (
        cluster_balanced_sample,
    )

    full = kmeans_clusters(blobs, "vec_id", "embedding", k=3, n_iter=2, seed=0,
                           score_decimals=6, cent_decimals=6)
    capped = cluster_balanced_sample(
        blobs, "vec_id", "embedding", k=3, n_iter=2, seed=0,
        max_per_cluster=2, score_decimals=6, cent_decimals=6,
    )
    sizes = {r["cluster"]: r["n"] for r in
             capped.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 2 for n in sizes.values())
    # kept rows are a subset of the full assignment, cluster/score intact
    full_map = {r["vec_id"]: (r["cluster"], r["score"]) for r in full.collect()}
    for r in capped.collect():
        assert full_map[r["vec_id"]] == (r["cluster"], r["score"])
    # nested-cap property: cap(2) is a subset of cap(3)
    wider = cluster_balanced_sample(
        blobs, "vec_id", "embedding", k=3, n_iter=2, seed=0,
        max_per_cluster=3, score_decimals=6, cent_decimals=6,
    )
    assert {r["vec_id"] for r in capped.collect()} <= {
        r["vec_id"] for r in wider.collect()}


def test_reliable_checkpoint_requires_dir(blobs):
    with pytest.raises(ValueError, match="setCheckpointDir"):
        kmeans_fit(blobs, "vec_id", "embedding", k=2, n_iter=1,
                   reliable_checkpoint=True)


def test_param_validation(blobs):
    with pytest.raises(ValueError, match="k must be"):
        kmeans_clusters(blobs, "vec_id", "embedding", k=0)
    with pytest.raises(ValueError, match="n_iter"):
        kmeans_clusters(blobs, "vec_id", "embedding", k=2, n_iter=-1)


def test_mixed_dimensions_rejected(spark):
    ragged = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="mixed vector dimensions"):
        kmeans_clusters(ragged, "vec_id", "embedding", k=2, n_iter=1)


def test_n_iter_zero_returns_init_centroids(blobs):
    cents = kmeans_fit(blobs, "vec_id", "embedding", k=3, n_iter=0,
                       cent_decimals=6)
    assert cents.count() == 3
    # materialized + lineage-truncated: the plan reads an ExistingRDD
    assert "ExistingRDD" in cents._jdf.queryExecution().executedPlan().toString()


def test_ivf_index_accepts_kmeans_centroids(blobs):
    """Trained-centroid IVF: searching an index built on kmeans_fit output
    must equal a probe-search against those same centroids (and reject a
    frame without the (cent_id, _cent) shape)."""
    from entitymatchingmodel_spark.operators.ann import IVFIndex

    cents = kmeans_fit(blobs, "vec_id", "embedding", k=3, n_iter=2, seed=0,
                       score_decimals=6, cent_decimals=6)
    handles: list = []
    ix = IVFIndex.build(blobs, "vec_id", "embedding", nlist=3,
                        score_decimals=6, persist_handles=handles,
                        centroids=cents)
    got = ix.search(blobs.filter(F.col("vec_id") <= 2), "vec_id", "embedding",
                    k=2, nprobe=1).collect()
    # with nprobe=1 every query's neighbours share its own kmeans cluster
    assign = {r["vec_id"]: r["cluster"] for r in
              kmeans_clusters(blobs, "vec_id", "embedding", k=3, n_iter=2,
                              seed=0, score_decimals=6, cent_decimals=6).collect()}
    for r in got:
        assert assign[r["qid"]] == assign[r["nn_id"]], r
    for h in handles:
        h.unpersist()
    with pytest.raises(ValueError, match="missing columns"):
        IVFIndex.build(blobs, "vec_id", "embedding",
                       centroids=blobs.select("vec_id"))


def test_ivf_nlist_reconciled_with_centroids(blobs):
    """nlist is DERIVED from a supplied centroid table (round-7 review:
    a stale nlist argument silently mis-described the saved index) and a
    contradictory explicit nlist raises."""
    from entitymatchingmodel_spark.operators.ann import IVFIndex

    cents = kmeans_fit(blobs, "vec_id", "embedding", k=3, n_iter=1, seed=0,
                       score_decimals=6, cent_decimals=6)
    ix = IVFIndex.build(blobs, "vec_id", "embedding", centroids=cents)
    assert ix.nlist == 3
    with pytest.raises(ValueError, match="disagrees"):
        IVFIndex.build(blobs, "vec_id", "embedding", nlist=64, centroids=cents)
    with pytest.raises(ValueError, match="empty"):
        IVFIndex.build(blobs, "vec_id", "embedding",
                       centroids=cents.filter("cent_id < 0"))
    ix.unpersist()


def test_streaming_assign_matches_batch(blobs, spark, tmp_path):
    """kmeans_assign_streaming == kmeans_assign on the same centroids —
    checked on a batch frame AND through a real availableNow stream."""
    from entitymatchingmodel_spark.operators.clustering import (
        kmeans_assign_streaming,
    )

    cents = kmeans_fit(blobs, "vec_id", "embedding", k=3, n_iter=2, seed=0,
                       score_decimals=6, cent_decimals=6)
    batch = sorted(map(tuple, kmeans_assign(
        blobs, cents, "vec_id", "embedding", score_decimals=6).collect()))
    lit = sorted(map(tuple, kmeans_assign_streaming(
        blobs, cents, "vec_id", "embedding", score_decimals=6).collect()))
    assert lit == batch

    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    blobs.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).parquet(src)
    out = kmeans_assign_streaming(stream, cents, "vec_id", "embedding",
                                  score_decimals=6)
    assert out.isStreaming
    got = []
    q = (
        out.writeStream.foreachBatch(lambda b, i: got.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(map(tuple, got)) == batch

    with pytest.raises(ValueError, match="empty centroid"):
        kmeans_assign_streaming(blobs, cents.filter("cent_id < 0"),
                                "vec_id", "embedding")


def test_output_schema(blobs):
    out = kmeans_clusters(blobs, "vec_id", "embedding", k=2, n_iter=1)
    assert out.schema.simpleString() == (
        "struct<vec_id:bigint,cluster:int,score:double>"
    )


def test_kmeans_model_save_load_roundtrip(blobs, spark, tmp_path):
    """KMeansModel: fit -> save -> load; the loaded model's batch AND
    streaming-shape assignments are byte-identical to the fitting
    session's kmeans_clusters output (rounded-double centroids round-trip
    through parquet exactly), params survive, and load-then-route needs
    no corpus access (the production ingest posture)."""
    from entitymatchingmodel_spark.operators.clustering import KMeansModel

    expect = sorted(map(tuple, kmeans_clusters(
        blobs, "vec_id", "embedding", k=3, n_iter=2, seed=0,
        score_decimals=6, cent_decimals=6).collect()))

    model = KMeansModel.fit(blobs, "vec_id", "embedding", k=3, n_iter=2,
                            seed=0, score_decimals=6, cent_decimals=6)
    path = str(tmp_path / "km")
    model.save(path)
    assert sorted(map(tuple, model.assign(blobs, "vec_id", "embedding")
                      .collect())) == expect

    handles: list = []
    loaded = KMeansModel.load(spark, path, persist_handles=handles)
    assert (loaded.k, loaded.n_iter, loaded.seed) == (3, 2, 0)
    assert (loaded.score_decimals, loaded.cent_decimals) == (6, 6)
    got_batch = sorted(map(tuple, loaded.assign(blobs, "vec_id", "embedding")
                           .collect()))
    got_stream = sorted(map(tuple, loaded.assign_streaming(
        blobs, "vec_id", "embedding").collect()))
    assert got_batch == expect
    assert got_stream == expect
    for h in handles:
        h.unpersist()


def test_kmeans_model_load_routes_real_stream(blobs, spark, tmp_path):
    """Load-then-route through a REAL availableNow stream: the loaded
    centroids drive kmeans_assign_streaming's stateless projection on a
    file stream, matching the batch assignment row-for-row."""
    from entitymatchingmodel_spark.operators.clustering import KMeansModel

    model = KMeansModel.fit(blobs, "vec_id", "embedding", k=3, n_iter=1,
                            seed=0, score_decimals=6, cent_decimals=6)
    path = str(tmp_path / "km2")
    model.save(path)
    loaded = KMeansModel.load(spark, path)

    src = str(tmp_path / "src")
    blobs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(blobs.schema).parquet(src)
    out = loaded.assign_streaming(stream, "vec_id", "embedding")
    q = (out.writeStream.format("memory").queryName("km_route_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("km_route_sink").collect()))
    expect = sorted(map(tuple, loaded.assign(blobs, "vec_id", "embedding")
                        .collect()))
    assert got == expect and got
    loaded.unpersist()
    model.unpersist()
