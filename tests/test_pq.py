"""Unit tests for product quantization (operators/pq.py)."""

import pytest
from pyspark.sql import functions as F

from entitymatchingmodel_spark.operators.pq import (
    pq_codebooks_from_ids,
    pq_encode,
    pq_fit,
    pq_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vectors(spark):
    # dim=4, m=2 -> 2-dim subvectors with hand-checkable geometry
    rows = [
        (1, [1.0, 0.0, 0.0, 1.0]),
        (2, [0.0, 1.0, 1.0, 0.0]),
        (3, [1.0, 0.1, 0.1, 1.0]),  # near vector 1 in both subspaces
        (4, [0.1, 1.0, 1.0, 0.1]),  # near vector 2 in both subspaces
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_codebooks_from_ids_layout(vectors):
    cb = pq_codebooks_from_ids(vectors, "vec_id", "embedding", m=2, k=2)
    rows = {(r["sub_id"], r["code"]): r["centroid"] for r in cb.collect()}
    # code c = subvector of the c-th smallest id: vec 1 -> code 0, vec 2 -> code 1
    assert rows[(0, 0)] == [1.0, 0.0] and rows[(1, 0)] == [0.0, 1.0]
    assert rows[(0, 1)] == [0.0, 1.0] and rows[(1, 1)] == [1.0, 0.0]
    assert len(rows) == 4


def test_encode_assigns_nearest_code(vectors):
    cb = pq_codebooks_from_ids(vectors, "vec_id", "embedding", m=2, k=2)
    codes = {r["vec_id"]: r["codes"] for r in
             pq_encode(vectors, cb, "vec_id", "embedding", m=2).collect()}
    assert codes[1] == [0, 0] and codes[3] == [0, 0]  # near v1's slices
    assert codes[2] == [1, 1] and codes[4] == [1, 1]  # near v2's slices


def test_topk_adc_hand_computed(vectors):
    """With codebook == {v1, v2} slices, v3 encodes to v1's word, so its
    ADC score against query v1 is exactly IP(v1, v1) = 2.0."""
    cb = pq_codebooks_from_ids(vectors, "vec_id", "embedding", m=2, k=2)
    codes = pq_encode(vectors, cb, "vec_id", "embedding", m=2)
    q = vectors.filter("vec_id = 1").select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    out = pq_topk(codes, cb, q, "vec_id", "qid", "embedding", k=4)
    got = [(r["vec_id"], r["score"], r["rank"]) for r in out.orderBy("rank").collect()]
    # v1 and v3 share code word [0,0] -> reconstructed as v1 -> score 2.0,
    # tie ranks id-ascending; v2/v4 share [1,1] -> IP(v1, v2) = 0.0
    assert got == [(1, 2.0, 1), (3, 2.0, 2), (2, 0.0, 3), (4, 0.0, 4)]


def test_exactness_when_codebook_spans_corpus(vectors):
    """k >= n distinct subvectors: encoding is lossless, so ADC == true
    inner product for every pair."""
    cb = pq_codebooks_from_ids(vectors, "vec_id", "embedding", m=2, k=4)
    codes = pq_encode(vectors, cb, "vec_id", "embedding", m=2)
    q = vectors.select(F.col("vec_id").alias("qid"), "embedding")
    out = pq_topk(codes, cb, q, "vec_id", "qid", "embedding", k=1)
    # every vector's own reconstruction is itself -> rank-1 hit is itself
    # (its self-IP strictly dominates here)
    top = {r["qid"]: r["vec_id"] for r in out.collect()}
    assert top == {1: 1, 2: 2, 3: 3, 4: 4}


def test_geometry_fail_fast(spark, vectors):
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(vectors, "vec_id", "embedding", m=3, k=2)
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="mixed vector dimensions"):
        pq_fit(ragged, "vec_id", "embedding", m=2, k=2)


def test_max_queries_guard(vectors):
    cb = pq_codebooks_from_ids(vectors, "vec_id", "embedding", m=2, k=2)
    codes = pq_encode(vectors, cb, "vec_id", "embedding", m=2)
    q = vectors.select(F.col("vec_id").alias("qid"), "embedding")
    with pytest.raises(ValueError, match="max_queries"):
        pq_topk(codes, cb, q, "vec_id", "qid", "embedding", k=1, max_queries=2)


def test_fit_keeps_full_codebook_and_improves_recall(spark):
    """Learned codebooks on the real embedding table: (a) the codebook
    stays exactly m*k rows (empty codes inherit their previous centroid);
    (b) ADC recall@10 against exact inner-product top-10 clears a floor
    that the task is genuinely above (measured ~0.5-0.7 with m=8,k=16)."""
    from entitymatchingmodel_spark.operators.ann import _dot

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb = pq_fit(emb, "vec_id", "embedding", m=8, k=16, n_iter=3)
    assert cb.count() == 8 * 16
    codes = pq_encode(emb, cb, "vec_id", "embedding", m=8)
    queries = emb.orderBy("vec_id").limit(8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    approx = pq_topk(codes, cb, queries, "vec_id", "qid", "qv", k=10)
    # exact IP top-10 (brute force on the 500-row table)
    from pyspark.sql import Window

    pairs = queries.crossJoin(emb).select(
        "qid", "vec_id", _dot(F.col("qv"), F.col("embedding")).alias("ip")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("ip"), F.asc("vec_id"))
    exact = pairs.withColumn("r", F.row_number().over(w)).filter("r <= 10")
    hits = approx.join(exact, ["qid", "vec_id"]).count()
    recall = hits / (8 * 10)
    assert recall >= 0.35, f"ADC recall@10 collapsed: {recall}"


def test_ivf_pq_learned_recall_vs_exact(spark):
    """Full IVF-PQ with LEARNED codebooks: recall@10 against exact cosine
    top-10 clears a floor.  The synthetic embeddings are uniform random
    (near-orthogonal, no cluster structure), the HARD case for PQ: the
    cosine gaps being quantized are tiny, so distortion dominates —
    measured 0.275 at nprobe=8/nlist=16, m=8/k=16 (and only 0.30 with
    pruning disabled at nprobe=16, confirming PQ distortion, not IVF
    pruning, is the binding constraint here).  Random guessing is
    10/500 = 0.02; the floor is set at 0.15 to leave margin for Lloyd
    float-order wobble while still catching a real collapse."""
    from pyspark.sql import Window

    from entitymatchingmodel_spark.operators.ann import _dot, _l2_normalize
    from entitymatchingmodel_spark.operators.pq import ivf_pq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(8)
    approx = ivf_pq_topk(
        queries, emb, "vec_id", "embedding",
        k=10, nlist=16, nprobe=8, m=8, pq_k=16, n_iter=2,
    ).withColumnRenamed("qid", "_q")
    un = _l2_normalize(
        emb.select("vec_id", F.col("embedding").alias("_v")), "_v"
    ).filter(F.col("_v").isNotNull())
    qn = un.filter(F.col("vec_id") <= queries.agg(F.max("vec_id")).first()[0]) \
           .orderBy("vec_id").limit(8) \
           .select(F.col("vec_id").alias("_q"), F.col("_v").alias("_qv"))
    pairs = qn.crossJoin(un).select(
        "_q", "vec_id", _dot(F.col("_qv"), F.col("_v")).alias("cos")
    )
    w = Window.partitionBy("_q").orderBy(F.desc("cos"), F.asc("vec_id"))
    exact = pairs.withColumn("r", F.row_number().over(w)).filter("r <= 10")
    hits = approx.join(exact, (approx["_q"] == exact["_q"])
                       & (approx["nn_id"] == exact["vec_id"])).count()
    recall = hits / (8 * 10)
    assert recall >= 0.15, f"IVF-PQ recall@10 collapsed: {recall}"


def test_ivf_pq_deterministic_codebooks_subset_of_probed_buckets(spark):
    """With the deterministic codebook, every returned candidate must live
    in one of its query's probed buckets (the IVF contract) and ranks must
    be 1..k dense per query."""
    from entitymatchingmodel_spark.operators.ann import (
        _assign_corpus,
        _build_centroids,
        _l2_normalize,
        _nearest_centroids,
    )
    from entitymatchingmodel_spark.operators.pq import (
        ivf_pq_topk,
        pq_codebooks_from_ids,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter("vec_id < 5")
    cb = pq_codebooks_from_ids(emb, "vec_id", "embedding", 4, 16, normalize=True)
    out = ivf_pq_topk(queries, emb, "vec_id", "embedding", k=5,
                      nlist=16, nprobe=4, m=4, pq_k=16,
                      codebooks=cb, score_decimals=6).collect()
    cents = _build_centroids(emb, "vec_id", "embedding", 16, 42)
    assigned = {r["nn_id"]: r["bucket"] for r in
                _assign_corpus(emb, cents, "vec_id", "embedding", 6).collect()}
    qn = _l2_normalize(
        queries.select(F.col("vec_id").alias("qid"),
                       F.col("embedding").alias("_qv")), "_qv")
    probed = {}
    for r in _nearest_centroids(qn, cents, "qid", "_qv", 4, "bucket", 6).collect():
        probed.setdefault(r["qid"], set()).add(r["bucket"])
    for r in out:
        assert assigned[r["nn_id"]] in probed[r["qid"]]
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())


def test_pq_model_save_load_roundtrip(spark, tmp_path):
    """PQModel fit -> save -> load must reproduce encodings and ADC
    top-k byte-identically (codebook doubles round-trip exactly through
    parquet), and meta params survive."""
    from entitymatchingmodel_spark.operators.pq import PQModel

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    m1 = PQModel.fit(emb, "vec_id", "embedding", m=4, k=8, n_iter=2, seed=7)
    codes1 = m1.encode(emb, "vec_id", "embedding")
    q = emb.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    top1 = sorted(map(tuple, m1.topk(codes1, q, "vec_id", "qid", "embedding",
                                     k=5).collect()))
    path = str(tmp_path / "pqm")
    m1.save(path)
    m2 = PQModel.load(spark, path)
    assert (m2.m, m2.k, m2.seed) == (4, 8, 7)
    codes2 = m2.encode(emb, "vec_id", "embedding")
    assert sorted(map(tuple, codes1.collect())) == sorted(map(tuple, codes2.collect()))
    top2 = sorted(map(tuple, m2.topk(codes2, q, "vec_id", "qid", "embedding",
                                     k=5).collect()))
    assert top1 == top2
    m2.unpersist()


def test_refine_topk_hand_computed(spark):
    """Exact re-rank of a hand-made shortlist: scores are the exact unit
    cosines of only the listed pairs, ranked per query with id
    tie-break; pairs whose candidate has a zero-norm vector drop."""
    import math

    from entitymatchingmodel_spark.operators.pq import refine_topk

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [1.0, 1.0]),
            (4, [0.0, 0.0]),   # zero-norm: never scored
        ],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.filter("vec_id = 1")
    cands = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 3)],  # duplicate pair collapses
        "qid long, nn_id long",
    )
    got = [(r["qid"], r["nn_id"], r["score"], r["rank"]) for r in
           refine_topk(cands, queries, corpus, "vec_id", "embedding", k=2)
           .orderBy("rank").collect()]
    c3 = round(1.0 / math.sqrt(2.0), 6)
    assert got == [(1, 3, c3, 1), (1, 2, 0.0, 2)]


def test_refine_topk_validation(spark, vectors):
    from entitymatchingmodel_spark.operators.pq import refine_topk

    cands = spark.createDataFrame([(1, 2)], "qid long, nn_id long")
    with pytest.raises(ValueError, match="k must be"):
        refine_topk(cands, vectors, vectors, "vec_id", "embedding", k=0)
    bad = spark.createDataFrame([(1, 2)], "q long, n long")
    with pytest.raises(ValueError, match="missing column"):
        refine_topk(bad, vectors, vectors, "vec_id", "embedding", k=1)
    many = spark.range(3).selectExpr("id AS qid", "id AS nn_id")
    with pytest.raises(ValueError, match="max_queries"):
        refine_topk(many, vectors, vectors, "vec_id", "embedding", k=1,
                    max_queries=2)
    # r11: TOTAL shortlist rows are bounded too — few queries with a huge
    # per-query shortlist passed the distinct-qid guard yet still
    # broadcast max_queries x shortlist_k query-vector-carrying rows
    wide = spark.range(40).selectExpr("1 AS qid", "id AS nn_id")
    with pytest.raises(ValueError, match="max_shortlist_rows"):
        refine_topk(wide, vectors, vectors, "vec_id", "embedding", k=1,
                    max_queries=5, max_shortlist_rows=30)


def test_refine_recovers_recall_lost_to_adc(spark):
    """The two-stage story on real embeddings: exact-rescoring a 3x
    IVF-PQ shortlist must match exact-within-the-shortlist brute force
    EXACTLY, and its recall@k vs exact search must be at least the
    unrefined ADC ranking's."""
    from entitymatchingmodel_spark.operators.ann import cosine_topk
    from entitymatchingmodel_spark.operators.pq import (
        ivf_pq_topk,
        pq_codebooks_from_ids,
        refine_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    cb = pq_codebooks_from_ids(emb, "vec_id", "embedding", 4, 16,
                               normalize=True)
    short = ivf_pq_topk(queries, emb, "vec_id", "embedding", k=15,
                        nlist=16, nprobe=8, m=4, pq_k=16, codebooks=cb,
                        score_decimals=6).persist()
    refined = refine_topk(short, queries, emb, "vec_id", "embedding", k=5)
    exact = cosine_topk(queries, emb, "vec_id", "embedding", k=5,
                        score_decimals=6)

    def pairs(df):
        return {(r["qid"], r["nn_id"]) for r in df.collect()}

    ex, rf = pairs(exact), pairs(refined)
    ad = {(r["qid"], r["nn_id"]) for r in short.filter("rank <= 5").collect()}
    assert len(rf & ex) >= len(ad & ex), (len(rf & ex), len(ad & ex))
    # refined scores are the exact cosines for pairs in both sets (the
    # GEMM path sums in a different float order than the sequential
    # dot, so allow one ulp of the 6dp grid)
    exact_scores = {(r["qid"], r["nn_id"]): r["score"] for r in exact.collect()}
    for r in refined.collect():
        key = (r["qid"], r["nn_id"])
        if key in exact_scores:
            assert abs(r["score"] - exact_scores[key]) <= 1e-6, key
    short.unpersist()


def test_ragged_codebook_fails_fast(spark, vectors):
    """r11 guard consolidation validates codebook centroid length over ALL
    m*k rows (max == min == d_sub) in the same driver job as the other
    guards — a ragged codebook (first row valid, later row not) now fails
    fast in pq_encode, pq_topk and ivf_pq_topk instead of NULL-poisoning
    the later rows' distance arithmetic."""
    ragged_cb = spark.createDataFrame(
        [(0, 0, [1.0, 0.0]), (0, 1, [1.0, 0.0, 0.0]), (1, 0, [0.0, 1.0])],
        "sub_id int, code int, centroid array<double>",
    )
    q = vectors.select(F.col("vec_id").alias("qid"), "embedding")
    with pytest.raises(ValueError, match="codebook centroids"):
        pq_encode(vectors, ragged_cb, "vec_id", "embedding", m=2)
    good_codes = pq_encode(
        vectors,
        pq_codebooks_from_ids(vectors, "vec_id", "embedding", m=2, k=2),
        "vec_id", "embedding", m=2,
    )
    with pytest.raises(ValueError, match="codebook centroids"):
        pq_topk(good_codes, ragged_cb, q, "vec_id", "qid", "embedding", k=1)
    from entitymatchingmodel_spark.operators.pq import ivf_pq_topk

    with pytest.raises(ValueError, match="codebook centroids"):
        ivf_pq_topk(
            q.withColumnRenamed("qid", "vec_id"), vectors, "vec_id",
            "embedding", k=1, nlist=2, nprobe=1, m=2, pq_k=2,
            codebooks=ragged_cb,
        )
