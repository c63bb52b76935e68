"""Distributed spherical k-means over an embedding column.

The training-data curation primitive behind SemDeDup-style pruning and
cluster-balanced sampling (PAPERS.md: SemDeDup, D4): cluster document
embeddings once, then sample / prune / cap per cluster.  The reference
engine (ing-bank/EntityMatchingModel) has no clustering operator — this
is part of the beyond-reference LLM-pipeline surface, same family as
``operators/dedup.py::semantic_dedup``.

Scale shape (pure DataFrame ops, nothing on the driver):

- **assignment** is a ``crossJoin`` against the broadcast k-row centroid
  table — one linear corpus scan with k dot products per row (the same
  documented bounded nested-loop as ``ann.ivf_topk``; see
  tools/plan_audit.py), NOT a quadratic pair join.
- **update** is ``dim`` per-index ``avg`` aggregates in ONE
  ``groupBy(cluster)`` — the partial aggregates combine map-side, so the
  shuffle carries k rows (each dim wide) per input partition regardless
  of corpus size.
- each iteration's k-row centroid table is checkpointed
  (``localCheckpoint``, or the fault-tolerant dir with
  ``reliable_checkpoint=True``): iteration t+1's plan does not replay
  iterations 1..t every time the centroids are referenced, and the
  lineage stays O(1) in ``n_iter`` (the same pattern as
  ``dedup.dup_clusters``).

One Lloyd iteration therefore costs one corpus scan + one bounded
shuffle — the plan a 1000-executor cluster wants at 100 TB.

Determinism / oracle posture: init = the md5-ordered deterministic
sample shared with ``ivf_topk`` (functions/sampling.py ``_unit_hash``),
every cosine is rounded BEFORE its rank window, and every centroid
coordinate is rounded after the mean and after re-normalization
(round-before-rank, SURVEY.md §4 X15) — so the whole iteration is
engine-portable and hash-exact against an unrolled SQL oracle
(``__spark_entry__.py`` generates it from the same constants).

Semantics (documented precisely because the oracle unrolls them):

1. inputs are L2-normalized; zero-norm / NULL vectors are dropped
   (cosine undefined — same rule as ``ann``); mixed vector dimensions
   are rejected with a loud ``ValueError``.
2. ``centroids_0`` = md5-ordered sample of k VALID unit vectors (the
   sample is taken after the zero-norm/NULL filter, so all k init slots
   are real), coordinates rounded to ``cent_decimals``.
3. each iteration: assign every vector to the centroid with the highest
   rounded dot product (ties -> lowest ``cent_id``); new centroid =
   per-coordinate mean of its members rounded to ``cent_decimals``,
   then re-normalized and rounded again.  A cluster with no members
   (or a zero-norm mean) keeps its previous centroid.
4. output = the assignment against the FINAL centroids:
   ``(id_col, cluster int, score double)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from entitymatchingmodel_spark.operators.ann import (
    _dot,
    _l2_normalize,
    _maybe_round,
    _nearest_centroids,
)
from entitymatchingmodel_spark.operators.dedup import _iter_checkpoint


def _round_vec(c: Column, decimals: int | None) -> Column:
    if decimals is None:
        return c
    return F.transform(c, lambda x: F.round(x, decimals))


def _unit_frame(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return _l2_normalize(
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")), "_v"
    ).filter(F.col("_v").isNotNull())


def _init_centroids(
    un: DataFrame, k: int, seed: int, cent_decimals: int | None
) -> DataFrame:
    """md5-ordered deterministic sample of k VALID unit vectors.

    Unlike ``ann._build_centroids`` (which hash-ranks the raw corpus, so a
    zero-norm row in the sample becomes a dead NULL centroid — harmless
    for IVF bucket pruning, pinned by its oracle), k-means samples AFTER
    the zero-norm/NULL filter: every one of the k init slots is a real
    centroid, so junk embeddings can never silently reduce k."""
    from entitymatchingmodel_spark.functions.sampling import _unit_hash

    wc = Window.orderBy(F.col("_h"), F.col("_id"))
    return (
        un.withColumn("_h", _unit_hash(F.col("_id"), f"km{seed}"))
        .orderBy("_h", "_id")
        .limit(k)
        .withColumn("cent_id", F.row_number().over(wc) - 1)
        .select("cent_id", _round_vec(F.col("_v"), cent_decimals).alias("_cent"))
    )


def _lloyd_update(
    un: DataFrame,
    cents: DataFrame,
    dim: int,
    score_decimals: int | None,
    cent_decimals: int | None,
) -> DataFrame:
    """One Lloyd step: assign -> per-coordinate mean -> renormalize.

    The mean is ``dim`` independent ``avg(get(_v, i))`` aggregates in ONE
    ``groupBy(cluster)`` — a single map-side-combined shuffle carrying k
    rows per input partition, instead of the posexplode formulation's
    n*dim exploded rows plus a second shuffle to re-assemble the vector.
    Inputs are guaranteed uniform-dimension by :func:`kmeans_fit`'s
    fail-fast check (mixed dimensions would NULL-poison the dot products
    and silently freeze centroids).

    Empty clusters (and zero-norm means) keep the previous centroid, so
    the centroid table stays exactly k rows every iteration.
    """
    assigned = _nearest_centroids(un, cents, "_id", "_v", 1, "cluster", score_decimals)
    mvec = assigned.groupBy("cluster").agg(
        F.array(
            *[
                _maybe_round(F.avg(F.get(F.col("_v"), i)), cent_decimals)
                for i in range(dim)
            ]
        ).alias("_m")
    )
    return (
        cents.join(mvec.withColumnRenamed("cluster", "cent_id"), "cent_id", "left")
        # stage the squared norm once; a nested norm inside transform()
        # would re-evaluate per element
        .withColumn("_n2", _dot(F.col("_m"), F.col("_m")))
        .select(
            "cent_id",
            F.coalesce(
                F.when(
                    F.col("_n2") > 0,
                    _round_vec(
                        F.transform(F.col("_m"), lambda x: x / F.sqrt(F.col("_n2"))),
                        cent_decimals,
                    ),
                ),
                F.col("_cent"),
            ).alias("_cent"),
        )
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iter: int = 2,
    seed: int = 42,
    score_decimals: int | None = None,
    cent_decimals: int | None = None,
    persist_handles: list | None = None,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Fit spherical k-means; return the final ``(cent_id, _cent)`` table.

    ``reliable_checkpoint=True`` snapshots each iteration's centroids to
    the session's fault-tolerant checkpoint dir instead of executor-local
    storage (the same cluster-grade option as ``dedup.dup_clusters``) —
    with ``localCheckpoint`` a lost executor kills the lineage-truncated
    plan; requires ``setCheckpointDir`` first.

    The returned table is ``localCheckpoint``-ed (k rows, materialized) —
    reuse it across many :func:`kmeans_assign` calls without re-running
    the iterations.  The unit-normalized input is cached for the fit's
    own lifetime and released on return; pass ``persist_handles``
    (module-wide convention) to instead keep it cached for a following
    assignment pass and release it with the rest of the job's handles.
    """
    # The unit frame is scanned n_iter + 2 times inside this function (dim
    # probe, init sample, one assignment per iteration), and everything
    # that outlives the function is localCheckpoint-ed — so the cache's
    # scope can be the fit itself: persist always, release before return
    # unless the caller asked to hold it (persist_handles) for reuse by a
    # following assignment pass.
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    un = _unit_frame(df, id_col, vec_col).persist()
    if persist_handles is not None:
        persist_handles.append(un)
    try:
        # bounded driver action (two scalars): the vector dimension fixes
        # how many per-index avg aggregates each Lloyd shuffle carries,
        # and mixed dimensions fail fast — a ragged corpus would
        # NULL-poison zip_with dot products and silently freeze centroids
        dim_row = un.agg(
            F.max(F.size("_v")).alias("d"), F.min(F.size("_v")).alias("d0")
        ).first()
        if dim_row["d"] is None:
            raise ValueError(
                "no valid (non-NULL, non-zero-norm) vectors to cluster"
            )
        if dim_row["d"] != dim_row["d0"]:
            raise ValueError(
                f"mixed vector dimensions ({dim_row['d0']} and {dim_row['d']}); "
                "k-means requires a uniform-dimension embedding column"
            )
        dim = int(dim_row["d"])
        cents = _init_centroids(un, k, seed, cent_decimals)
        if n_iter == 0:
            # keep the documented invariant: the returned table is always
            # materialized + lineage-truncated
            return _iter_checkpoint(cents, reliable_checkpoint)
        for _ in range(n_iter):
            cents = _iter_checkpoint(
                _lloyd_update(un, cents, dim, score_decimals, cent_decimals),
                reliable_checkpoint,
            )
        return cents
    finally:
        if persist_handles is None:
            un.unpersist()


def kmeans_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    score_decimals: int | None = None,
) -> DataFrame:
    """Assign every vector to its nearest centroid:
    ``(id_col, cluster int, score double)``.  ``centroids`` is a
    ``(cent_id, _cent)`` table from :func:`kmeans_fit` (unit vectors)."""
    un = _unit_frame(df, id_col, vec_col)
    out = _nearest_centroids(
        un, centroids, "_id", "_v", 1, "cluster", score_decimals, score_col="score"
    )
    return out.select(
        F.col("_id").alias(id_col),
        F.col("cluster").cast("int").alias("cluster"),
        F.col("score").cast("double").alias("score"),
    )


def kmeans_clusters(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iter: int = 2,
    seed: int = 42,
    score_decimals: int | None = None,
    cent_decimals: int | None = None,
    persist_handles: list | None = None,
) -> DataFrame:
    """One-call fit + assign: ``(id_col, cluster int, score double)``.

    ``score`` is the (rounded) cosine of the row against its final
    centroid.  Zero-norm / NULL vectors are dropped.  See the module
    docstring for the exact iteration semantics and the scale shape.
    """
    cents = kmeans_fit(
        df, id_col, vec_col, k, n_iter, seed,
        score_decimals, cent_decimals, persist_handles,
    )
    return kmeans_assign(df, cents, id_col, vec_col, score_decimals)


def kmeans_assign_streaming(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    score_decimals: int | None = None,
) -> DataFrame:
    """Stateless streaming twin of :func:`kmeans_assign` — the embedding
    router for an ingest pipeline (assign each arriving document's
    embedding to its training-data cluster, then filter/route/cap
    downstream).

    The k-row centroid table is collected ONCE into a literal
    array-of-structs expression (bounded driver materialization — a
    model artifact, the same posture as ``cosine_topk``'s query matrix),
    so assignment becomes a pure per-row projection: no join, no window,
    no state — legal in ANY streaming plan, no watermark required, and
    usable on batch frames too (pinned equal to :func:`kmeans_assign`
    in tests).  Ties break to the lowest ``cent_id``, zero-norm / NULL
    vectors are dropped — identical semantics to the batch path.
    """
    rows = centroids.select("cent_id", "_cent").orderBy("cent_id").collect()
    if not rows:
        raise ValueError("empty centroid table")
    un = _unit_frame(df, id_col, vec_col)
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(int(r["cent_id"])).alias("c"),
                F.array(*[F.lit(float(x)) for x in r["_cent"]]).alias("v"),
            )
            for r in rows
        ]
    )
    # argmax via array_max over (score, -cent_id) structs: struct order
    # compares fields left to right, so the highest score wins and a tie
    # falls to the HIGHEST -c = lowest cent_id — the batch window's
    # exact tie rule
    scored = F.array_max(
        F.transform(
            cent_arr,
            lambda s: F.struct(
                _maybe_round(_dot(F.col("_v"), s["v"]), score_decimals).alias(
                    "score"
                ),
                (-s["c"]).alias("nc"),
            ),
        )
    )
    return un.select(
        F.col("_id").alias(id_col),
        (-scored["nc"]).cast("int").alias("cluster"),
        scored["score"].cast("double").alias("score"),
    )


def cluster_balanced_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iter: int = 2,
    max_per_cluster: int = 1000,
    seed: int = 42,
    score_decimals: int | None = None,
    cent_decimals: int | None = None,
    salt: str = "cap",
    validate: bool = False,
    persist_handles: list | None = None,
) -> DataFrame:
    """ClusterClip / D4-style semantic rebalancing: spherical k-means over
    the embedding column, then keep at most ``max_per_cluster`` rows per
    cluster (deterministic hash-rank membership) — caps over-dense
    semantic regions of a corpus without touching the long tail, the
    embedding-space twin of the per-domain :func:`...sampling.per_group_cap`.

    Pure composition of two already-exact primitives, so it inherits both
    scale shapes: one corpus scan + bounded shuffle per Lloyd iteration,
    then the skew-proof two-phase cap rank on the cluster id.  Output =
    ``(id_col, cluster int, score double)`` for the kept rows.

    ``id_col`` must be UNIQUE for a stable cap boundary (same contract as
    ``per_group_cap``); ``validate=True`` enforces it with one extra
    aggregate.
    """
    from entitymatchingmodel_spark.functions.sampling import per_group_cap

    clusters = kmeans_clusters(
        df, id_col, vec_col, k, n_iter, seed,
        score_decimals, cent_decimals, persist_handles,
    )
    return per_group_cap(
        clusters, id_col, "cluster", max_per_cluster, salt=salt,
        validate=validate,
    )


class KMeansModel:
    """Fit-once / assign-many spherical k-means with ``save``/``load`` —
    the production ingest posture: fit weekly on the curated corpus,
    persist the centroid table, and route every arriving batch/stream
    through :meth:`assign` / :meth:`assign_streaming` in a FRESH session
    without refitting (the round-7 streaming router could only run in
    the fitting session).

    Same persistence layout as ``ann.IVFIndex.save/load`` (parquet +
    1-row meta.json; reference precedent for model side-files:
    emm/helper/spark_custom_reader_writer.py:36-140): the saved state is
    the k-row ``(cent_id, _cent)`` table plus the fit parameters, so a
    reload is one tiny parquet scan — no corpus access.  ``load`` output
    is pinned byte-identical to the fitting session's assignments in
    tests/test_clustering.py (centroid coordinates are rounded doubles;
    parquet round-trips them exactly).
    """

    def __init__(
        self,
        centroids: DataFrame,
        k: int,
        n_iter: int,
        seed: int,
        score_decimals: int | None,
        cent_decimals: int | None,
    ):
        self.centroids = centroids
        self.k = k
        self.n_iter = n_iter
        self.seed = seed
        self.score_decimals = score_decimals
        self.cent_decimals = cent_decimals

    @classmethod
    def fit(
        cls,
        df: DataFrame,
        id_col: str,
        vec_col: str,
        k: int = 8,
        n_iter: int = 2,
        seed: int = 42,
        score_decimals: int | None = None,
        cent_decimals: int | None = None,
        persist_handles: list | None = None,
        reliable_checkpoint: bool = False,
    ) -> "KMeansModel":
        """:func:`kmeans_fit` wrapped into a persistable model; the
        centroid table it holds is the fit's localCheckpoint-ed output
        (k rows, materialized), so constructing the model adds no work."""
        cents = kmeans_fit(
            df, id_col, vec_col, k, n_iter, seed,
            score_decimals, cent_decimals, persist_handles,
            reliable_checkpoint,
        )
        return cls(cents, k, n_iter, seed, score_decimals, cent_decimals)

    def assign(self, df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        return kmeans_assign(
            df, self.centroids, id_col, vec_col, self.score_decimals
        )

    def assign_streaming(self, df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        return kmeans_assign_streaming(
            df, self.centroids, id_col, vec_col, self.score_decimals
        )

    def save(self, path: str) -> None:
        """k-row centroid table + fit params under ``path`` (any Hadoop
        scheme Spark supports).  coalesce(1): k centroid rows never need
        more than one file."""
        import json

        spark = self.centroids.sparkSession
        self.centroids.coalesce(1).write.mode("overwrite").parquet(
            f"{path}/centroids.parquet"
        )
        meta = json.dumps(
            {
                "k": self.k,
                "n_iter": self.n_iter,
                "seed": self.seed,
                "score_decimals": self.score_decimals,
                "cent_decimals": self.cent_decimals,
            }
        )
        from entitymatchingmodel_spark.session import write_meta_json

        write_meta_json(spark, f"{path}/meta.json", meta)

    @classmethod
    def load(
        cls, spark, path: str, persist_handles: list | None = None
    ) -> "KMeansModel":
        """Reload; the k-row centroid table is persisted (it sits under
        every assignment join) — release it via :meth:`unpersist` or the
        ``persist_handles`` convention."""
        import json

        meta = json.loads(spark.read.json(f"{path}/meta.json").head()["meta"])
        cents = spark.read.parquet(f"{path}/centroids.parquet").persist()
        if persist_handles is not None:
            persist_handles.append(cents)
        return cls(
            cents,
            int(meta["k"]),
            int(meta["n_iter"]),
            int(meta["seed"]),
            None if meta["score_decimals"] is None else int(meta["score_decimals"]),
            None if meta["cent_decimals"] is None else int(meta["cent_decimals"]),
        )

    def unpersist(self) -> None:
        self.centroids.unpersist()
