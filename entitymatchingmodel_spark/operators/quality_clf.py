"""fastText-style quality classifier — the discriminative curation filter.

The GPT-3 / LLaMA / PaLM pipelines filter CommonCrawl with a linear
classifier trained to separate a high-quality TARGET corpus (WebText /
Wikipedia / books) from the raw crawl, then keep a crawl document when
its quality score clears a noisy threshold (GPT-3, Brown et al. 2020
§A: keep iff ``score > 1 - X`` with ``X ~ Pareto(alpha=9)`` — the noise
re-admits a long tail of low-scoring documents so the kept corpus is
not a hard cliff).  This module is that recipe, Spark-native:

- **featurize**: lowercase ``[^a-z0-9]+`` uni+bi-grams (the corpus-wide
  DSIR/LM token convention) -> ``HashingTF`` (JVM murmur hashing into a
  fixed-width sparse vector; no vocabulary state, so transform needs no
  fitted dictionary and never shuffles);
- **fit**: ``pyspark.ml`` LogisticRegression on target-vs-raw labels —
  one JVM L-BFGS job, nothing collected to the driver beyond the
  coefficient vector (bounded by ``n_features``);
- **score**: the fitted model's JVM transform — a map-only projection
  of ``P(target | doc)``;
- **select**: :func:`pareto_keep` — the GPT-3 threshold rule with the
  Pareto noise made DETERMINISTIC via the md5 unit hash (inverse-CDF
  sampling), so the kept subset is reproducible across runs, engines,
  and partitionings, exactly like every sampler in
  ``functions.sampling``.

Like the entity-matching GBT layer (operators/supervised.py), the
learned scores have no SQL oracle — the contract row for this operator
is rows-only with schema and quality-threshold pins in tests; the
DETERMINISTIC half (:func:`pareto_keep`) is a pure expression any
engine reproduces.  DSIR (functions/selection.py) is the generative
twin of this filter: same task, hash-exact scores, no training loop —
prefer it when oracle-exactness matters more than discriminative power.

No reference counterpart (beyond-reference surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from entitymatchingmodel_spark.functions.selection import _ascii_tokens
from entitymatchingmodel_spark.functions.text import _word_ngrams


def _gram_array(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """df + ``_grams array<string>`` of uni+bi-grams (never NULL — empty
    array for gramless docs), as a PURE PER-ROW projection over the same
    tokenizer the DSIR gram builder uses (``_ascii_tokens`` +
    ``_word_ngrams`` — the exact multiset ``selection._grams`` explodes).

    Per-row on purpose: an earlier id-keyed
    explode->groupBy->collect_list->join formulation merged gram lists
    across ROWS that share an id, so fitting with overlapping
    target/raw ids — the documented GPT-3 framing, where the target
    corpus is a SLICE of the raw crawl — attached a doubled gram list
    to both the label-1 and the label-0 copy of every overlapping doc,
    a label-correlated 2x term-frequency artifact under
    ``HashingTF(binary=False)``.  The per-row expression keys on
    nothing, so duplicate or colliding ids cannot cross-contaminate —
    and it drops two shuffles (the rollup + the rejoin) from both the
    fit and every score call.  ``id_col`` stays in the signature for
    the fit/score call sites, which validate it exists."""
    if id_col not in df.columns:
        raise ValueError(f"id column {id_col!r} not in {df.columns}")
    toks = _ascii_tokens(F.col(text_col))
    both = F.concat(toks, F.coalesce(_word_ngrams(toks, 2), F.array()))
    return df.withColumn(
        "_grams", F.coalesce(both, F.array().cast("array<string>"))
    )


class QualityClassifier:
    """Fit-once / score-many quality classifier with persistence.

    ``fit`` trains target-vs-raw; ``score`` adds ``quality_prob``;
    ``save``/``load`` round-trip through Spark ML's native writers plus
    a JSON meta sidecar (the KMeansModel/BigramLM persistence idiom).
    """

    def __init__(self, model, n_features: int):
        self.model = model
        self.n_features = int(n_features)

    # -- fit ------------------------------------------------------------
    @classmethod
    def fit(
        cls,
        target: DataFrame,
        raw: DataFrame,
        id_col: str,
        text_col: str,
        n_features: int = 1 << 18,
        reg_param: float = 1e-4,
        max_iter: int = 50,
        max_raw_ratio: float = 2.0,
        salt: str = "qclf",
    ) -> "QualityClassifier":
        """Train ``P(target | doc)`` on ``target`` (label 1) vs ``raw``
        (label 0).  ``raw`` is deterministically hash-downsampled to at
        most ``max_raw_ratio`` x the target count (one bounded count
        aggregate each) so a 1000:1 crawl/target imbalance cannot drown
        the positive class — the GPT-3 recipe trains on a balanced-ish
        mix.  The feature space is a fixed ``n_features``-wide hash, so
        fitting state is one coefficient vector, never a vocabulary.
        """
        if n_features < 2:
            raise ValueError("n_features must be >= 2")
        if max_raw_ratio <= 0:
            raise ValueError("max_raw_ratio must be > 0")
        n_t = target.count()
        if n_t == 0:
            raise ValueError("target corpus is empty")
        n_r = raw.count()
        keep_frac = min(1.0, max_raw_ratio * n_t / max(n_r, 1))
        if keep_frac < 1.0:
            from entitymatchingmodel_spark.functions.sampling import (
                deterministic_sample,
            )

            raw = deterministic_sample(raw, id_col, keep_frac, salt=salt)
        lab = target.select(
            F.col(id_col), F.col(text_col), F.lit(1.0).alias("label")
        ).unionByName(
            raw.select(F.col(id_col), F.col(text_col), F.lit(0.0).alias("label"))
        )
        feats = cls._featurize(
            _gram_array(lab, id_col, text_col), n_features
        ).select("label", "features")
        # Size partitions to the training set (the supervised.py GBT
        # idiom, r11): L-BFGS runs one treeAggregate per iteration, so a
        # small corpus spread over the session's full width pays
        # iterations x near-empty-task scheduling — measured ~2s of the
        # 4.4s contract-row fit at sf0.1 (25k rows, 32 partitions, 20
        # iterations).  The training size is already known from the
        # class-balance counts — no extra action.  ~100k rows/partition
        # keeps cluster-scale fits at full width.
        n_train = n_t + min(n_r, int(max_raw_ratio * n_t))
        sc_parallelism = feats.rdd.getNumPartitions()
        target_parts = max(2, min(sc_parallelism, n_train // 100_000 + 2))
        if target_parts < sc_parallelism:
            feats = feats.coalesce(target_parts)

        from pyspark.ml.classification import LogisticRegression

        lr = LogisticRegression(
            featuresCol="features",
            labelCol="label",
            regParam=float(reg_param),
            maxIter=int(max_iter),
            standardization=False,
        )
        return cls(lr.fit(feats), n_features)

    @staticmethod
    def _featurize(df: DataFrame, n_features: int) -> DataFrame:
        from pyspark.ml.feature import HashingTF

        tf = HashingTF(
            inputCol="_grams", outputCol="features",
            numFeatures=int(n_features), binary=False,
        )
        return tf.transform(df)

    # -- score ----------------------------------------------------------
    def score(self, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """``df`` + ``quality_prob double`` = P(target | doc).  One gram
        rollup + the JVM model transform; no driver state, no UDFs.
        Gramless docs score the model's intercept-only probability (an
        empty feature vector), kept rather than dropped — thresholding
        is selection policy (:func:`pareto_keep`), not the scorer's."""
        clash = {"quality_prob"} & set(df.columns)
        if clash:
            raise ValueError(f"score adds columns {sorted(clash)}; rename them")
        feats = self._featurize(
            _gram_array(df, id_col, text_col), self.n_features
        )
        scored = self.model.transform(feats)
        # probability is a VectorUDT; element 1 = P(label=1).  vector_to_array
        # is the JVM-native unpack (no python UDF).
        from pyspark.ml.functions import vector_to_array

        return scored.withColumn(
            "quality_prob",
            F.round(vector_to_array(F.col("probability"))[1], 6),
        ).drop("_grams", "features", "rawPrediction", "probability", "prediction")

    # -- persistence ------------------------------------------------------
    def save(self, spark, path: str) -> None:
        """Spark-ML native writer for the LR model + a 1-row meta.json
        side-file (the write_meta_json range(1)+lit idiom — a
        LocalRelation write stalls multi-seconds per call in local
        mode)."""
        import json

        from entitymatchingmodel_spark.session import write_meta_json

        self.model.write().overwrite().save(f"{path}/lr")
        write_meta_json(
            spark,
            f"{path}/meta.json",
            json.dumps({"n_features": self.n_features, "kind": "quality_clf"}),
        )

    @classmethod
    def load(cls, spark, path: str) -> "QualityClassifier":
        import json

        from pyspark.ml.classification import LogisticRegressionModel

        meta = json.loads(spark.read.json(f"{path}/meta.json").head()["meta"])
        if meta.get("kind") != "quality_clf":
            raise ValueError(f"{path}/meta.json is not a QualityClassifier save")
        return cls(
            LogisticRegressionModel.load(f"{path}/lr"), int(meta["n_features"])
        )


def pareto_keep(
    scores: DataFrame,
    id_col: str,
    score_col: str = "quality_prob",
    alpha: float = 9.0,
    salt: str = "pareto",
) -> DataFrame:
    """GPT-3's noisy quality threshold (Brown et al. 2020 §A), made
    deterministic: keep a document iff ``score > 1 - x`` where ``x`` is
    a Pareto(``alpha``)-distributed draw derived from the md5 unit hash
    by inverse-CDF sampling (``x = (1-u)^(-1/alpha) - 1`` — the Lomax
    form numpy's ``random.pareto`` uses).  High scores always survive;
    low scores survive with probability that decays polynomially — the
    soft cliff that keeps the kept corpus diverse.  Map-only expression
    (one pow per row), reproducible across engines — the selection half
    of the classifier IS oracle-checkable even though the scores are
    not.  NULL scores drop (no evidence).

    The comparison is quantized to integer MICRO-UNITS on both sides
    (``round(v * 1e6)`` — the fixed-precision idiom every sampler oracle
    uses): engine scores land on the 6dp grid already (``score`` rounds
    its output), and ``pow`` differs between libm implementations by a
    few ulp, so an UNQUANTIZED threshold could flip a score sitting
    within a ulp of it between Spark and an oracle engine.  After
    quantization the engines disagree only if their ``pow`` results
    straddle a 0.5-micro-unit rounding boundary — a ~1e-10-wide window
    vs pow's ~1e-16 relative error; tests/test_quality_clf.py measures
    the actual distance of every threshold in the test corpora to the
    nearest boundary and pins the margin."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    from entitymatchingmodel_spark.functions.sampling import _unit_hash

    u = _unit_hash(F.col(id_col), salt)
    return scores.filter(
        _quality_threshold_expr(F.col(score_col), alpha, u)
    )


def _quality_threshold_expr(score: Column, alpha: float, u: Column) -> Column:
    """Internal: the micro-unit keep predicate given a precomputed
    uniform (exposed for tests that re-derive the draw with hashlib)."""
    x = F.pow(F.lit(1.0) - u, F.lit(-1.0 / float(alpha))) - F.lit(1.0)
    thr_micro = F.round((F.lit(1.0) - x) * F.lit(1e6)).cast("long")
    return F.round(score * F.lit(1e6)).cast("long") > thr_micro
