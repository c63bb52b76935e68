"""N-gram language-model quality scoring (CCNet-style).

CCNet/RedPajama-class pipelines score every document by the perplexity
of a small LM trained on a clean reference corpus and keep the
low-perplexity tail.  This module is that primitive with the LM kept
inside Spark: a Laplace-smoothed BIGRAM model trained as two aggregates
over the reference, applied to the scored corpus as two equi-joins —
no driver-side model object, no UDFs.

The reference engine (ing-bank/EntityMatchingModel) has no LM scoring;
this is part of the beyond-reference LLM-pipeline surface (same family
as functions/text.quality_score, which it complements: that one is
rule-based, this one is corpus-relative).

Scale shape:

- **train**: one shuffle for bigram counts ``c(w1,w2)`` and one for
  context counts ``c(w1)`` — both map-side combined, output bounded by
  vocabulary size, not corpus size.  The vocabulary size ``V`` (Laplace
  denominator) is ONE scalar to the driver (the bounded-sizing posture
  of exact_quantiles / countApprox).
- **score**: explode the scored corpus's bigrams once, left-join the two
  count tables (w1 join then (w1, w2) join; hot contexts like "the" are
  exactly the skew AQE's skew-join handles), then one per-doc aggregate.
  Unseen bigrams and unseen contexts fall back to the smoothed floor —
  a LEFT join, never a dropped row.

Determinism / oracle: probabilities are pure arithmetic over integer
counts; the only float-order dependence is the per-doc sum of log2
probabilities, so the per-doc average is rounded BEFORE anything ranks
or derives from it (round-before-rank, SURVEY §4 X15) and perplexity is
computed FROM the rounded average — both engines land on identical
doubles.

Semantics: tokens are ``functions.text.tokens`` (lowercased
``[^a-z0-9]+`` split — the corpus-wide convention all text oracles
mirror); documents with fewer than 2 tokens (or NULL text) keep their
row with ``n_bigrams = 0`` and NULL scores (the all-NULL convention of
``remove_duplicate_passages``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entitymatchingmodel_spark.functions.text import tokens


def _pairs_expr(text_col: str):
    """Array-of-(w1,w2)-structs expression over a text column (NULL when
    the text has fewer than 2 tokens) — native slice+zip, no UDF."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("w1"), F.slice(toks, 2, n - 1).alias("w2")
    )
    return F.when(n >= 2, pairs)


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, native slice+zip."""
    return (
        df.select(F.col(id_col), _pairs_expr(text_col).alias("_ps"))
        .select(id_col, F.explode("_ps").alias("_p"))
        .select(id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )


class BigramLM:
    """Fit-once / score-many Laplace-smoothed bigram LM with
    ``save``/``load`` — the CCNet posture proper: *train on the clean
    reference corpus once, score every crawl batch against it*.  The
    one-call :func:`bigram_lm_scores` (which delegates here) retrains
    the counts on every invocation; a production pipeline fits weekly
    and applies daily, so the trained state — the two count tables and
    the vocabulary-size scalar — must out-live the fitting session.

    Persistence layout mirrors the other fitted models
    (``ann.IVFIndex``, ``clustering.KMeansModel``; reference precedent
    emm/helper/spark_custom_reader_writer.py:36-140): ``c1.parquet`` +
    ``c12.parquet`` side-files and a 1-row ``meta.json`` carrying
    ``vocab``/``smoothing``/``score_decimals``.  Counts are integers and
    parquet round-trips them exactly, so a loaded model's scores are
    byte-identical to the fitting session's (pinned in tests/test_lm.py).

    Scale shape: fit = the two map-side-combined count shuffles (output
    bounded by vocabulary, not corpus); score = two left equi-joins +
    one per-doc aggregate, exactly :func:`bigram_lm_scores`'s scoring
    half.  Driver state = ONE integer (V).
    """

    def __init__(
        self,
        c1: DataFrame,
        c12: DataFrame,
        vocab: int,
        smoothing: float = 1.0,
        score_decimals: int | None = None,
    ):
        if smoothing <= 0:
            raise ValueError("smoothing must be > 0 (Laplace)")
        if vocab <= 0:
            raise ValueError("vocab must be > 0")
        self.c1 = c1
        self.c12 = c12
        self.vocab = int(vocab)
        self.smoothing = float(smoothing)
        self.score_decimals = score_decimals

    @classmethod
    def fit(
        cls,
        reference: DataFrame,
        text_col: str,
        smoothing: float = 1.0,
        score_decimals: int | None = None,
        persist_handles: list | None = None,
    ) -> "BigramLM":
        """Train on ``reference[text_col]`` (no id column required).

        The two count tables are persisted by default — they sit under
        every future :meth:`score` — and released via :meth:`unpersist`
        or the module-wide ``persist_handles`` convention."""
        if smoothing <= 0:
            raise ValueError("smoothing must be > 0 (Laplace)")
        rb = (
            reference.select(_pairs_expr(text_col).alias("_ps"))
            .select(F.explode("_ps").alias("_p"))
            .select(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
        )
        c12 = rb.groupBy("w1", "w2").agg(F.count("*").alias("_c12")).persist()
        # c(w1) = sum over w2 of c(w1, w2) EXACTLY (integer sums), so the
        # context counts roll up from the bigram table instead of paying a
        # second full tokenize+explode pass over the reference corpus
        # (r11 optimization, guide §2.3 aggregate-before-you-shuffle: the
        # input here is the vocabulary-bounded count table, not the
        # corpus).  The persisted c12 also makes this rollup read cached
        # data on every future action.
        c1 = c12.groupBy("w1").agg(F.sum("_c12").alias("_c1")).persist()
        if persist_handles is not None:
            persist_handles.extend([c12, c1])
        # vocabulary of the reference (all tokens, incl. sentence-final
        # ones): ONE bounded scalar to the driver — the Laplace denominator
        v_row = (
            reference.select(F.explode(tokens(F.col(text_col))).alias("_w"))
            .agg(F.countDistinct("_w").alias("v"))
            .first()
        )
        vocab = int(v_row["v"] or 0)
        if vocab == 0:
            raise ValueError("reference corpus has no tokens to train on")
        return cls(c1, c12, vocab, smoothing, score_decimals)

    def score(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """``(id_col, n_bigrams, avg_logp, perplexity)`` — see
        :func:`bigram_lm_scores` for the exact semantics (unseen bigrams
        and contexts fall back to the smoothed floor via LEFT joins;
        <2-token / NULL-text docs keep their row with all-NULL scores)."""
        db = _bigrams(docs, id_col, text_col)
        a = self.smoothing
        p = (F.coalesce(F.col("_c12"), F.lit(0)) + F.lit(a)) / (
            F.coalesce(F.col("_c1"), F.lit(0)) + F.lit(a * self.vocab)
        )
        scored = (
            db.join(self.c1, "w1", "left")
            .join(self.c12, ["w1", "w2"], "left")
            .select(id_col, F.log2(p).alias("_lp"))
        )
        sd = self.score_decimals
        rounder = (lambda c: F.round(c, sd)) if sd is not None else (lambda c: c)
        per_doc = scored.groupBy(id_col).agg(
            F.count("*").alias("n_bigrams"), rounder(F.avg("_lp")).alias("avg_logp")
        )
        out = docs.select(id_col).join(per_doc, id_col, "left")
        return out.select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.col("avg_logp"),
            rounder(F.pow(F.lit(2.0), -F.col("avg_logp"))).alias("perplexity"),
        )

    def score_rowwise(
        self,
        df: DataFrame,
        text_col: str,
        max_model_rows: int = 5_000_000,
    ) -> DataFrame:
        """STATELESS per-row scoring: ``df`` plus ``n_bigrams`` /
        ``avg_logp`` / ``perplexity`` columns, computed inside one
        Arrow-batched pandas UDF against BROADCAST count dicts — no
        explode, no join, no aggregation.  This is the STREAMING shape of
        :meth:`score`: the batch path's per-doc groupBy is a streaming
        aggregation (append mode would stall on the watermark), while a
        pure projection composes with any downstream stateful stage —
        CCNet's keep-the-head gate applied ON INGEST.

        Parity with :meth:`score`: same Laplace formula over the same
        counts; tokens follow the corpus-wide oracle convention
        (lowercased ``[^a-z0-9]+`` split — identical to the JVM tokenizer
        on ASCII text, the documented convention all text oracles
        mirror); the per-doc mean is rounded with the same
        shortest-repr/HALF_UP rule as Spark's ``round`` before perplexity
        derives from it, so rounded scores are pinned equal to the batch
        path (tests/test_lm.py, tests/test_streaming.py).

        The guard: both count tables are collected to the driver and
        broadcast — bounded by VOCABULARY, not corpus, but a web-scale
        bigram table can still be large, so ``max_model_rows`` fails fast
        with a pointer to batch :meth:`score` (the
        embed_near_pairs/max_collect_rows idiom).
        """
        n_model = self.c1.count() + self.c12.count()
        if n_model > max_model_rows:
            raise ValueError(
                f"model has {n_model} count rows > max_model_rows="
                f"{max_model_rows}; broadcasting it as python dicts is the "
                "streaming-gate shape for SMALL reference LMs. For large "
                "models score in batch with BigramLM.score() (joins, no "
                "driver state), or raise max_model_rows explicitly."
            )
        d1 = {r["w1"]: r["_c1"] for r in self.c1.collect()}
        d12 = {(r["w1"], r["w2"]): r["_c12"] for r in self.c12.collect()}
        sc = df.sparkSession.sparkContext
        bc1, bc12 = sc.broadcast(d1), sc.broadcast(d12)
        a, vocab, sd = self.smoothing, self.vocab, self.score_decimals

        clash = {"n_bigrams", "avg_logp", "perplexity"} & set(df.columns)
        if clash:
            raise ValueError(f"score_rowwise adds columns {sorted(clash)}; rename them")
        from pyspark.sql.types import DoubleType, LongType, StructField, StructType

        out_schema = StructType(
            list(df.schema.fields)
            + [
                StructField("n_bigrams", LongType()),
                StructField("avg_logp", DoubleType()),
                StructField("perplexity", DoubleType()),
            ]
        )

        def _score_batches(batches):
            import math
            import re
            from decimal import ROUND_HALF_UP, Decimal

            def r_sd(x):
                # Spark round(double, sd): shortest-repr decimal, HALF_UP —
                # Python's repr IS the shortest repr, so this matches
                # BigDecimal.valueOf(x).setScale(sd, HALF_UP) exactly
                if sd is None:
                    return x
                q = Decimal(1).scaleb(-sd)
                return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))

            log2 = math.log(2.0)
            m1, m12 = bc1.value, bc12.value
            for pdf in batches:
                ns, avgs, ppls = [], [], []
                for t in pdf[text_col]:
                    toks = (
                        [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
                        if isinstance(t, str)
                        else []
                    )
                    if len(toks) < 2:
                        ns.append(0)
                        avgs.append(None)
                        ppls.append(None)
                        continue
                    s, n = 0.0, len(toks) - 1
                    for i in range(n):
                        p = (m12.get((toks[i], toks[i + 1]), 0) + a) / (
                            m1.get(toks[i], 0) + a * vocab
                        )
                        s += math.log(p) / log2
                    avg = r_sd(s / n)
                    ns.append(n)
                    avgs.append(avg)
                    ppls.append(r_sd(2.0 ** (-avg)))
                pdf = pdf.copy()
                pdf["n_bigrams"] = ns
                pdf["avg_logp"] = avgs
                pdf["perplexity"] = ppls
                yield pdf

        return df.mapInPandas(_score_batches, out_schema)

    def save(self, path: str) -> None:
        import json

        spark = self.c1.sparkSession
        self.c1.write.mode("overwrite").parquet(f"{path}/c1.parquet")
        self.c12.write.mode("overwrite").parquet(f"{path}/c12.parquet")
        meta = json.dumps(
            {
                "vocab": self.vocab,
                "smoothing": self.smoothing,
                "score_decimals": self.score_decimals,
            }
        )
        from entitymatchingmodel_spark.session import write_meta_json

        write_meta_json(spark, f"{path}/meta.json", meta)

    @classmethod
    def load(
        cls, spark, path: str, persist_handles: list | None = None
    ) -> "BigramLM":
        import json

        meta = json.loads(spark.read.json(f"{path}/meta.json").head()["meta"])
        c1 = spark.read.parquet(f"{path}/c1.parquet").persist()
        c12 = spark.read.parquet(f"{path}/c12.parquet").persist()
        if persist_handles is not None:
            persist_handles.extend([c12, c1])
        return cls(
            c1,
            c12,
            int(meta["vocab"]),
            float(meta["smoothing"]),
            None
            if meta["score_decimals"] is None
            else int(meta["score_decimals"]),
        )

    def unpersist(self) -> None:
        self.c1.unpersist()
        self.c12.unpersist()


def bigram_lm_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    reference: DataFrame | None = None,
    ref_text_col: str | None = None,
    smoothing: float = 1.0,
    score_decimals: int | None = None,
) -> DataFrame:
    """Score every document by a Laplace-smoothed bigram LM:
    ``(id_col, n_bigrams, avg_logp, perplexity)``.

    ``reference`` is the training corpus (CCNet trains on a clean corpus
    and scores the crawl); default is the scored corpus itself
    (self-perplexity — the repetition/garbage signal).  ``avg_logp`` is
    the mean log2 of ``p(w2|w1) = (c(w1,w2) + a) / (c(w1) + a*V)`` over
    the document's bigrams; ``perplexity = 2**(-avg_logp)`` computed from
    the ROUNDED average so both engines agree bit-for-bit.
    """
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (Laplace)")
    ref = docs if reference is None else reference
    rtext = text_col if ref_text_col is None else ref_text_col
    # one-shot path: fit + score in one plan, then drop the fit's count
    # caches before returning — the counts are consumed exactly once, so
    # the unpersisted plan recomputes them in place (identical cost to
    # the pre-split inline formulation) and no cached state outlives the
    # call.  Fit-once/score-many callers use BigramLM directly.
    model = BigramLM.fit(ref, rtext, smoothing, score_decimals)
    out = model.score(docs, id_col, text_col)
    model.unpersist()
    return out


def perplexity_bands(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    model: "BigramLM",
    group_col: str,
    lo_q: float = 1 / 3,
    hi_q: float = 2 / 3,
    persist_handles: list | None = None,
) -> DataFrame:
    """CCNet's head/middle/tail bucketing: score every document with the
    (clean-reference-trained) LM, compute each group's EXACT perplexity
    quantile thresholds at ``lo_q``/``hi_q``, and label rows ``head``
    (lowest-perplexity band — the kept slice), ``middle`` or ``tail``:
    ``(id_col, group_col, perplexity, band)``.  Documents without a
    score (<2 tokens / NULL text) keep their row with a NULL band.

    Pure composition of two exact primitives — :meth:`BigramLM.score`
    and :func:`...stats.grouped_quantiles` — so it inherits both scale
    shapes: the LM joins/aggregate, one distinct-count shuffle for the
    thresholds (zero driver state; group count unbounded), and a
    BROADCAST of the n_groups-row threshold table back onto the scored
    corpus.  Thresholds are SELECTED perplexity values (type-1), so the
    band compare is bit-exact across engines.

    ``persist_handles`` (module-wide convention, r11): when provided, the
    scored per-doc frame is persisted and the handle appended — the frame
    sits under BOTH the quantile-threshold subtree and the final band
    join, so an unpersisted composition evaluates the full LM scoring
    (explode + two count joins + per-doc rollup) twice per execution.
    """
    if not (0.0 <= lo_q < hi_q <= 1.0):
        # strict <: equal quantiles would surface as grouped_quantiles'
        # confusing "duplicate quantiles requested" (round-8 review finding)
        raise ValueError("need 0 <= lo_q < hi_q <= 1 (two distinct thresholds)")
    from entitymatchingmodel_spark.functions.stats import grouped_quantiles

    scored = model.score(docs, id_col, text_col).join(
        docs.select(id_col, group_col), id_col
    )
    if persist_handles is not None:
        scored = scored.persist()
        persist_handles.append(scored)
    qt = grouped_quantiles(scored, group_col, "perplexity", (lo_q, hi_q))
    th = qt.groupBy(group_col).agg(
        F.min(F.when(F.col("q") == float(lo_q), F.col("value"))).alias("_tlo"),
        F.min(F.when(F.col("q") == float(hi_q), F.col("value"))).alias("_thi"),
    )
    out = scored.join(F.broadcast(th), group_col, "left")
    band = (
        F.when(F.col("perplexity").isNull(), F.lit(None).cast("string"))
        .when(F.col("perplexity") <= F.col("_tlo"), F.lit("head"))
        .when(F.col("perplexity") <= F.col("_thi"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return out.select(id_col, group_col, "perplexity", band.alias("band"))
