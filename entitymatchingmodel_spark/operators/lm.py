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


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, native slice+zip."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("w1"), F.slice(toks, 2, n - 1).alias("w2")
    )
    return (
        df.select(F.col(id_col), F.when(n >= 2, pairs).alias("_ps"))
        .select(id_col, F.explode("_ps").alias("_p"))
        .select(id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )


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
    rb = _bigrams(ref, id_col, rtext).select("w1", "w2")
    c12 = rb.groupBy("w1", "w2").agg(F.count("*").alias("_c12"))
    c1 = rb.groupBy("w1").agg(F.count("*").alias("_c1"))
    # vocabulary of the reference (all tokens, incl. sentence-final ones):
    # ONE bounded scalar to the driver — the Laplace denominator
    v_row = (
        ref.select(F.explode(tokens(F.col(rtext))).alias("_w"))
        .agg(F.countDistinct("_w").alias("v"))
        .first()
    )
    vocab = int(v_row["v"] or 0)
    if vocab == 0:
        raise ValueError("reference corpus has no tokens to train on")

    db = _bigrams(docs, id_col, text_col)
    a = float(smoothing)
    p = (F.coalesce(F.col("_c12"), F.lit(0)) + F.lit(a)) / (
        F.coalesce(F.col("_c1"), F.lit(0)) + F.lit(a * vocab)
    )
    scored = (
        db.join(c1, "w1", "left")
        .join(c12, ["w1", "w2"], "left")
        .select(id_col, F.log2(p).alias("_lp"))
    )
    rounder = (lambda c: F.round(c, score_decimals)) if score_decimals is not None else (lambda c: c)
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"), rounder(F.avg("_lp")).alias("avg_logp")
    )
    # LEFT join back so <2-token / NULL-text docs keep their row (all-NULL
    # scores, n_bigrams 0)
    out = docs.select(id_col).join(per_doc, id_col, "left")
    return out.select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.col("avg_logp"),
        rounder(F.pow(F.lit(2.0), -F.col("avg_logp"))).alias("perplexity"),
    )
