"""Data selection via importance resampling (DSIR).

Implements the hashed-n-gram importance weighting of Xie et al., "Data
Selection for Language Models via Importance Resampling" (NeurIPS 2023,
arXiv:2302.03169): featurize every document as a bag of hashed uni+bi-grams
over ``n_buckets`` buckets, fit two smoothed multinomials — one on a TARGET
corpus (the distribution you want, e.g. curated/wiki-like text) and one on
the RAW corpus (the crawl you are selecting from) — and score each raw
document by the log importance ratio

    score(d) = sum_{g in grams(d)} [ log p_target(bucket(g))
                                     - log p_raw(bucket(g)) ]

High scores mean "looks like the target distribution"; selection is then a
top-k / threshold / Gumbel resample over the scores (compose with
:func:`~entitymatchingmodel_spark.functions.sampling.per_group_cap` or
``token_budget_sample`` for the budgeted variants).

Scale shape (the whole point of DSIR over classifier-based selection):

- gram construction is a map-only projection per corpus (the corpus-wide
  lowercase ``[^a-z0-9]+`` token convention);
- each multinomial fit is ONE map-side-combined count aggregate whose
  output is bounded by ``n_buckets`` (default 4096 rows — never corpus
  scale), so the ratio table stays broadcast-sized BY CONSTRUCTION;
- totals fold in via a 1-row broadcast anchor join (no driver collect
  anywhere — the fit materializes only the <= n_buckets-row bucket table
  via localCheckpoint, the kmeans_fit idiom, and survives any corpus
  size);
- scoring is gram-explode -> broadcast hash join on the bucket id ->
  ONE per-document sum aggregate.  No shuffle ever carries more than
  (corpus grams -> per-doc rollup), and that one is map-side combined.

Engine-portable exactness: the per-bucket log-ratio is computed in DOUBLE
and immediately quantized to integer MICRO-units (``round(lr * 1e6)`` as
long); per-document scores are integer sums of those micro-units divided
back by 1e6, so the result is independent of summation order (float sums
are not associative; integer sums are) and matches the DuckDB oracle
bit-for-bit.  The bucket hash is md5-based (``conv(substr(md5(g),1,8),16,
10) % n_buckets``) — both engines agree on md5, unlike their native
``hash()`` functions.

No reference counterpart (beyond-reference surface): the reference engine
(ing-bank/EntityMatchingModel) has no data-selection story at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entitymatchingmodel_spark.functions.text import _word_ngrams

MICRO = 1_000_000


def _ascii_tokens(c) -> "F.Column":
    """Lowercase ``[^a-z0-9]+``-split tokens — the corpus-wide ORACLE
    convention, applied HERE ON THE JVM SIDE TOO (not the Unicode
    ``\\p{IsAlphabetic}`` tokenizer the text operators use) so that the
    Spark fit, the Spark batch scorer, the Python rowwise scorer
    (:func:`dsir_scores_rowwise` — ``re.split(r"[^a-z0-9]+")``) and the
    DuckDB oracle produce IDENTICAL grams on ANY input, non-ASCII
    included: accented characters are separators everywhere instead of
    tokens on one side and separators on the other.  (A review caught the
    asymmetric version mis-scoring non-ASCII text in the streaming gate;
    the pinned ASCII residue convention is the fix — the same posture as
    BigramLM.score_rowwise and every text oracle.)"""
    return F.array_remove(F.split(F.lower(F.coalesce(c, F.lit(""))), "[^a-z0-9]+"), "")


def _grams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, gram) — one row per unigram AND space-joined bigram occurrence;
    zero-gram documents survive as one ``(id, NULL)`` row so downstream
    aggregates see every document.

    One map-only projection: both n-gram orders are built from a single
    token array and exploded together (no self-union, so the text is
    tokenized once, not twice).
    """
    toks = _ascii_tokens(F.col(text_col))
    both = F.concat(toks, F.coalesce(_word_ngrams(toks, 2), F.array()))
    return df.select(F.col(id_col), F.explode_outer(both).alias("gram"))


def _bucket(gram_col):
    """md5-derived bucket id in [0, n_buckets) — see module docstring."""
    return F.conv(F.substring(F.md5(gram_col), 1, 8), 16, 10).cast("long")


def dsir_bucket_logratios(
    target: DataFrame,
    raw: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """The fitted importance table: ``(bucket long, lr_micro long)`` for
    every bucket observed in EITHER corpus, where ``lr_micro`` is the
    add-``alpha``-smoothed log ratio in integer micro-units:

        lr = ln((c_target + alpha) / (T_target + alpha * B))
           - ln((c_raw    + alpha) / (T_raw    + alpha * B))

    Bounded output (<= n_buckets rows) and bounded shuffles (two
    bucket-count aggregates); totals attach via 1-row broadcast anchor
    joins rather than a driver collect, so fitting never leaves the plan.
    Unobserved buckets score the pure smoothing ratio at transform time via
    the ``lr_default_micro`` carried on every row (a constant, but kept
    per-row so the scoring join needs no second lookup table).
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (add-alpha smoothing)")

    def counts(df: DataFrame, name: str) -> DataFrame:
        g = _grams(df, id_col, text_col).where(F.col("gram").isNotNull())
        return (
            g.select((_bucket(F.col("gram")) % n_buckets).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").alias(name))
        )

    ct = counts(target, "c_target")
    cr = counts(raw, "c_raw")
    # bucket tables are <= n_buckets rows: the outer join and the 1-row
    # total anchors are all broadcast-sized.  localCheckpoint here (the
    # kmeans_fit idiom: a fit materializes its bounded result) — the
    # table is consumed by THREE downstream branches (totals, the ratio
    # projection, and the transform-time default anchor); without the
    # checkpoint each branch re-runs both corpus-wide count aggregates,
    # turning 2 corpus scans into 8+ at plan level.
    joined = (
        ct.join(cr, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("c_target", F.lit(0)).alias("c_target"),
            F.coalesce("c_raw", F.lit(0)).alias("c_raw"),
        )
        .localCheckpoint()
    )
    # the 1-row totals anchor rides an always-zero data-derived pmod key
    # (the sampling.py idiom) so it plans as a broadcast HASH equi-join,
    # not a conditionless BroadcastNestedLoopJoin
    totals = joined.agg(
        F.sum("c_target").alias("t_target"), F.sum("c_raw").alias("t_raw")
    ).select(
        "t_target",
        "t_raw",
        F.pmod(F.col("t_raw"), F.lit(1)).cast("int").alias("_k"),
    )
    aB = float(alpha) * n_buckets
    lr = (
        F.log((F.col("c_target") + alpha) / (F.col("t_target") + aB))
        - F.log((F.col("c_raw") + alpha) / (F.col("t_raw") + aB))
    )
    lr_default = (
        F.log(F.lit(alpha) / (F.col("t_target") + aB))
        - F.log(F.lit(alpha) / (F.col("t_raw") + aB))
    )
    return (
        joined.withColumn("_k", F.pmod(F.col("bucket"), F.lit(1)).cast("int"))
        .join(F.broadcast(totals), "_k")
        .select(
            "bucket",
            F.round(lr * MICRO).cast("long").alias("lr_micro"),
            F.round(lr_default * MICRO).cast("long").alias("lr_default_micro"),
            # the fit's bucket count rides the table so scorers read it
            # from the data instead of trusting a caller-repeated
            # parameter (a fit/score n_buckets mismatch silently sends
            # most grams to the default ratio — review finding)
            F.lit(int(n_buckets)).alias("n_buckets"),
        )
    )


def _table_n_buckets(ratios: DataFrame, n_buckets: "int | None") -> int:
    """Resolve the bucket count from the ratio TABLE (authoritative),
    validating any caller-supplied value against it.  One bounded driver
    read (the table is <= n_buckets rows; only the first row is taken)."""
    if "n_buckets" in ratios.columns:
        row = ratios.select("n_buckets").first()
        if row is None:
            # empty fit (both corpora gramless): any positive modulus works
            return int(n_buckets) if n_buckets else 4096
        table_b = int(row["n_buckets"])
        if n_buckets is not None and int(n_buckets) != table_b:
            raise ValueError(
                f"n_buckets={n_buckets} does not match the ratio table's "
                f"fit (n_buckets={table_b}); scoring with a different "
                "modulus sends grams to the wrong buckets"
            )
        return table_b
    # pre-n_buckets-column table: fall back to the caller's value
    if n_buckets is None:
        raise ValueError(
            "ratio table carries no n_buckets column and none was supplied"
        )
    return int(n_buckets)


def dsir_scores(
    raw: DataFrame,
    ratios: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: "int | None" = None,
) -> DataFrame:
    """Per-document DSIR importance scores against a fitted ratio table
    (:func:`dsir_bucket_logratios`): ``(id, n_grams int, dsir_logratio
    double)``.  ``dsir_logratio`` is NULL for zero-gram documents (no
    evidence either way — filter or coalesce downstream as policy).

    Plan: gram explode (map-only, zero-gram docs kept as NULL-gram rows) ->
    broadcast hash join on the bucket id (the table is <= n_buckets rows)
    -> ONE map-side-combined per-doc sum of integer micro-units.  Grams
    hashing to a bucket absent from the fit score ``lr_default_micro``
    (the pure-smoothing ratio) — taken from a 1-row broadcast anchor off
    the ratio table, so transform-time needs no driver state either.

    ``n_buckets`` is read from the ratio table itself (the fit stamps
    it); passing it explicitly only validates — a mismatch raises instead
    of silently mis-bucketing.
    """
    B = _table_n_buckets(ratios, n_buckets)
    g = _grams(raw, id_col, text_col).select(
        F.col(id_col), (_bucket(F.col("gram")) % B).alias("bucket")
    )
    # 1-row default anchor on an always-zero key DERIVED FROM THE DATA
    # (the sampling.py idiom): a conditionless join would plan as a
    # BroadcastNestedLoopJoin; the non-foldable pmod key keeps it a
    # broadcast HASH equi-join
    anchor = F.broadcast(
        ratios.agg(F.max("lr_default_micro").alias("_default")).select(
            F.coalesce("_default", F.lit(0)).alias("_default"),
        ).select(
            "_default", F.pmod(F.col("_default"), F.lit(1)).cast("int").alias("_k")
        )
    )
    joined = (
        g.join(F.broadcast(ratios.select("bucket", "lr_micro")), "bucket", "left")
        .withColumn(
            "_k", F.pmod(F.coalesce("bucket", F.lit(0)), F.lit(1)).cast("int")
        )
        .join(anchor, "_k")
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("bucket").cast("int").alias("n_grams"),
            F.sum(
                F.when(
                    F.col("bucket").isNotNull(),
                    F.coalesce("lr_micro", "_default"),
                )
            ).alias("_sum"),
        )
        .select(
            id_col,
            "n_grams",
            F.round(F.col("_sum") / MICRO, 6).alias("dsir_logratio"),
        )
    )


def dsir_scores_rowwise(
    df: DataFrame,
    ratios: DataFrame,
    text_col: str,
    n_buckets: "int | None" = None,
) -> DataFrame:
    """STATELESS per-row DSIR scoring: ``df`` plus ``n_grams`` /
    ``dsir_logratio`` columns computed inside one Arrow-batched pandas
    UDF against the BROADCAST ratio table — no explode, no join, no
    aggregation.  This is the STREAMING shape of :func:`dsir_scores`
    (whose per-doc rollup is a streaming aggregation — illegal mid-query
    in append mode); a pure projection composes with any downstream
    stateful stage, so DSIR target-likeness can gate ingest the same way
    the BigramLM perplexity gate does (the
    :meth:`~entitymatchingmodel_spark.operators.lm.BigramLM.score_rowwise`
    idiom).

    Parity with the batch scorer is EXACT, not approximate, for ANY
    input including non-ASCII: both sides tokenize with the pinned
    lowercase ``[^a-z0-9]+`` residue convention (see
    :func:`_ascii_tokens`), python's ``hashlib.md5`` equals both
    engines' md5, the bucket arithmetic is integer, and scores are
    integer micro-unit sums — pinned equal in tests.  ``n_buckets`` is
    read from the ratio table (the fit stamps it); passing it explicitly
    only validates.
    """
    B = _table_n_buckets(ratios, n_buckets)
    # bounded by construction when the table comes from the fit — but an
    # arbitrary frame passed here would be an unbounded driver collect, so
    # enforce the invariant instead of assuming it: ONE bounded job
    # (limit(B+1).collect() fetches at most B+1 rows)
    rows = ratios.limit(B + 1).collect()
    if len(rows) > B:
        raise ValueError(
            f"ratios has more than n_buckets={B} rows — not a "
            "dsir_bucket_logratios table for this bucket count; pass the "
            "fit's output"
        )
    lr = {r["bucket"]: r["lr_micro"] for r in rows}
    default = max((r["lr_default_micro"] for r in rows), default=0)
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((lr, default))

    clash = {"n_grams", "dsir_logratio"} & set(df.columns)
    if clash:
        raise ValueError(
            f"dsir_scores_rowwise adds columns {sorted(clash)}; rename them"
        )
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("n_grams", IntegerType()),
            StructField("dsir_logratio", DoubleType()),
        ]
    )

    def _score_batches(batches):
        import hashlib
        import re
        from decimal import ROUND_HALF_UP, Decimal

        m, dflt = bc.value
        tok_re = re.compile(r"[^a-z0-9]+")

        def bucket(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

        for pdf in batches:
            texts = pdf[text_col]
            n_out, s_out = [], []
            for t in texts:
                toks = [x for x in tok_re.split((t or "").lower()) if x]
                grams = toks + [
                    f"{a} {b}" for a, b in zip(toks, toks[1:])
                ]
                if not grams:
                    n_out.append(0)
                    s_out.append(None)
                    continue
                s = 0
                for g in grams:
                    s += m.get(bucket(g), dflt)
                n_out.append(len(grams))
                # Spark round(double, 6) = shortest-repr HALF_UP; python's
                # built-in round is HALF_EVEN — use the Decimal idiom from
                # BigramLM.score_rowwise so parity with the batch scorer
                # cannot break on a .5 boundary
                s_out.append(float(
                    Decimal(repr(s / MICRO)).quantize(
                        Decimal("0.000001"), rounding=ROUND_HALF_UP)
                ))
            pdf = pdf.copy()
            pdf["n_grams"] = n_out
            pdf["dsir_logratio"] = s_out
            yield pdf

    return df.mapInPandas(_score_batches, out_schema)


def dsir_resample(
    scores: DataFrame,
    id_col: str,
    k: int,
    score_col: str = "dsir_logratio",
    temperature: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Gumbel-top-k resampling — the actual selection step of the DSIR
    paper (sample k documents WITHOUT replacement with probability
    proportional to ``exp(score / temperature)``): per-row sampling key

        key = score / temperature + G,   G = -ln(-ln(u))

    with ``u`` the deterministic md5-derived uniform (the corpus-wide
    ``_unit_hash`` idiom, salted by ``seed``) — so the draw is exactly
    reproducible across runs, engines, and partitionings, and a pytest
    mirror can re-derive the selected set with ``hashlib``.  Rows with a
    NULL score (zero-gram documents) carry no evidence and are excluded.

    Scale shape: one map-only projection (hash, two ``ln`` calls) and a
    global top-k — ``orderBy().limit(k)`` plans as TakeOrdered (each
    partition keeps its local top-k; no global sort shuffle), so the
    operator is one corpus scan regardless of k << corpus.

    ``temperature -> 0`` degenerates toward deterministic top-k by score;
    large temperatures approach uniform sampling.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if temperature <= 0:
        raise ValueError(
            "temperature must be > 0 (use a plain orderBy(score).limit(k) "
            "for deterministic top-k selection)"
        )
    from entitymatchingmodel_spark.functions.sampling import _unit_hash

    # clamp away from 0 so ln(-ln(u)) can't hit ln(0): md5-prefix zero is
    # one key in 16^7 but it would NaN-poison that row's key
    u = F.greatest(_unit_hash(F.col(id_col), f"dsir{seed}"), F.lit(1e-12))
    key = F.col(score_col) / float(temperature) - F.log(-F.log(u))
    return (
        scores.filter(F.col(score_col).isNotNull())
        .withColumn("_gumbel_key", key)
        .orderBy(F.desc("_gumbel_key"), F.asc(id_col))
        .limit(k)
        .drop("_gumbel_key")
    )


# ---------------------------------------------------------------------------
# Group reputation (per-domain / per-source quality rollup and filter)
# ---------------------------------------------------------------------------

_REPUTATION_QUANT = 1_000_000  # micro-units: integer group sums, order-free


def group_reputation(
    df: DataFrame, group_col: str, score_col: str
) -> DataFrame:
    """``(group_col, grp_score_micro long, grp_docs long)`` — per-group
    quality evidence for reputation-based selection (the RefinedWeb /
    Dolma "bad domain" posture: a page inherits its host's track record).

    Scores are quantized to integer micro-units BEFORE the sum, so the
    group statistic is a sum of longs — bit-identical under any
    partitioning / AQE re-plan and engine-exact against a SQL oracle
    (the pareto_select idiom) — where a double sum would drift with
    accumulation order.  Mean = grp_score_micro / 1e6 / grp_docs when a
    float view is needed; threshold decisions should stay in integers
    (see :func:`reputation_filter`).

    ONE map-side-combined aggregate: output cardinality = #groups
    (domains/sources), never corpus scale.  NULL scores count toward
    ``grp_docs`` but contribute 0 evidence (sum ignores NULL); NULL
    groups aggregate under the NULL key and are dropped by
    :func:`reputation_filter`'s join, matching SQL GROUP BY/JOIN
    semantics.
    """
    micro = F.round(F.col(score_col) * _REPUTATION_QUANT).cast("long")
    return df.groupBy(group_col).agg(
        F.sum(micro).alias("grp_score_micro"),
        F.count(F.lit(1)).alias("grp_docs"),
    )


def reputation_filter(
    df: DataFrame,
    group_col: str,
    score_col: str,
    min_mean: float,
    min_docs: int = 1,
    reputation: DataFrame | None = None,
) -> DataFrame:
    """Rows of ``df`` whose group's MEAN score clears ``min_mean`` (and
    whose group holds at least ``min_docs`` rows) — schema passes
    through untouched.

    The threshold decision is the exact integer comparison

        grp_score_micro >= round(min_mean * 1e6) * grp_docs

    (mean >= min_mean cleared of the division), so a group sitting
    precisely on the boundary is decided identically by every engine
    and run.  Pass a precomputed ``reputation`` frame (from
    :func:`group_reputation`, e.g. built on a previous snapshot) to
    score the current batch against historical evidence; by default the
    reputation is computed from ``df`` itself.

    Scale shape: the reputation side is #groups rows — broadcast-sized
    for real domain cardinalities, and AQE downgrades gracefully when
    not — joined back LEFT SEMI so no columns widen and a viral domain
    skews nothing (the skew side carries only the join key).  Rows with
    a NULL group are dropped, like SQL inner-join semantics.
    """
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    rep = reputation
    if rep is None:
        rep = group_reputation(df, group_col, score_col)
    missing = {group_col, "grp_score_micro", "grp_docs"} - set(rep.columns)
    if missing:
        raise ValueError(
            f"reputation frame is missing columns {sorted(missing)}; "
            "build it with group_reputation"
        )
    thresh = int(round(min_mean * _REPUTATION_QUANT))
    good = rep.where(
        (F.col("grp_docs") >= F.lit(min_docs))
        & (F.col("grp_score_micro") >= F.lit(thresh) * F.col("grp_docs"))
    )
    # USING-style joins hoist the key column first; restore input order
    return df.join(good.select(group_col), group_col, "left_semi").select(
        *df.columns
    )
