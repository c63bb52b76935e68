"""Deterministic sampling for reproducible training-data curation.

``df.sample()`` is rng-and-partitioning dependent: re-runs, repartitions,
or a different engine produce a different sample.  These operators decide
membership by a content hash of a key column — the same rows are selected
on any cluster, any engine, any day, which is what dataset curation
pipelines need for auditability (and what makes them oracle-checkable).

Hash: md5-derived 28-bit integer (same engine-portable scheme as
operators/dedup.md5_int); membership = hash/2^28 < fraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = float(1 << 28)


def _unit_hash(c: Column, salt: str) -> Column:
    """Deterministic uniform [0,1) value per key (salted)."""
    h = F.conv(F.substring(F.md5(F.concat_ws("|", F.lit(salt), c.cast("string"))), 1, 7), 16, 10)
    return h.cast("double") / F.lit(_HASH_SPACE)


def _require_unique(df: DataFrame, key_col: str, boundary: str) -> None:
    """Shared ``validate=True`` probe: one aggregate over the input,
    short-circuiting at the first duplicate key — a loud ``ValueError``
    instead of a silently partition-layout-dependent ``boundary``."""
    dup = (
        df.groupBy(key_col).agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"key column {key_col!r} is not unique (e.g. {dup[0][key_col]!r} "
            f"appears {dup[0]['_n']} times); duplicate keys make the "
            f"deterministic order — and the {boundary} — partition-layout "
            "dependent"
        )


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~fraction of rows, decided purely by hash(key) — reproducible
    across runs, partitionings, and engines."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_unit_hash(F.col(key_col), salt) < fraction)


def token_budget_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    budget: int,
    salt: str = "budget",
    n_buckets: int = 256,
    persist_handles: list | None = None,
    validate: bool = False,
) -> DataFrame:
    """Keep documents, in deterministic hash order, until their cumulative
    ``weight_col`` (token count) reaches ``budget`` — the "sample a 1T-token
    subset out of a 10T-token corpus" curation primitive.  A row is kept iff
    the running total INCLUDING it is <= budget, walking rows by
    (hash(key), key); the result is a fixed, auditable subset independent
    of partitioning or engine.

    Scale shape — a DISTRIBUTED PREFIX SUM, not a global window: a naive
    ``sum() over (order by hash)`` collapses the corpus into one window
    partition (single task).  Instead the hash's leading bits bucket rows
    into ``n_buckets`` ordered ranges; per-bucket totals (one tiny
    aggregate, ``n_buckets`` rows to the driver — bounded, like IVF
    centroids) give each bucket's running offset, broadcast back; the
    within-bucket cumulative sum is a window partitioned BY BUCKET, so the
    heavy pass parallelizes across buckets.  Identical result to the
    global window by construction (bucket boundaries respect hash order).

    ``key_col`` must be UNIQUE: duplicate keys order arbitrarily within
    their identical (hash, key) tuple, making the budget-boundary rows
    partition-layout dependent.  ``validate=True`` enforces this with one
    extra aggregate over the (already persisted) input — a loud
    ``ValueError`` instead of a silently nondeterministic boundary; off by
    default because the check costs a full groupBy pass.  The input is
    persisted for the duration of the sizing pass; pass ``persist_handles``
    to receive the cached DataFrame and unpersist it after the result is
    consumed.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    t = _bucketed_prefix_sum(df, key_col, weight_col, salt, n_buckets,
                             persist_handles=persist_handles, validate=validate)
    return t.filter(F.col("_cum") <= budget).drop("_h", "_b", "_cum")


def _bucketed_prefix_sum(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    salt: str,
    n_buckets: int,
    persist_handles: list | None = None,
    validate: bool = False,
) -> DataFrame:
    """df + ``_cum`` = running total of ``weight_col`` over the global
    deterministic (hash(key), key) order — computed as a DISTRIBUTED
    prefix sum: hash-range buckets, one tiny per-bucket totals aggregate
    (``n_buckets`` rows to the driver), offsets broadcast back as a
    literal map, within-bucket window partitioned BY BUCKET.  The input is
    persisted (the totals job would otherwise recompute the upstream
    lineage a second time when the returned plan is consumed).
    ``validate=True`` raises if ``key_col`` is not unique (one extra
    aggregate over the persisted input, short-circuiting at the first
    duplicate)."""
    clash = {"_h", "_b", "_cum"} & set(df.columns)
    if clash:
        raise ValueError(f"prefix-sum operators reserve columns {sorted(clash)}; rename them")
    h = _unit_hash(F.col(key_col), salt)
    t = df.withColumn("_h", h).withColumn(
        "_b", F.least(F.floor(F.col("_h") * n_buckets), F.lit(n_buckets - 1)).cast("int")
    )
    t = t.persist()
    if persist_handles is not None:
        persist_handles.append(t)
    if validate:
        try:
            _require_unique(t, key_col, "budget/chunk boundary")
        except ValueError:
            if persist_handles is None:
                t.unpersist()
            raise
    totals = {
        r["_b"]: r["_t"]
        for r in t.groupBy("_b").agg(F.sum(weight_col).alias("_t")).collect()
    }
    offsets, acc = {}, 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += int(totals.get(b, 0) or 0)
    off_map = F.map_from_arrays(
        F.array(*[F.lit(b) for b in range(n_buckets)]),
        F.array(*[F.lit(offsets[b]) for b in range(n_buckets)]),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("_b")
        .orderBy(F.col("_h").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return t.withColumn("_cum", off_map[F.col("_b")] + F.sum(weight_col).over(w))


def pack_sequences(
    df: DataFrame,
    key_col: str,
    n_tokens_col: str,
    seq_len: int,
    salt: str = "pack",
    n_buckets: int = 256,
    persist_handles: list | None = None,
    validate: bool = False,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard LLM-pretraining
    data layout: documents are laid end-to-end in deterministic
    (hash(key), key) order and the token stream is cut into fixed
    ``seq_len`` chunks; a document whose token range straddles a boundary
    is split across consecutive chunks.

    Output: one row per (chunk, document) intersection —
    ``(chunk_id, key, n_tokens, doc_off, chunk_off, span_len)``:
    ``doc_off`` = where the span starts within the DOCUMENT,
    ``chunk_off`` = where it starts within the CHUNK, ``span_len`` = how
    many of the doc's tokens land in this chunk.  Summing ``span_len``
    per chunk gives ``seq_len`` for every full chunk, so a data loader
    can materialize training rows directly from this table.  Zero-token
    documents are dropped (they occupy no token range).

    Scale shape: the doc's global token offset is the same distributed
    prefix sum as :func:`token_budget_sample` (bucketed offsets +
    per-bucket windows); chunk membership is then a pure per-row
    ``sequence(first_chunk, last_chunk)`` explode, bounded by
    ceil(n_tokens/seq_len)+1 rows per doc.  No global window, no driver
    materialization beyond the ``n_buckets`` totals.

    ``key_col`` must be UNIQUE (see :func:`token_budget_sample`;
    ``validate=True`` enforces it with one extra aggregate);
    ``persist_handles`` receives the cached prefix-sum input.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    t = _bucketed_prefix_sum(
        df.filter(F.col(n_tokens_col) > 0), key_col, n_tokens_col, salt, n_buckets,
        persist_handles=persist_handles, validate=validate,
    )
    start = (F.col("_cum") - F.col(n_tokens_col)).alias("_start")
    t = t.withColumn("_start", start).withColumn(
        "chunk_id",
        F.explode(
            F.sequence(
                F.floor(F.col("_start") / seq_len),
                F.floor((F.col("_cum") - 1) / seq_len),
            )
        ),
    )
    chunk_base = F.col("chunk_id") * seq_len
    span_start = F.greatest(F.col("_start"), chunk_base)
    span_end = F.least(F.col("_cum"), chunk_base + seq_len)
    return t.select(
        F.col("chunk_id").cast("long"),
        F.col(key_col),
        F.col(n_tokens_col),
        (span_start - F.col("_start")).cast("long").alias("doc_off"),
        (span_start - chunk_base).cast("long").alias("chunk_off"),
        (span_end - span_start).cast("long").alias("span_len"),
    )


def per_group_cap(
    df: DataFrame,
    key_col: str,
    group_col: str,
    max_per_group: int,
    salt: str = "cap",
    salt_buckets: int = 64,
    validate: bool = False,
) -> DataFrame:
    """Keep at most ``max_per_group`` rows per group, chosen
    deterministically — the web-corpus "at most N documents per domain"
    curation primitive (caps boilerplate-heavy hosts without touching the
    long tail).

    Membership is the rank of ``hash(key)`` within the group, so the kept
    subset is stable across runs/partitionings/engines AND nested:
    ``cap(5)`` of a group is a superset of ``cap(3)``.

    Skew shape: a window partitioned by group alone puts a mega-domain's
    every row in ONE task's sort — the exact hot-host case the cap exists
    for.  So the rank runs in two exact phases: a pre-cap windowed over
    ``(group, hash-bucket)`` (each bucket keeps its own ``max_per_group``
    smallest hashes — no task ever sorts more than a bucket's share),
    then the final rank over the surviving ``<= max_per_group *
    salt_buckets`` rows per group.  The global N smallest hashes are a
    subset of the per-bucket N smallest, so the result is IDENTICAL to
    the single-window formulation (``salt_buckets=1`` collapses to it) —
    two narrow shuffles instead of one skew-prone one.

    ``key_col`` must be UNIQUE: duplicate keys tie on ``(hash, key)`` and
    ``row_number`` breaks the tie by partition layout, so the kept subset
    at the cap boundary would differ between runs.  ``validate=True``
    enforces uniqueness with one extra aggregate (loud ``ValueError``
    instead of a silently unstable boundary), same contract as
    :func:`token_budget_sample` / :func:`pack_sequences`.
    """
    if max_per_group < 0:
        raise ValueError("max_per_group must be >= 0")
    if salt_buckets < 1:
        raise ValueError("salt_buckets must be >= 1")
    if validate:
        _require_unique(df, key_col, "cap boundary")
    from pyspark.sql import Window

    h = _unit_hash(F.col(key_col), salt)
    staged = df
    if salt_buckets > 1:
        bucket = F.least(
            F.floor(h * salt_buckets), F.lit(salt_buckets - 1)
        ).cast("int")
        wpre = Window.partitionBy(group_col, bucket).orderBy(
            h.asc(), F.col(key_col).asc()
        )
        staged = (
            df.withColumn("_prn", F.row_number().over(wpre))
            .filter(F.col("_prn") <= max_per_group)
            .drop("_prn")
        )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        staged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_group)
        .drop("_rn")
    )


def sample_to_mix(
    df: DataFrame,
    key_col: str,
    group_col: str,
    weights: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Downsample groups toward a TARGET MIX — the "train on 30% web,
    30% code, 40% books" dataset-mixture primitive.

    ``weights`` maps group value -> target share (normalized internally;
    groups absent from ``weights`` are dropped).  The largest total
    consistent with the targets is kept: the binding group (smallest
    count/share ratio) is kept whole and every other group is
    deterministically hash-downsampled to match its share relative to the
    binding group.  No group is ever upsampled.

    Scale shape: one count aggregate per group (``n_groups`` rows to the
    driver — bounded like IVF centroids / prefix-sum bucket totals), then
    a pure per-row hash-membership filter (map-only, no shuffle); the
    expected kept size per group is share-exact, membership is
    reproducible across engines, and nested (raising a share keeps a
    superset of the smaller share's rows).
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    for v in weights.values():
        if v < 0:
            raise ValueError("weights must be >= 0")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to > 0")
    # isin pushed BELOW the aggregate: the collect is bounded by the
    # user-supplied weights dict, not by the corpus's group cardinality
    counts = {
        r["g"]: r["n"]
        for r in df.filter(F.col(group_col).isin(list(weights)))
        .groupBy(F.col(group_col).alias("g")).agg(
            F.count("*").alias("n")
        ).collect()
        if r["g"] in weights
    }
    positive = [g for g in counts if weights[g] > 0]
    if not positive:
        # every group actually present has target share 0 — nothing to keep
        return df.filter(F.lit(False))
    # binding group: smallest available/target ratio; kept in full
    scale = min(counts[g] / (weights[g] / total_w) for g in positive)
    fracs = {}
    for g in counts:
        share = weights[g] / total_w
        fracs[g] = min(1.0, scale * share / counts[g]) if counts[g] else 0.0
    return _group_fraction_filter(df, key_col, group_col, fracs, salt)


def _group_fraction_filter(
    df: DataFrame, key_col: str, group_col: str, fracs: dict, salt: str
) -> DataFrame:
    """Map-only membership filter shared by :func:`sample_to_mix` and
    :func:`temperature_mix`: keep a row iff its key's unit hash is below
    its group's fraction.  Groups absent from ``fracs`` (including NULL
    groups) fall through to fraction 0 and are dropped."""
    frac = F.lit(0.0)
    for g in sorted(fracs):
        frac = F.when(F.col(group_col) == g, F.lit(fracs[g])).otherwise(frac)
    return df.filter(_unit_hash(F.col(key_col), salt) < frac)


def _repeat_explode(df: DataFrame, key_col: str, rep: Column, salt: str) -> DataFrame:
    """Map-only repeat-factor emitter shared by the literal-chain and
    join-based upsampling paths: emit each row ``floor(rep)`` times plus
    one extra copy iff its key's unit hash falls below the fractional
    remainder ``rep - floor(rep)``.  Output = the input columns plus
    ``copy int`` (0-based repeat index); rows whose factor totals 0 are
    dropped (the explode of a NULL array).  Pure per-row
    ``sequence``+``explode`` — no shuffle."""
    n_full = F.floor(rep).cast("long")
    extra = (_unit_hash(F.col(key_col), salt) < (rep - F.floor(rep))).cast("long")
    total = n_full + extra
    return (
        df.withColumn(
            "_copies",
            F.when(total >= 1, F.sequence(F.lit(0).cast("long"), total - 1)),
        )
        .withColumn("copy", F.explode("_copies"))
        .drop("_copies")
        .withColumn("copy", F.col("copy").cast("int"))
    )


def _check_repeats(repeats: dict, max_repeat: float) -> None:
    """Driver-side repeat-factor sanity cap for the literal-chain paths:
    a misconfigured weights dict (tiny group, huge target share) would
    otherwise materialize floor(r)-element arrays per row before the
    explode — fail loudly instead (round-8 review finding)."""
    worst = max(repeats.values(), default=0.0)
    if worst > max_repeat:
        g = max(repeats, key=repeats.get)
        raise ValueError(
            f"repeat factor {worst:g} for group {g!r} exceeds max_repeat="
            f"{max_repeat:g}; a factor this size materializes {int(worst)} "
            "copies of every row in the group before the explode. Check the "
            "weights/alpha, or raise max_repeat explicitly if intended."
        )


def _group_repeat_explode(
    df: DataFrame, key_col: str, group_col: str, repeats: dict, salt: str
) -> DataFrame:
    """Deterministic repeat-factor resampling shared by the
    ``allow_upsample`` mixture ops: emit each row ``floor(r_g)`` times
    plus one extra copy iff its key's unit hash falls below the
    fractional remainder ``r_g - floor(r_g)`` — the repeat-factor twin of
    :func:`_group_fraction_filter` (to which it degenerates for
    ``r_g <= 1``: zero full copies, hash-gated copy 0).

    Output = the input columns plus ``copy int`` (0-based repeat index),
    so every emitted row stays uniquely addressable.  Groups absent from
    ``repeats`` (including NULL groups) get factor 0 and are dropped.

    Scale shape: a map-only per-row ``sequence``+``explode`` — no
    shuffle, no driver state beyond the bounded ``repeats`` dict; output
    size is sum(n_g * r_g), exactly the requested resample."""
    rep = F.lit(0.0)
    for g in sorted(repeats):
        rep = F.when(F.col(group_col) == g, F.lit(float(repeats[g]))).otherwise(rep)
    return _repeat_explode(df, key_col, rep, salt)


def resample_to_mix(
    df: DataFrame,
    key_col: str,
    group_col: str,
    weights: dict[str, float],
    salt: str = "remix",
    frac_decimals: int = 12,
    max_repeat: float = 10_000.0,
) -> DataFrame:
    """Resample groups to a TARGET MIX with UPSAMPLING — the half of the
    mC4/DoReMi mixing recipe :func:`sample_to_mix` can't express: the
    total row count is PRESERVED (in expectation, exactly per group up to
    the hash-gated fractional copy) while each group's share moves to its
    target weight, over-represented groups shrinking and tail groups
    REPEATING (epoch-style repeat-factor upsampling, deterministic
    integer repeats + hash-gated fractional remainder).

    ``weights`` maps group value -> target share; groups absent from
    ``weights`` are dropped; listed-but-absent groups redistribute their
    share (weights are renormalized over the groups actually present).
    Repeat factor: ``r_g = round((N * w_g / W) / n_g, frac_decimals)``
    with N = total rows across present listed groups and W their weight
    sum — pure mul/div over integer counts and user literals, rounded
    BEFORE the membership compare (round-before-rank, SURVEY §4 X15), so
    both engines agree bit-for-bit.  Output adds a 0-based ``copy`` int
    column (so upsampled rows stay uniquely addressable).

    Scale shape: one bounded count aggregate (n_groups rows to the
    driver), then the map-only repeat-explode — no shuffle."""
    if not weights:
        raise ValueError("weights must be non-empty")
    for v in weights.values():
        if v < 0:
            raise ValueError("weights must be >= 0")
    # isin pushed BELOW the aggregate (same bounding as sample_to_mix)
    counts = {
        r["g"]: r["n"]
        for r in df.filter(F.col(group_col).isin(list(weights)))
        .groupBy(F.col(group_col).alias("g"))
        .agg(F.count("*").alias("n"))
        .collect()
        if r["g"] in weights
    }
    positive = {g: n for g, n in counts.items() if weights[g] > 0 and n > 0}
    if not positive:
        return _group_repeat_explode(df, key_col, group_col, {}, salt)
    total_n = sum(positive.values())
    total_w = float(sum(weights[g] for g in positive))
    repeats = {
        g: round(total_n * weights[g] / total_w / n, frac_decimals)
        for g, n in positive.items()
    }
    _check_repeats(repeats, max_repeat)
    return _group_repeat_explode(df, key_col, group_col, repeats, salt)


def temperature_mix(
    df: DataFrame,
    key_col: str,
    group_col: str,
    alpha: float,
    salt: str = "temp",
    frac_decimals: int = 12,
    allow_upsample: bool = False,
    max_groups: int = 100_000,
    max_repeat: float = 10_000.0,
) -> DataFrame:
    """Temperature-based mixture resampling (the mC4/XLM-R multilingual
    'sampling with exponent alpha' primitive): the target share of group
    g is proportional to ``count_g ** alpha``.  ``alpha=1`` keeps the
    natural distribution (every fraction is 1); ``alpha=0`` equalizes
    groups; ``0 < alpha < 1`` upweights the tail by DOWNSAMPLING the
    head.  No group is ever upsampled — the binding group (smallest
    count/target ratio) is kept whole, exactly like
    :func:`sample_to_mix`, whose scale shape this shares: one bounded
    count aggregate (n_groups rows to the driver), then a map-only
    hash-membership filter.

    Exactness posture: the per-group fraction is computed WITHOUT a
    normalizing sum — ``frac_g = min(1, min_h(n_h / n_h**alpha) *
    n_g**alpha / n_g)`` (the share denominator cancels algebraically) —
    so every float step is an order-safe pow/div/min/mul chain both
    engines evaluate identically; the fraction is then rounded to
    ``frac_decimals`` BEFORE the membership compare (round-before-rank,
    SURVEY §4 X15), so a last-ulp wobble can never flip a row across the
    hash boundary.  Rows with a NULL group are dropped.

    ``allow_upsample=True`` flips the anchor (r8): instead of keeping the
    binding group whole and downsampling everyone else, the group with
    the LARGEST count/target ratio is kept whole and every other group is
    repeat-factor UPSAMPLED to match — ``r_g = round(max_h(n_h /
    n_h**alpha) * n_g**alpha / n_g, frac_decimals) >= 1`` for every
    group, so no original row is ever discarded (the multi-epoch
    tail-repeat recipe of mC4/XLM-R alpha sampling).  The output then
    carries an extra 0-based ``copy`` int column (see
    :func:`_group_repeat_explode`); the same sum-free order-safe float
    chain keeps it engine-exact.
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    # bounded-group guard: this path collects one row per group and
    # compiles the fractions into a literal when-chain — sound for
    # languages/sources, catastrophic for per-DOMAIN grouping (millions
    # of groups -> unbounded driver collect + megabyte plan).  The
    # limit() bounds what the probe can ever pull to the driver.
    rows = (
        df.groupBy(F.col(group_col).alias("g"))
        .agg(F.count("*").alias("n"))
        .limit(max_groups + 1)
        .collect()
    )
    if len(rows) > max_groups:
        raise ValueError(
            f"group column {group_col!r} has more than max_groups="
            f"{max_groups} distinct values; the literal-chain plan does "
            "not scale to that. Use temperature_mix_unbounded (join-based, "
            "fractions computed in-plan, no driver collect), or raise "
            "max_groups explicitly if the cardinality is intended."
        )
    counts = {r["g"]: r["n"] for r in rows if r["g"] is not None and r["n"] > 0}
    if allow_upsample:
        if not counts:
            return _group_repeat_explode(df, key_col, group_col, {}, salt)
        max_ratio = max(n / n**alpha for n in counts.values())
        repeats = {
            g: round(max(1.0, max_ratio * n**alpha / n), frac_decimals)
            for g, n in counts.items()
        }
        _check_repeats(repeats, max_repeat)
        return _group_repeat_explode(df, key_col, group_col, repeats, salt)
    if not counts:
        return df.filter(F.lit(False))
    min_ratio = min(n / n**alpha for n in counts.values())
    fracs = {
        g: round(min(1.0, min_ratio * n**alpha / n), frac_decimals)
        for g, n in counts.items()
    }
    return _group_fraction_filter(df, key_col, group_col, fracs, salt)


def temperature_mix_unbounded(
    df: DataFrame,
    key_col: str,
    group_col: str,
    alpha: float,
    salt: str = "temp",
    frac_decimals: int = 12,
    allow_upsample: bool = False,
    max_repeat: float = 10_000.0,
) -> DataFrame:
    """:func:`temperature_mix` for UNBOUNDED group cardinality — the
    per-DOMAIN quota reality of C4/RefinedWeb curation (millions of
    registered domains), where the literal-chain path's one-row-per-group
    driver collect and megabyte ``when``-chain plan both break.

    Same semantics (alpha-sampling, binding group anchored, NULL groups
    dropped, deterministic hash membership, ``allow_upsample`` adds the
    0-based ``copy`` column), but every per-group quantity stays IN-PLAN:

    - group counts: one map-side-combined aggregate (never collected);
    - the anchor ``min_h/max_h(n_h / n_h**alpha)``: a one-row aggregate
      of the counts frame, attached via a constant-key BROADCAST HASH
      join of literally one row (an equi-join, not a nested loop, so the
      plan audit's no-cartesian rule holds by construction);
    - per-group fraction / repeat factor: computed next to the count and
      joined back on ``group_col`` — Catalyst broadcasts the fraction
      table when it is small and AQE falls back to a shuffle hash join
      when it is not, which is exactly the 100 TB shape;
    - the repeat-factor cap: enforced AT RUNTIME inside the plan
      (``raise_error`` branch) instead of by a driver peek, so the guard
      costs zero extra jobs.

    Float parity with the literal path: the fraction is the same sum-free
    pow/div/min(or max)/mul chain, rounded to ``frac_decimals`` before
    the membership compare (round-before-rank, SURVEY §4 X15).  The two
    paths can differ only on an exact decimal tie at the last rounded
    digit (Python banker's rounding vs engine HALF_UP) — probability ~0
    for real counts, and irrelevant to cross-engine oracle parity, which
    compares this plan against SQL running the identical chain.
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    clash = {"_n", "_k", "_anchor", "_frac", "_rep"} & set(df.columns)
    if clash:
        raise ValueError(
            f"temperature_mix_unbounded reserves columns {sorted(clash)}; rename them"
        )
    counts = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count("*").alias("_n"))
    )
    nd = F.col("_n").cast("double")
    ratio = nd / F.pow(nd, F.lit(float(alpha)))

    def _with_anchor(agg_col):
        # one-row anchor attached on an always-zero key DERIVED FROM THE
        # DATA (pmod(count, 1)): a literal key would be constant-folded
        # and the join rewritten into a BroadcastNestedLoopJoin; a
        # non-foldable key keeps it a broadcast HASH equi-join, so the
        # plan audit's no-cartesian rule holds by construction
        a = counts.agg(agg_col.alias("_anchor"), F.count("*").alias("_c"))
        a = a.select(
            "_anchor", F.pmod(F.col("_c"), F.lit(1)).cast("int").alias("_k")
        )
        c = counts.withColumn("_k", F.pmod(F.col("_n"), F.lit(1)).cast("int"))
        return c.join(F.broadcast(a), "_k")

    if allow_upsample:
        joined_counts = _with_anchor(F.max(ratio))
        rep = F.round(
            F.greatest(
                F.lit(1.0), F.col("_anchor") * F.pow(nd, F.lit(float(alpha))) / nd
            ),
            frac_decimals,
        )
        reps = joined_counts.select(group_col, rep.alias("_rep"))
        # in-plan fail-fast: no driver peek, the guard rides the main job
        checked = F.when(
            F.col("_rep") > float(max_repeat),
            F.raise_error(
                F.concat(
                    F.lit("repeat factor "),
                    F.col("_rep").cast("string"),
                    F.lit(f" exceeds max_repeat={max_repeat:g} for group "),
                    F.col(group_col).cast("string"),
                )
            ).cast("double"),
        ).otherwise(F.col("_rep"))
        joined = df.join(reps, group_col)
        return _repeat_explode(joined, key_col, checked, salt).drop("_rep")
    frac = F.round(
        F.least(F.lit(1.0), F.col("_anchor") * F.pow(nd, F.lit(float(alpha))) / nd),
        frac_decimals,
    )
    fracs = _with_anchor(F.min(ratio)).select(group_col, frac.alias("_frac"))
    return (
        df.join(fracs, group_col)
        .filter(_unit_hash(F.col(key_col), salt) < F.col("_frac"))
        .drop("_frac")
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per language / source quota).

    ``fractions`` maps stratum value -> keep fraction; unlisted strata use
    ``default_fraction``.  One scan, no shuffle: membership is a pure
    per-row expression, so Catalyst can push any downstream column pruning
    straight to the source scan.
    """
    for v in fractions.values():
        if not 0.0 <= v <= 1.0:
            raise ValueError("fractions must be in [0, 1]")
    frac = F.lit(float(default_fraction))
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(stratum_col) == k, float(v)).otherwise(frac)
    return df.filter(_unit_hash(F.col(key_col), salt) < frac)
