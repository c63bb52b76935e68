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
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    h = _unit_hash(F.col(key_col), salt)
    t = df.withColumn("_h", h).withColumn(
        "_b", F.least(F.floor(F.col("_h") * n_buckets), F.lit(n_buckets - 1)).cast("int")
    )
    # Persist: the totals collect below executes the full upstream lineage
    # (often a whole-corpus tokenize); without the cache the returned plan
    # would recompute it a second time when consumed.  Blocks live until
    # LRU eviction or caller unpersist — same documented lifetime as
    # ngram_jaccard_pairs' shingle cache.
    t = t.persist()
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
    cum = off_map[F.col("_b")] + F.sum(weight_col).over(w)
    return (
        t.withColumn("_cum", cum)
        .filter(F.col("_cum") <= budget)
        .drop("_h", "_b", "_cum")
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
