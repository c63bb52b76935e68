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
