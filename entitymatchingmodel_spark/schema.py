"""Canonical schema management: rename, validation, uid generation.

Mirrors the reference's boundary normalization (emm/helper/util.py:34-60,
emm/base/base_entity_matching.py:154-191, emm/helper/spark_utils.py:115-141)
but Spark-first:

- uids are **content-derived 64-bit hashes** (xxhash64 of name + row identity),
  not ``monotonically_increasing_id``.  The reference must checkpoint right
  after generating ids because monotonic ids change on recompute
  (spark_utils.py:115-128); a deterministic hash removes that hazard entirely —
  no checkpoint, lineage stays cheap, and re-derived plans agree at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Canonical internal column names (reference: emm/parameters.py:50-55).
NAME = "name"
ENTITY_ID = "entity_id"
UID = "uid"
COUNTRY = "country"
ACCOUNT = "account"
FREQ = "counterparty_account_count_distinct"
PREPROCESSED = "preprocessed"
GT_PREFIX = "gt_"


class SchemaError(ValueError):
    pass


def normalize_columns(
    df: DataFrame,
    *,
    name_col: str = "name",
    entity_id_col: str | None = "id",
    uid_col: str | None = None,
    country_col: str | None = None,
    account_col: str | None = None,
    freq_col: str | None = None,
    carry_on_cols: list[str] | None = None,
    require: tuple[str, ...] = (),
) -> DataFrame:
    """Rename user columns to canonical names; validate presence.

    A source column may feed multiple canonical targets (the reference
    duplicates such columns, util.py:49-56) — handled here by selecting with
    aliases rather than withColumnRenamed.
    """
    mapping: list[tuple[str, str]] = []
    if name_col:
        mapping.append((name_col, NAME))
    if entity_id_col:
        mapping.append((entity_id_col, ENTITY_ID))
    if uid_col:
        mapping.append((uid_col, UID))
    if country_col:
        mapping.append((country_col, COUNTRY))
    if account_col:
        mapping.append((account_col, ACCOUNT))
    if freq_col:
        mapping.append((freq_col, FREQ))

    missing = [src for src, _ in mapping if src not in df.columns]
    if missing:
        raise SchemaError(f"missing required column(s) {missing}; have {df.columns}")

    cols: list[Column] = [F.col(src).alias(dst) for src, dst in mapping]
    taken = {dst for _, dst in mapping}
    for c in carry_on_cols or []:
        if c not in df.columns:
            raise SchemaError(f"carry_on column {c!r} not in {df.columns}")
        if c not in taken:
            cols.append(F.col(c))
            taken.add(c)
    out = df.select(*cols)
    for r in require:
        if r not in out.columns:
            raise SchemaError(f"required canonical column {r!r} absent after rename")
    return out


def with_uid(df: DataFrame, uid_col: str = UID) -> DataFrame:
    """Attach a deterministic unique 64-bit uid.

    xxhash64 over every column gives a content hash; a row_number over it
    disambiguates exact-duplicate rows.  Deterministic across recomputation
    (unlike monotonically_increasing_id) so no checkpoint is needed.  The
    window partitions by the hash itself, so only true duplicate rows collide
    into one partition — no global sort, no skew at 100 TB.
    """
    if uid_col in df.columns:
        return df
    from pyspark.sql import Window

    cols = [F.col(c) for c in df.columns]
    h = F.xxhash64(*cols)
    w = Window.partitionBy(h).orderBy(F.lit(1))
    # Re-hash with the duplicate rank mixed in: identical rows get distinct
    # uids, everything stays in the full 64-bit space (no overflow under ANSI).
    return df.withColumn(uid_col, F.xxhash64(*cols, F.row_number().over(w)))


def check_uid_uniqueness(df: DataFrame, uid_col: str = UID) -> None:
    """Raise if uid has duplicates (reference: spark_utils.py:131-141)."""
    dup = df.groupBy(uid_col).count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise SchemaError(f"column {uid_col!r} is not unique")


def prefix_gt(df: DataFrame, exclude: tuple[str, ...] = ()) -> DataFrame:
    """Prefix all columns with ``gt_`` (ground-truth side of a candidate pair)."""
    return df.select(
        *[F.col(c).alias(c if c in exclude else GT_PREFIX + c) for c in df.columns]
    )
