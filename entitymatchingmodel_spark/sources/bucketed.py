"""Bucketed-table helpers: shuffle-free repeated joins at 100 TB.

A ground-truth table that every batch re-joins on the same key (uid /
gt_uid / doc_id) pays its exchange on EVERY job when stored as plain
parquet.  Writing it once as a Spark bucketed table (Hive-style
``bucketBy`` + ``saveAsTable``) makes the storage layout itself carry the
hash distribution: scans report the bucket spec, and Catalyst elides the
shuffle for joins and aggregations whose keys match the bucket columns —
the two sides are co-located by construction (both bucketed, same bucket
count).  ``sortBy`` additionally pre-sorts within buckets so sort-merge
joins skip their sort.

This is a STORAGE-format decision, deliberately kept out of the operators
(which accept any DataFrame): apply it to the long-lived, re-joined side —
fitted GT token weights, candidate caches, benchmark tables — not to
one-shot inputs.  tests/test_plan_shape.py pins the zero-exchange join
plan so a Spark upgrade or conf change cannot silently bring the shuffle
back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) managed table.

    ``n_buckets`` must MATCH across tables that will be joined — Spark
    only elides the exchange when both sides agree on (columns, count).
    Size it once for the largest table: ~target partition count at full
    scale (buckets are the parallelism floor for downstream scans).
    """
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    w = (
        df.write.format(format)
        .mode(mode)
        .bucketBy(n_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        w = w.sortBy(sort_cols[0], *sort_cols[1:])
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table (the bucket spec rides along in the catalog;
    plain ``spark.table`` — this wrapper exists for API symmetry and as
    the documented entry point)."""
    return spark.table(table)
