"""Benchmark decontamination — n-gram overlap against a held-out set.

Beyond-reference operator for training-data pipelines: before training on a
corpus, measure which documents leak benchmark/eval content (the standard
n-gram-collision decontamination check used by public LLM data pipelines).

Shape at 100 TB: both sides explode to distinct word n-gram shingles and
meet in ONE equi-join on the shingle string — the benchmark side is tiny by
construction (eval sets), so Catalyst broadcasts it; no all-pairs stage
exists.  Aggregation back to doc id uses map-side partial counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entitymatchingmodel_spark.operators.dedup import word_shingles


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    ngram: int = 5,
    score_decimals: int | None = 6,
) -> DataFrame:
    """(id, n_shingles, n_contaminated, contamination) per document.

    ``contamination`` = fraction of the doc's distinct word ``ngram``-shingles
    that appear anywhere in the benchmark set; filter on it (e.g. > 0.1) to
    drop leaked documents.  Docs with fewer than ``ngram`` words have no
    shingles and report 0 contamination over 0 shingles.
    """
    bcol = bench_text_col or text_col
    # Join on a 64-bit hash of the shingle, not the raw n-gram string: a
    # 5-gram averages tens of bytes while the hash is 8, cutting broadcast
    # and probe bytes several-fold at corpus scale.  xxhash64 of NULL input
    # degenerates to the seed (not NULL), so null shingles (docs shorter
    # than the n-gram) are guarded explicitly to keep the per-doc count
    # right.  A cross-document hash collision marks one extra shingle
    # contaminated (P < n_doc_shingles * n_bench_shingles / 2^64 —
    # negligible, and decontamination is a conservative filter anyway).
    sh_hash = F.when(F.col("shingle").isNotNull(), F.xxhash64("shingle"))
    doc_sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode_outer(word_shingles(F.col(text_col), ngram)).alias("shingle"),
    ).select("id", sh_hash.alias("_sh"))
    bench_sh = (
        benchmark.select(
            F.explode_outer(word_shingles(F.col(bcol), ngram)).alias("shingle")
        )
        .filter(F.col("shingle").isNotNull())
        .select(F.xxhash64("shingle").alias("_sh"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = doc_sh.join(F.broadcast(bench_sh), "_sh", "left")
    agg = joined.groupBy("id").agg(
        F.count(F.col("_sh")).alias("n_shingles"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_contaminated"),
    )
    ratio = F.when(
        F.col("n_shingles") == 0, F.lit(0.0)
    ).otherwise(F.col("n_contaminated") / F.col("n_shingles"))
    if score_decimals is not None:
        ratio = F.round(ratio, score_decimals)
    return agg.select(
        F.col("id"),
        F.col("n_shingles").cast("int").alias("n_shingles"),
        F.col("n_contaminated").cast("int").alias("n_contaminated"),
        ratio.alias("contamination"),
    )
