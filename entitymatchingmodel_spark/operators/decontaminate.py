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
    doc_sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode_outer(word_shingles(F.col(text_col), ngram)).alias("shingle"),
    )
    bench_sh = (
        benchmark.select(
            F.explode_outer(word_shingles(F.col(bcol), ngram)).alias("shingle")
        )
        .filter(F.col("shingle").isNotNull())
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = doc_sh.join(F.broadcast(bench_sh), "shingle", "left")
    agg = joined.groupBy("id").agg(
        F.count(F.col("shingle")).alias("n_shingles"),
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
