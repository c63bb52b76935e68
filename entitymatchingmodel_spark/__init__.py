"""entitymatchingmodel_spark — a PySpark-native entity-matching & data-pipeline engine.

A from-scratch, Spark-first re-expression of the capabilities of
ing-bank/EntityMatchingModel (reference surveyed in SURVEY.md):

1. name preprocessing          -> ``operators.preprocessor`` (native Column exprs)
2. candidate selection         -> ``operators.cossim_indexer`` (TF-IDF cosine top-k,
                                  DataFrame inverted-index join, Catalyst-planned)
                                  + ``operators.sni_indexer`` (sorted neighbourhood)
3. supervised pair scoring     -> ``operators.supervised`` (Spark-native features +
                                  pyspark.ml classifier; no sklearn dependency)
4. entity/account aggregation  -> ``operators.aggregation`` (pure DataFrame rewrite)

Plus large-scale training-data pipeline operators: deduplication
(``operators.dedup``), similarity search (``operators.ann``), text analysis
(``functions.text``), multimodal plumbing (``operators.multimodal``), and a
Structured-Streaming transform path (``streaming``).

Everything is declared through the DataFrame API so Catalyst/AQE plan the
physical execution; Python UDFs appear only where a vectorized library is
genuinely required, always Arrow-batched.
"""

from entitymatchingmodel_spark.functions.selection import (
    dsir_bucket_logratios,
    dsir_resample,
    dsir_scores,
    group_reputation,
    reputation_filter,
)
from entitymatchingmodel_spark.operators.clustering import (
    cluster_balanced_sample,
    kmeans_clusters,
)
from entitymatchingmodel_spark.operators.curation import curate_batch
from entitymatchingmodel_spark.operators.quality_clf import (
    QualityClassifier,
    pareto_keep,
)
from entitymatchingmodel_spark.operators.dedup import (
    build_band_index,
    build_bloom_index,
    build_content_index,
    dedup_against_band_index,
    dedup_against_bloom,
    dedup_against_index,
    fuzzy_dedup,
    semantic_dedup,
)
from entitymatchingmodel_spark.functions.text import refinedweb_lines_table
from entitymatchingmodel_spark.operators.pq import PQModel, ivf_pq_topk
from entitymatchingmodel_spark.operators.events import scoped_conf
from entitymatchingmodel_spark.persistence import load_model, save_model
from entitymatchingmodel_spark.pipeline import (
    SparkEntityMatching,
    register_blocking_func,
    register_sni_mapping_func,
)
from entitymatchingmodel_spark.session import get_spark

__all__ = [
    "SparkEntityMatching",
    "get_spark",
    "save_model",
    "load_model",
    "scoped_conf",
    # one-call curation dedup (the operators a training-data user reaches
    # for first; everything else imports from its operator module)
    "fuzzy_dedup",
    "semantic_dedup",
    "kmeans_clusters",
    "cluster_balanced_sample",
    # data selection (DSIR) + compressed ANN — the r9 additions a
    # training-data user reaches for by name
    "dsir_bucket_logratios",
    "dsir_scores",
    "dsir_resample",
    "PQModel",
    "ivf_pq_topk",
    # the batch curation front-door (streaming twin: streaming.curate_stream)
    "curate_batch",
    # discriminative quality filtering (GPT-3 recipe): classifier + the
    # deterministic Pareto threshold rule
    "QualityClassifier",
    "pareto_keep",
    # r10: incremental snapshot dedup + the RefinedWeb rule table
    "build_content_index",
    "dedup_against_index",
    "refinedweb_lines_table",
    # r11: bloom-prefiltered incremental dedup, reputation-based
    # selection, and the persist-by-name registries for user callables
    "build_bloom_index",
    "dedup_against_bloom",
    "build_band_index",
    "dedup_against_band_index",
    "group_reputation",
    "reputation_filter",
    "register_blocking_func",
    "register_sni_mapping_func",
]
__version__ = "0.10.0"
