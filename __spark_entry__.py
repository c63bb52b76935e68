"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
through the entitymatchingmodel_spark package; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL over the same parquet tables.

Determinism rules used throughout (so Spark and DuckDB hash-match):
- scores are rounded (6-8 dp) BEFORE any ranking/filtering, mirroring the
  reference's round-before-rank rule (SURVEY.md §4 X15);
- all top-k windows tie-break on a stable integer key;
- uids are taken from source keys (p_partkey, doc_id, ...), never generated.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full entity-matching pipeline on sf0.001 part names."""
    from entitymatchingmodel_spark import SparkEntityMatching

    sf_dir = "/root/testdata/sf0.001"
    parts = _t(spark, sf_dir, "part")
    gt = (
        parts.groupBy(F.col("p_name").alias("name"))
        .agg(F.min("p_partkey").alias("id"))
    )
    names = parts.select(F.col("p_name").alias("name"), F.col("p_partkey").alias("id"))
    em = SparkEntityMatching(
        parameters={
            "indexers": [
                {"type": "cosine_similarity", "tokenizer": "words", "ngram": 1,
                 "num_candidates": 5, "cos_sim_lower_bound": 0.2},
                {"type": "cosine_similarity", "tokenizer": "characters", "ngram": 2,
                 "num_candidates": 5, "cos_sim_lower_bound": 0.2},
                {"type": "sni", "window_length": 3},
            ]
        }
    )
    em.fit(gt)
    return em.transform(names)


# ---------------------------------------------------------------------------
# query helpers (shared by queries() and bench.py)
# ---------------------------------------------------------------------------

def q_preprocess_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preprocessing pipeline (SURVEY §2.3) on synthesized dirty names."""
    from entitymatchingmodel_spark.functions.preprocessing import apply_pipeline

    part = _t(spark, sf_dir, "part")
    dirty = F.concat(F.lit("  "), F.upper("p_name"), F.lit(" - "), F.col("p_brand"), F.lit("! "))
    return part.select(
        F.col("p_partkey").alias("p_partkey"),
        apply_pipeline(dirty, "preprocess_name").alias("preprocessed"),
    )


def q_tfidf_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF vocabulary fit (SURVEY §2.4 V5) over documents."""
    from entitymatchingmodel_spark.operators.tfidf import TfIdfVectorizer

    docs = _t(spark, sf_dir, "documents").select("doc_id", F.col("text").alias("preprocessed"))
    model = TfIdfVectorizer(input_col="preprocessed", analyzer="words", ngram=1).fit(docs, "doc_id")
    return model.vocab.select(
        "token", F.col("df").cast("long").alias("df"), F.round("idf", 8).alias("idf")
    )


def _part_gt_names(spark: SparkSession, sf_dir: str):
    part = _t(spark, sf_dir, "part")
    gt = part.groupBy(F.col("p_name").alias("preprocessed")).agg(
        F.min("p_partkey").alias("gt_uid")
    )
    names = part.select(
        F.col("p_partkey").alias("uid"), F.col("p_name").alias("preprocessed")
    )
    return gt, names


def q_cossim_word_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k candidate join (SURVEY §2.5 J1), word tokens."""
    from entitymatchingmodel_spark.operators.cossim_indexer import CosSimIndexer

    gt, names = _part_gt_names(spark, sf_dir)
    model = CosSimIndexer(
        tokenizer="words", ngram=1, k=5, lower_bound=0.1, max_vocab=None,
        score_decimals=6,
    ).fit(gt)
    out = model.transform(names)
    return out.select("uid", "gt_uid", F.round("score", 6).alias("score"), "rank")


def q_sni_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighbourhood candidates (SURVEY §2.5 J3), window 5 (w=2)."""
    from entitymatchingmodel_spark.operators.sni_indexer import SNIIndexer

    gt, names = _part_gt_names(spark, sf_dir)
    model = SNIIndexer(window_length=5).fit(gt)
    out = model.transform(names)
    return out.select("uid", "gt_uid", F.round("score", 6).alias("score"), "rank")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate grouping by content hash (dedup family)."""
    from entitymatchingmodel_spark.operators.dedup import exact_duplicates

    docs = _t(spark, sf_dir, "documents")
    return exact_duplicates(docs, "doc_id", "text")


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-analysis ops: token count, char count, stopword ratio, quality."""
    from entitymatchingmodel_spark.functions.text import text_stats

    docs = _t(spark, sf_dir, "documents")
    return text_stats(docs, "doc_id", "text")


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k similarity search over embeddings."""
    from entitymatchingmodel_spark.operators.ann import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return cosine_topk(queries, emb, "vec_id", "embedding", k=5, score_decimals=6)


def q_tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational agg layer (filters/projections/aggregations, SURVEY §2.6)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """take_topn_per_group skew guard (SURVEY §2.7 W3): top-3 orders by price per customer segment."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", F.col("rn").alias("rn"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "preprocess_names": q_preprocess_names,
        "tfidf_vocab": q_tfidf_vocab,
        "cossim_word_topk": q_cossim_word_topk,
        "sni_window": q_sni_window,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "ann_cosine_topk": q_ann_cosine_topk,
        "tpch_q1_pricing": q_tpch_q1_pricing,
        "topn_per_group": q_topn_per_group,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_ORACLE = {
    "preprocess_names": """
        SELECT p_partkey,
               trim(regexp_replace(
                 lower(trim(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(concat('  ', upper(p_name), ' - ', p_brand, '! '),
                                        '[\\n\\r]', ' ', 'g'),
                       '[‐‑‒–—―−]', '-', 'g'),
                     '[-_]', ' ', 'g'),
                   '[[:punct:]$=“”¨]', ' ', 'g')
                 )),
               '\\s+', ' ', 'g')) AS preprocessed
        FROM part
    """,
    "tfidf_vocab": """
        WITH tok AS (
          SELECT doc_id, unnest(list_distinct(list_filter(
                   regexp_split_to_array(text, '[^a-zA-Z0-9]+'), x -> x <> ''))) AS token
          FROM documents
        ), n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT token, count(*) AS df,
               round(ln((n_docs + 1.0) / (count(*) + 1.0)), 8) AS idf
        FROM tok, n GROUP BY token, n_docs
    """,
    "cossim_word_topk": """
        WITH gt AS (SELECT p_name AS name, min(p_partkey) AS gt_uid FROM part GROUP BY p_name),
        nm AS (SELECT p_partkey AS uid, p_name AS name FROM part),
        gtok AS (SELECT gt_uid, unnest(list_distinct(list_filter(
                   regexp_split_to_array(name,'[^a-zA-Z0-9]+'), x -> x <> ''))) AS token FROM gt),
        n AS (SELECT count(*) AS n_docs FROM gt),
        vocab AS (SELECT token, count(*) AS df FROM gtok GROUP BY token),
        idf AS (SELECT token, ln((n_docs+1.0)/(df+1.0)) AS idf FROM vocab, n),
        gw AS (SELECT gt_uid, g.token, idf FROM gtok g JOIN idf USING(token)),
        gn AS (SELECT gt_uid, sqrt(sum(idf*idf)) AS nrm FROM gw GROUP BY gt_uid),
        gwn AS (SELECT gt_uid, token, idf/nrm AS wt FROM gw JOIN gn USING(gt_uid)),
        ntok AS (SELECT uid, unnest(list_distinct(list_filter(
                   regexp_split_to_array(name,'[^a-zA-Z0-9]+'), x -> x <> ''))) AS token FROM nm),
        nw AS (SELECT uid, t.token, idf FROM ntok t JOIN idf USING(token)),
        nn AS (SELECT uid, sqrt(sum(idf*idf)) AS nrm FROM nw GROUP BY uid),
        nwn AS (SELECT uid, token, idf/nrm AS wt FROM nw JOIN nn USING(uid)),
        pairs AS (SELECT uid, gt_uid, round(sum(q.wt*g.wt), 6) AS score
                  FROM nwn q JOIN gwn g USING(token) GROUP BY uid, gt_uid),
        ranked AS (SELECT uid, gt_uid, score,
                          row_number() OVER (PARTITION BY uid ORDER BY score DESC, gt_uid DESC) AS rank
                   FROM pairs WHERE score > 0.1)
        SELECT uid, gt_uid, round(score, 6) AS score, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 5
    """,
    "sni_window": """
        WITH gt AS (SELECT p_name AS name, min(p_partkey) AS gt_uid FROM part GROUP BY p_name),
        nm AS (SELECT p_partkey AS uid, p_name AS name FROM part),
        keys AS (SELECT DISTINCT name FROM (SELECT name FROM nm UNION ALL SELECT name FROM gt)),
        ranked AS (SELECT name, row_number() OVER (ORDER BY name) - 1 AS r FROM keys),
        gtr AS (SELECT gt_uid, r AS gt_r FROM gt JOIN ranked USING(name)),
        nmr AS (SELECT uid, r FROM nm JOIN ranked USING(name))
        SELECT uid, gt_uid,
               round(1.0 - abs(gt_r - r) / 3.0, 6) AS score,
               CAST(gt_r - r AS INT) AS rank
        FROM nmr JOIN gtr ON abs(gt_r - r) <= 2
    """,
    "dedup_exact": """
        SELECT md5(trim(lower(text))) AS content_hash,
               min(doc_id) AS rep_doc_id,
               count(*) AS group_size
        FROM documents GROUP BY 1
    """,
    "text_stats": """
        WITH tok AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'), x -> x <> '') AS toks,
                 length(text) AS n_chars
          FROM documents
        )
        SELECT doc_id,
               CAST(length(toks) AS INT) AS n_tokens,
               CAST(n_chars AS INT) AS n_chars,
               round(length(list_filter(toks, x -> lower(x) IN ('the','a','an','of','and','to','in','is')))
                     / CAST(length(toks) AS DOUBLE), 6) AS stopword_ratio,
               round(list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE)))
                     / CAST(length(toks) AS DOUBLE), 6) AS avg_token_len,
               CAST(length(list_distinct(toks)) AS INT) AS n_unique_tokens
        FROM tok
    """,
    "ann_cosine_topk": """
        WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20),
        scored AS (
          SELECT qid, e.vec_id AS nn_id,
                 round(list_cosine_similarity(CAST(qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS score
          FROM q, embeddings e
        ),
        ranked AS (SELECT qid, nn_id, score,
                          row_number() OVER (PARTITION BY qid ORDER BY score DESC, nn_id ASC) AS rank
                   FROM scored)
        SELECT qid, nn_id, score, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
    """,
    "tpch_q1_pricing": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 6) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "topn_per_group": """
        WITH j AS (
          SELECT c_mktsegment, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders JOIN customer ON o_custkey = c_custkey
        )
        SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
        FROM j WHERE rn <= 3
    """,
}


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)
