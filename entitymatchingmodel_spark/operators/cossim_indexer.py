"""Cosine-similarity top-k candidate indexer — pure-Catalyst inverted-index join.

Reference (emm/indexing/spark_cos_sim_matcher.py) collects the whole GT TF-IDF
matrix to the driver, broadcasts it, and runs a C++ sparse-matmul kernel inside
``rdd.mapPartitions`` (spark_indexing_utils.py:51-100, spark_cos_sim_matcher.py
:295-318, 645-675).  That design caps GT size at driver/executor memory and
bypasses Catalyst entirely.

This engine expresses the same top-k cosine join behind THREE
interchangeable physical strategies (SURVEY.md §2.5 J1, §7 item 4):

strategy='inverted' (default) — pure Catalyst:

    names weights (uid, token, w)  ⋈ token ⋈  gt weights (gt_uid, token, w)
    -> groupBy(uid, gt_uid).sum(w*w')         # cosine numerator; L2-normed
    -> filter score > lower_bound             # threshold pushdown (X4)
    -> row_number over (uid, score desc)      # top-k (X3), ties gt_uid desc

Scale properties: no driver collect, no manual broadcast; the token join
shuffles on token (AQE handles skew), the score agg shuffles on (uid, gt_uid)
with map-side partial aggregation.  Blocking (X2) becomes an extra equi-join
key, i.e. real partition pruning.  Hot-token guard: optional ``max_df_frac``
drops tokens present in > frac of GT docs (their idf ~ 0, so they contribute
negligible score but quadratic join work).

strategy='broadcast' — the reference-faithful kernel path (ref
spark_indexing_utils.py:51-100 collect, spark_cos_sim_matcher.py:716-719
broadcast, :295-318 C++ kernel): the GT inverted index is collected once,
broadcast as numpy postings arrays, and each Arrow batch of query vectors is
scored by a vectorized scatter-add kernel with top-k + threshold pushdown —
zero shuffles in transform, one pass over the names.  Executor memory bound:
postings (nnz x 12B) + one dense float64 accumulator of |GT| per task.
Right when GT fits in memory and names >> GT; 'inverted' is the path past
that.  Both produce identical results (oracle-verified).

strategy='lsh' — MinHash-LSH candidate pruning before the exact rescore
(SURVEY §7's "optional later" approxSimilarityJoin alternative): band-
bucket join over signatures of the two token SETS generates candidate
pairs, then only those pairs are scored — exact cosine on a recall-
bounded candidate set, with the join space bounded by band buckets
instead of token postings.  The path for corpora where even max_df_frac
pruning leaves the token join too hot.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from entitymatchingmodel_spark import schema as S
from entitymatchingmodel_spark.operators.tfidf import TfIdfModel, TfIdfVectorizer


def first_char_block(c: Column) -> Column:
    """Default blocking function (ref helper/blocking_functions.py:31-46)."""
    return F.substring(F.regexp_replace(c, "\\s", ""), 1, 1)


def _validate_lsh_params(num_hashes: int, bands: int, rows_per_band: int) -> None:
    """Fail fast at CONSTRUCTION on an impossible banding layout: band b
    reads signature slots [b*rows_per_band, (b+1)*rows_per_band), so
    bands * rows_per_band > num_hashes would otherwise surface much later
    inside transform() as an unresolved-column `_m{i}` AnalysisException
    (round-7 review finding)."""
    if num_hashes < 1 or bands < 1 or rows_per_band < 1:
        raise ValueError(
            "lsh_num_hashes, lsh_bands and lsh_rows_per_band must all be >= 1"
        )
    if bands * rows_per_band > num_hashes:
        raise ValueError(
            f"lsh_bands * lsh_rows_per_band ({bands} * {rows_per_band} = "
            f"{bands * rows_per_band}) exceeds lsh_num_hashes ({num_hashes}); "
            "each band consumes rows_per_band distinct signature slots"
        )


def _lsh_band_keys(
    w: DataFrame, id_col: str, num_hashes: int, bands: int, rows_per_band: int
) -> DataFrame:
    """(id, band, bkey) from a long-form token-weight frame: MinHash
    signature over each id's TOKEN SET (binary tf-idf emits one row per
    (id, token), so the frame already is the set), banded with the same
    signature/band construction as the document LSH (operators/dedup.py
    minhash_signatures / minhash_lsh_pairs — shared md5_int base hash and
    xor-shift-multiply permutation family, so the DuckDB oracle for one
    is the oracle for the other).  Ids with zero tokens have no rows here
    and therefore no candidates — same outcome as the inverted strategy,
    where no tokens means no postings."""
    from entitymatchingmodel_spark.operators.dedup import _hash_family, md5_int

    hv = w.select(F.col(id_col), md5_int(F.col("token")).alias("_h"))
    mins = hv.groupBy(id_col).agg(
        *[
            F.min(_hash_family(F.col("_h"), i)).alias(f"_m{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        F.col(id_col),
        F.explode_outer(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"_m{b * rows_per_band + r}")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))


class CosSimIndexerModel:
    def __init__(
        self,
        tfidf: TfIdfModel,
        gt_weights: DataFrame,  # (gt_uid, token [, block], gt_weight)
        k: int,
        lower_bound: float,
        blocking_func,
        input_col: str,
        score_decimals: int | None = None,
        strategy: str = "inverted",
        lsh_num_hashes: int = 32,
        lsh_bands: int = 8,
        lsh_rows_per_band: int = 4,
    ):
        self.tfidf = tfidf
        self.gt_weights = gt_weights
        self.k = k
        self.lower_bound = lower_bound
        self.blocking_func = blocking_func
        self.input_col = input_col
        self.score_decimals = score_decimals
        self.strategy = strategy
        self.lsh_num_hashes = lsh_num_hashes
        self.lsh_bands = lsh_bands
        self.lsh_rows_per_band = lsh_rows_per_band
        if strategy == "lsh":
            _validate_lsh_params(lsh_num_hashes, lsh_bands, lsh_rows_per_band)
        self._bc = None  # lazy broadcast kernel state
        self._gt_bands = None  # lazy GT band-key table (lsh path)
        # lsh path: ONE rotating slot for the current transform's
        # names-side weight cache — each transform() releases the
        # previous call's frame, so a fit-once/transform-many loop holds
        # at most one names-side cache plus the static GT bands (round-7
        # review: the old append-only list grew one persisted frame per
        # batch for the model's lifetime).
        self._lsh_names_cache = None

    def unpersist(self) -> None:
        """Release cached index state — persisted GT weights/vocab and the
        broadcast kernel.  The reference leaks its GT broadcast on re-fit
        (spark_cos_sim_matcher.py:721-729, "restart the session instead");
        here handles are explicit so re-fit reclaims executor memory."""
        self.gt_weights.unpersist()
        self.tfidf.vocab.unpersist()
        if self._bc is not None:
            self._bc.unpersist()
            self._bc = None
        if self._lsh_names_cache is not None:
            self._lsh_names_cache.unpersist()
            self._lsh_names_cache = None
        if self._gt_bands is not None:
            self._gt_bands.unpersist()
            self._gt_bands = None

    def bucketize(self, table_name: str, buckets: int = 64) -> "CosSimIndexerModel":
        """Persist the GT inverted index as a token-bucketed table and use it.

        The GT side of the token join is large, static, and reused by every
        transform; bucketing it on the join key means Catalyst only shuffles
        the (smaller, per-batch) names side into the existing bucketing —
        the classic co-located-join setup for a 100 TB-scale static index.
        Verifiable in the plan: the GT scan loses its Exchange.
        """
        spark = self.gt_weights.sparkSession
        (
            self.gt_weights.write.bucketBy(buckets, "token")
            .sortBy("token")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(table_name)
        )
        self.gt_weights = spark.table(table_name)
        return self

    # ------------------------------------------------- broadcast kernel
    def _build_kernel(self):
        """Collect the GT inverted index once; broadcast postings arrays.

        Layout: tokens sorted; for token id t, its GT postings are
        post_gt[indptr[t]:indptr[t+1]] (int32 row indices into gt_uids)
        with weights post_w[...] (float64) — a hand-rolled CSR over tokens
        (scipy is not available in this environment).
        """
        pdf = (
            self.gt_weights.select("token", "gt_uid", "gt_weight")
            .toPandas()
            .sort_values(["token", "gt_uid"], kind="mergesort")
        )
        tokens = pdf["token"].to_numpy()
        uniq_tokens, tok_start = np.unique(tokens, return_index=True)
        indptr = np.append(tok_start, len(tokens)).astype(np.int64)
        gt_uids, gt_rows = np.unique(pdf["gt_uid"].to_numpy(), return_inverse=True)
        tok2id = {t: i for i, t in enumerate(uniq_tokens)}
        state = (
            tok2id,
            indptr,
            gt_rows.astype(np.int32),
            pdf["gt_weight"].to_numpy(dtype=np.float64),
            gt_uids,
        )
        sc = self.gt_weights.sparkSession.sparkContext
        self._bc = sc.broadcast(state)

    def _transform_broadcast(self, names: DataFrame) -> DataFrame:
        if self.blocking_func is not None:
            raise ValueError(
                "blocking_func is an equi-join key and only applies to the "
                "'inverted' strategy; the broadcast kernel has no block "
                "restriction (ref supports it via per-block matrices — use "
                "strategy='inverted' for blocked configs)"
            )
        if self._bc is None:
            self._build_kernel()
        bc = self._bc
        k, lb, dec = self.k, self.lower_bound, self.score_decimals

        # Token weights are computed JVM-side by the SAME tfidf plan as the
        # inverted path (bit-identical weights), then grouped per uid.
        q = self.tfidf.transform(names, S.UID)
        vecs = q.groupBy(S.UID).agg(
            F.collect_list("token").alias("_toks"),
            F.collect_list("weight").alias("_ws"),
        )

        def kernel(batches):
            import pandas as pd

            tok2id, indptr, post_gt, post_w, gt_uids = bc.value
            scores = np.zeros(len(gt_uids), dtype=np.float64)
            for pdf_in in batches:
                out_uid, out_gt, out_score, out_rank = [], [], [], []
                for uid, toks, ws in zip(pdf_in[S.UID], pdf_in["_toks"], pdf_in["_ws"]):
                    touched_all = []
                    for t, w in zip(toks, ws):
                        tid = tok2id.get(t)
                        if tid is None:
                            continue
                        seg = slice(indptr[tid], indptr[tid + 1])
                        rows = post_gt[seg]
                        np.add.at(scores, rows, w * post_w[seg])
                        touched_all.append(rows)
                    if not touched_all:
                        continue
                    touched = np.unique(np.concatenate(touched_all))
                    s = scores[touched]
                    scores[touched] = 0.0  # O(nnz) reset for the next row
                    if dec is not None:
                        s = np.round(s, dec)
                    keep = s > lb
                    s, cand = s[keep], touched[keep]
                    if s.size == 0:
                        continue
                    # top-k, ties by gt_uid DESC (ref X15 tie-break)
                    order = np.lexsort((-gt_uids[cand], -s))[:k]
                    n = len(order)
                    out_uid.extend([uid] * n)
                    out_gt.extend(gt_uids[cand[order]])
                    out_score.extend(s[order])
                    out_rank.extend(range(1, n + 1))
                yield pd.DataFrame(
                    {"uid": out_uid, "gt_uid": out_gt,
                     "score": out_score, "rank": out_rank}
                )

        return vecs.mapInPandas(
            kernel, schema=f"{S.UID} long, gt_uid long, score double, rank int"
        )

    def _score_topk(self, pairs: DataFrame) -> DataFrame:
        """(uid, gt_uid, weight, gt_weight) rows -> scored top-k — the
        shared tail of the inverted and lsh strategies, so rounding /
        threshold / tie-break rules cannot drift between them."""
        score = F.sum(F.col("weight") * F.col("gt_weight"))
        if self.score_decimals is not None:
            # Round BEFORE threshold/rank (ref rounds before ranking, SURVEY
            # §4 X15) so summation-order float noise cannot flip the top-k set.
            score = F.round(score, self.score_decimals)
        scores = (
            pairs.groupBy(S.UID, "gt_uid")
            .agg(score.alias("score"))
            .filter(F.col("score") > F.lit(self.lower_bound))
        )
        w = Window.partitionBy(S.UID).orderBy(F.desc("score"), F.desc("gt_uid"))
        return (
            scores.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= self.k)
            .select(
                S.UID,
                "gt_uid",
                F.col("score").cast("double").alias("score"),
                F.col("rank").cast("int").alias("rank"),
            )
        )

    def _transform_lsh(self, names: DataFrame) -> DataFrame:
        """LSH candidate pruning before the exact rescore (SURVEY §7's
        'optional later' approxSimilarityJoin alternative): band-bucket
        join of MinHash signatures over the two token SETS generates
        candidate (uid, gt_uid) pairs, then ONLY those pairs get the
        exact cosine score — same rounding/threshold/tie rules as the
        other strategies.

        Scale shape: the inverted strategy's join space is the token
        postings product, which hot tokens inflate quadratically (bounded
        today by max_df_frac pruning); here the join space is band-bucket
        sized — the classic LSH trade-off.  Output is EXACT cosine on a
        RECALL-BOUNDED candidate set: pairs whose token sets share no
        band are missed (probability (1 - j^r)^b for Jaccard j), so this
        is the approximate physical strategy while 'inverted' and
        'broadcast' stay exact.  The names-side weights feed both the
        signature and the rescore, so they are persisted for the
        transform's lifetime (released by unpersist())."""
        if self.blocking_func is not None:
            raise ValueError(
                "blocking_func composes with the 'inverted' strategy only; "
                "LSH banding is itself the candidate-pruning mechanism"
            )
        # Rotate the names-side cache: release the PREVIOUS transform's
        # weight frame before persisting this one (the order matters —
        # Spark's CacheManager matches cached plans STRUCTURALLY, so for
        # an identical names batch persist-then-unpersist would drop the
        # shared entry), keeping a fit-once/transform-many loop at one
        # cached names frame, not one per batch.  The previous call's
        # returned plan stays valid — it recomputes from lineage if
        # executed again after eviction.
        if self._lsh_names_cache is not None:
            self._lsh_names_cache.unpersist()
            self._lsh_names_cache = None
        q = self.tfidf.transform(names, S.UID).persist()
        self._lsh_names_cache = q
        qb = _lsh_band_keys(
            q, S.UID, self.lsh_num_hashes, self.lsh_bands, self.lsh_rows_per_band
        )
        if self._gt_bands is None:
            # the GT side is static per fitted model: compute its band keys
            # once and persist (fit-once/query-many, like the broadcast
            # kernel's lazy state); released by unpersist()
            self._gt_bands = _lsh_band_keys(
                self.gt_weights, "gt_uid",
                self.lsh_num_hashes, self.lsh_bands, self.lsh_rows_per_band,
            ).persist()
        gb = self._gt_bands
        cands = (
            qb.join(gb, ["band", "bkey"])
            .select(S.UID, "gt_uid")
            .dropDuplicates([S.UID, "gt_uid"])
        )
        pairs = cands.join(q, S.UID).join(self.gt_weights, ["gt_uid", "token"])
        return self._score_topk(pairs)

    def transform(self, names: DataFrame) -> DataFrame:
        """names (uid, preprocessed, ...) -> (uid, gt_uid, score, rank)."""
        if self.strategy == "broadcast":
            return self._transform_broadcast(names)
        if self.strategy == "lsh":
            return self._transform_lsh(names)
        q = self.tfidf.transform(names, S.UID)
        join_keys = ["token"]
        if self.blocking_func is not None:
            blocks = names.select(
                S.UID, self.blocking_func(F.col(self.input_col)).alias("block")
            )
            q = q.join(blocks, S.UID)
            join_keys = ["token", "block"]
        pairs = q.join(self.gt_weights, join_keys)
        return self._score_topk(pairs)


class CosSimIndexer:
    """Estimator half: fit(gt) builds the vocabulary + GT inverted index.

    Parameters mirror the reference indexer spec (emm/parameters.py:34-47):
    tokenizer 'words'|'characters', ngram, num_candidates k, cos_sim_lower_bound,
    optional blocking_func.
    """

    def __init__(
        self,
        tokenizer: str = "words",
        ngram: int = 1,
        k: int = 10,
        lower_bound: float = 0.5,
        blocking_func=None,
        binary: bool = True,
        input_col: str = S.PREPROCESSED,
        max_vocab: int | None = 2**25,
        max_df_frac: float | None = None,
        score_decimals: int | None = None,
        strategy: str = "inverted",
        lsh_num_hashes: int = 32,
        lsh_bands: int = 8,
        lsh_rows_per_band: int = 4,
    ):
        if strategy not in ("inverted", "broadcast", "lsh"):
            raise ValueError(f"unknown strategy {strategy!r}")
        if strategy == "lsh":
            _validate_lsh_params(lsh_num_hashes, lsh_bands, lsh_rows_per_band)
        self.tokenizer = tokenizer
        self.ngram = ngram
        self.k = k
        self.lower_bound = lower_bound
        self.blocking_func = blocking_func
        self.binary = binary
        self.input_col = input_col
        self.max_vocab = max_vocab
        self.max_df_frac = max_df_frac
        self.score_decimals = score_decimals
        self.strategy = strategy
        self.lsh_num_hashes = lsh_num_hashes
        self.lsh_bands = lsh_bands
        self.lsh_rows_per_band = lsh_rows_per_band

    def fit(self, gt: DataFrame) -> CosSimIndexerModel:
        vec = TfIdfVectorizer(
            input_col=self.input_col,
            analyzer=self.tokenizer,
            ngram=self.ngram,
            binary=self.binary,
            max_vocab=self.max_vocab,
        )
        model = vec.fit(gt, "gt_uid")
        if self.max_df_frac is not None:
            model.vocab = model.vocab.filter(
                F.col("df") <= F.lit(self.max_df_frac * model.n_docs)
            )
        gt_w = model.transform(gt, "gt_uid", out_prefix="gt_")
        if self.blocking_func is not None:
            blocks = gt.select(
                "gt_uid", self.blocking_func(F.col(self.input_col)).alias("block")
            )
            gt_w = gt_w.join(blocks, "gt_uid")
        # GT index is reused by every transform: persist once.
        gt_w = gt_w.persist()
        return CosSimIndexerModel(
            tfidf=model,
            gt_weights=gt_w,
            k=self.k,
            lower_bound=self.lower_bound,
            blocking_func=self.blocking_func,
            input_col=self.input_col,
            score_decimals=self.score_decimals,
            strategy=self.strategy,
            lsh_num_hashes=self.lsh_num_hashes,
            lsh_bands=self.lsh_bands,
            lsh_rows_per_band=self.lsh_rows_per_band,
        )
