"""Scaling probe: does each core operator scale ~linearly with input size?

Inflates the part-name GT by suffix-noising (the reference's own
``increase_dataset`` bench idiom, tests/benchmark/test_bench.py:62-94) and
times the core operators at 1x/4x/10x.  A superlinear ratio (>~1.5x the
size ratio) flags a plan that would not survive the 100x scale-up.

Usage: python tools/scale_probe.py [sf_dir]
       python tools/scale_probe.py --spans   (span-heavy long-doc probe:
       remove_duplicate_passages must be ~linear in document length even
       when every document carries hundreds of disjoint duplicated spans —
       guards the O(tokens + spans) complement-gap rebuild against a
       regression back to the O(tokens × spans) per-token span test)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from entitymatchingmodel_spark.session import get_spark

_POS_ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = _POS_ARGS[0] if _POS_ARGS else "/root/testdata/sf0.1"
FACTORS = [1, 4, 10]


def inflate(df, col, factor):
    """factor copies of each row with distinct name suffixes."""
    if factor == 1:
        return df
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    return (
        df.withColumn("_r", reps)
        .withColumn(col, F.when(F.col("_r") == 0, F.col(col))
                    .otherwise(F.concat(F.col(col), F.lit(" v"), F.col("_r"))))
        .drop("_r")
    )


def span_heavy_probe():
    """Time remove_duplicate_passages on synthetic long documents where a
    shared 12-token passage recurs every ~40 tokens — so spans-per-doc
    grows with document length.  Under the O(tokens × spans) per-token
    formulation the cost is quadratic in length (10^5 tokens × 10^3 spans
    = 10^8 comparisons in ONE task); the complement-gap rebuild keeps it
    linear.  Flags a >1.8× superlinear ratio."""
    from entitymatchingmodel_spark.operators.dedup import remove_duplicate_passages

    spark = get_spark("span-probe")
    spark.sparkContext.setLogLevel("ERROR")
    passage = " ".join(f"p{i}" for i in range(12))
    n_docs = 64
    lengths = [2_500, 10_000, 25_000]  # tokens per doc (~40/block × blocks)
    times = []
    for n_blocks in [length // 40 for length in lengths]:
        # block = 28 unique filler tokens + the shared passage → every
        # occurrence but the corpus-wide winner is a loser span
        block = F.concat_ws(
            " ",
            F.concat_ws(" ", F.transform(
                F.sequence(F.lit(1), F.lit(28)),
                lambda j: F.concat(F.lit("u"), F.col("doc_id"),
                                   F.lit("_"), F.col("_b"), F.lit("_"), j),
            )),
            F.lit(passage),
        )
        docs = (
            spark.range(n_docs).withColumnRenamed("id", "doc_id")
            .withColumn("_b", F.explode(F.sequence(F.lit(1), F.lit(n_blocks))))
            .withColumn("_blk", block)
            .groupBy("doc_id")
            .agg(F.concat_ws(" ", F.sort_array(F.collect_list(
                F.struct("_b", "_blk"))).getField("_blk")).alias("text"))
            .repartition(spark.sparkContext.defaultParallelism)
        )
        docs = docs.persist()
        docs.count()
        t0 = time.time()
        remove_duplicate_passages(docs, "doc_id", "text", window=12, stride=5) \
            .write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        docs.unpersist()
        times.append(dt)
        print(f"  {n_blocks * 40:7d} tokens/doc x {n_docs} docs "
              f"(~{n_blocks} spans/doc): {dt:7.2f}s", flush=True)
    print("\nspan-probe ratios (vs shortest):")
    size_ratios = [length / lengths[0] for length in lengths]
    ratios = [round(t / times[0], 2) for t in times]
    flag = "  <-- SUPERLINEAR" if ratios[-1] > size_ratios[-1] * 1.8 else ""
    print(f"  sizes {size_ratios} -> times {ratios}{flag}")


def main():
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    results: dict[str, list[float]] = {}

    def run(name, fn):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        results.setdefault(name, []).append(dt)
        print(f"  {name:24s} {dt:7.2f}s", flush=True)

    for factor in FACTORS:
        print(f"-- factor {factor}")
        gt = inflate(
            part.groupBy(F.col("p_name").alias("preprocessed")).agg(
                F.min("p_partkey").alias("gt_uid")
            ),
            "preprocessed", factor,
        ).withColumn("gt_uid", F.xxhash64("preprocessed"))
        names = inflate(
            part.select(F.col("p_partkey").alias("uid"),
                        F.col("p_name").alias("preprocessed")),
            "preprocessed", factor,
        ).withColumn("uid", F.xxhash64("preprocessed", F.lit(1)))
        d = inflate(docs.select("doc_id", "text"), "text", factor).withColumn(
            "doc_id", F.xxhash64("text")
        ).repartition(spark.sparkContext.defaultParallelism)

        def cossim():
            from entitymatchingmodel_spark.operators.cossim_indexer import CosSimIndexer
            m = CosSimIndexer(tokenizer="words", ngram=1, k=5, lower_bound=0.1).fit(gt)
            return m.transform(names)

        def cossim_bc():
            from entitymatchingmodel_spark.operators.cossim_indexer import CosSimIndexer
            m = CosSimIndexer(tokenizer="words", ngram=1, k=5, lower_bound=0.1,
                              strategy="broadcast").fit(gt)
            return m.transform(names)

        def sni():
            from entitymatchingmodel_spark.operators.sni_indexer import SNIIndexer
            return SNIIndexer(window_length=5).fit(gt).transform(names)

        def minhash():
            from entitymatchingmodel_spark.operators.dedup import (
                minhash_lsh_pairs, minhash_signatures)
            return minhash_lsh_pairs(
                minhash_signatures(d, "doc_id", "text", num_hashes=32, shingle_n=3)
            )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        emb_inf = (
            emb.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
            .withColumn("vec_id", F.col("vec_id") + F.col("_r") * 10_000_000)
            .drop("_r")
            .repartition(spark.sparkContext.defaultParallelism)
        )

        def ann():
            from entitymatchingmodel_spark.operators.ann import cosine_topk
            q = emb.filter(F.col("vec_id") < 20)
            return cosine_topk(q, emb_inf, "vec_id", "embedding", k=5)

        def linededup():
            from entitymatchingmodel_spark.operators.dedup import line_dedup
            multi = d.select(
                "doc_id",
                F.regexp_replace("text", r"(([^ ]+ ){8})", "$1\n").alias("text"),
            )
            return line_dedup(multi, "doc_id", "text")

        def budget():
            from entitymatchingmodel_spark.functions.sampling import (
                token_budget_sample,
            )
            toks = F.filter(F.split(F.col("text"), "[^a-zA-Z0-9]+"),
                            lambda x: x != "")
            wdf = d.select("doc_id", F.size(toks).alias("w"))
            return token_budget_sample(wdf, "doc_id", "w", budget=2_000_000)

        def pack():
            from entitymatchingmodel_spark.functions.sampling import pack_sequences
            toks = F.filter(F.split(F.col("text"), "[^a-zA-Z0-9]+"),
                            lambda x: x != "")
            wdf = d.select("doc_id", F.size(toks).cast("long").alias("w"))
            return pack_sequences(wdf, "doc_id", "w", seq_len=512)

        from entitymatchingmodel_spark.operators.events import load_events

        ev = load_events(spark, f"{SF_DIR}/events.parquet")
        ev_inf = (
            ev.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
            .withColumn("user_id", F.col("user_id") + F.col("_r") * 10_000_000)
            .withColumn("event_id", F.xxhash64("event_id", "_r"))
            .drop("_r")
            .repartition(spark.sparkContext.defaultParallelism)
        )

        def asof():
            from entitymatchingmodel_spark.operators.events import asof_join
            left = ev_inf.select("event_id", "user_id", "ts")
            right = (
                ev_inf.filter(F.col("event_type") == "purchase")
                .groupBy("user_id", "ts").agg(F.max("value").alias("v"))
            )
            return asof_join(left, right, "user_id", "ts", ["v"],
                             tolerance_seconds=3600)

        def ivjoin():
            from entitymatchingmodel_spark.operators.events import (
                interval_join, sessionize)
            sessions = sessionize(ev_inf, gap_minutes=30).select(
                "user_id", "session_id", "session_start", "session_end")
            return interval_join(
                ev_inf.select("event_id", "user_id", "ts"),
                sessions, "user_id", "ts", "session_start", "session_end")

        def group_cap():
            from entitymatchingmodel_spark.functions.sampling import per_group_cap
            grouped = d.withColumn("grp", F.pmod(F.xxhash64("doc_id"), F.lit(20)))
            return per_group_cap(grouped, "doc_id", "grp", max_per_group=50)

        def dup_windows():
            from entitymatchingmodel_spark.operators.dedup import (
                duplicate_window_stats,
            )
            return duplicate_window_stats(d, "doc_id", "text", window=12, stride=5)

        run("cossim_inverted", cossim)
        run("cossim_broadcast", cossim_bc)
        run("sni", sni)
        run("minhash_lsh", minhash)
        run("ann_gemm_topk", ann)
        run("line_dedup", linededup)
        run("token_budget", budget)
        run("pack_sequences", pack)
        run("asof_join", asof)
        run("interval_join", ivjoin)
        run("per_group_cap", group_cap)
        run("dup_window_stats", dup_windows)

    print("\nscaling ratios (vs 1x):")
    for name, ts in results.items():
        ratios = [round(t / ts[0], 2) for t in ts]
        flag = ""
        if ratios[-1] > FACTORS[-1] * 1.5:
            flag = "  <-- SUPERLINEAR"
        print(f"  {name:24s} {ratios}{flag}")


def r9_probe():
    """r9 additions probe (verdict task 9): chunk_documents vs DOCUMENT
    LENGTH, the repeat-explode vs repeat FACTOR, ppl_bands and
    gopher_repetition vs CORPUS SIZE, and temperature_mix_unbounded vs
    GROUP CARDINALITY (the join-based plan must be ~flat in group count
    at fixed corpus size — that is its whole point)."""
    import time as _t

    spark = get_spark("r9-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
    docs.count()

    def timed(label, df):
        t0 = _t.time()
        df.write.format("noop").mode("overwrite").save()
        dt = _t.time() - t0
        print(f"  {label:34s} {dt:7.2f}s", flush=True)
        return dt

    def report(name, sizes, times, limit=1.5):
        ratios = [round(t / times[0], 2) for t in times]
        srat = [round(s / sizes[0], 1) for s in sizes]
        flag = "  <-- SUPERLINEAR" if ratios[-1] > srat[-1] * limit else ""
        print(f"{name}: sizes {srat} -> times {ratios}{flag}", flush=True)

    from entitymatchingmodel_spark.functions.sampling import (
        _group_repeat_explode,
        temperature_mix_unbounded,
    )
    from entitymatchingmodel_spark.functions.text import (
        chunk_documents,
        gopher_repetition_table,
    )
    from entitymatchingmodel_spark.operators.lm import BigramLM, perplexity_bands

    # 1) chunk_documents vs document length (fixed doc count)
    sizes, times = [], []
    for k in FACTORS:
        long_docs = docs.select(
            "doc_id",
            F.concat_ws(" ", F.array_repeat(F.col("text"), k)).alias("text"),
        )
        times.append(timed(f"chunk_documents len x{k}",
                           chunk_documents(long_docs, "doc_id", "text", 256)))
        sizes.append(k)
    report("chunk_documents(doc length)", sizes, times)

    # 2) repeat-explode vs repeat factor (output scales with the factor)
    sizes, times = [], []
    grouped = docs.withColumn("grp", F.lit("g"))
    for k in FACTORS:
        times.append(timed(
            f"repeat_explode factor {k}",
            _group_repeat_explode(grouped, "doc_id", "grp", {"g": float(k)}, "sp"),
        ))
        sizes.append(k)
    report("_group_repeat_explode(factor)", sizes, times)

    # 3) ppl_bands vs corpus size (model fit once on the base corpus)
    model = BigramLM.fit(docs, "text", score_decimals=6)
    sizes, times = [], []
    for k in FACTORS:
        d = (
            docs.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
            .withColumn("doc_id", F.xxhash64("doc_id", "_r")).drop("_r")
            .repartition(spark.sparkContext.defaultParallelism)
        )
        times.append(timed(f"ppl_bands corpus x{k}",
                           perplexity_bands(d, "doc_id", "text", model, "lang")))
        sizes.append(k)
    model.unpersist()
    report("ppl_bands(corpus)", sizes, times)

    # 4) gopher_repetition vs corpus size
    sizes, times = [], []
    for k in FACTORS:
        d = (
            docs.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
            .withColumn("doc_id", F.xxhash64("doc_id", "_r")).drop("_r")
            .repartition(spark.sparkContext.defaultParallelism)
        )
        times.append(timed(f"gopher_repetition corpus x{k}",
                           gopher_repetition_table(d, "doc_id", "text")))
        sizes.append(k)
    report("gopher_repetition(corpus)", sizes, times)

    # 5) temperature_mix_unbounded vs group cardinality (fixed corpus):
    #    must be ~FLAT — the fraction table scales, the plan does not
    sizes, times = [], []
    for buckets in (100, 10_000, 1_000_000):
        grouped = docs.withColumn(
            "grp",
            F.concat_ws("_", "source",
                        F.pmod(F.xxhash64("doc_id"), F.lit(buckets)).cast("string")),
        )
        times.append(timed(
            f"tmix_unbounded groups~{buckets}",
            temperature_mix_unbounded(grouped, "doc_id", "grp", 0.5),
        ))
        sizes.append(buckets)
    ratios = [round(t / times[0], 2) for t in times]
    flag = "  <-- NOT FLAT" if ratios[-1] > 2.0 else ""
    print(f"temperature_mix_unbounded(group cardinality): x100 -> x1e6 "
          f"times {ratios}{flag}", flush=True)
    docs.unpersist()


def r9b_probe():
    """r9 second-tranche probe: DSIR fit+score, PQ encode, IVF-PQ search,
    and the blocklist screen vs CORPUS SIZE (1x/4x/10x).  All four must be
    ~linear: DSIR's bucket table and PQ's codebook are fixed-size, so only
    the corpus-side scans/rollups should grow."""
    import time as _t

    spark = get_spark("r9b-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base_emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def timed(label, df):
        t0 = _t.time()
        df.write.format("noop").mode("overwrite").save()
        dt = _t.time() - t0
        print(f"  {label:34s} {dt:7.2f}s", flush=True)
        return dt

    def report(name, sizes, times, limit=1.5):
        ratios = [round(t / times[0], 2) for t in times]
        srat = [round(s / sizes[0], 1) for s in sizes]
        flag = "  <-- SUPERLINEAR" if ratios[-1] > srat[-1] * limit else ""
        print(f"{name}: sizes {srat} -> times {ratios}{flag}", flush=True)

    def inflate_docs(k):
        return base_docs.select(
            "doc_id", "text", "lang",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"),
        ).select(
            (F.col("doc_id") * k + F.col("_i")).alias("doc_id"), "text", "lang"
        )

    def inflate_emb(k):
        return base_emb.select(
            "vec_id", "embedding",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"),
        ).select(
            (F.col("vec_id") * k + F.col("_i")).alias("vec_id"), "embedding"
        )

    from entitymatchingmodel_spark.functions.selection import (
        dsir_bucket_logratios,
        dsir_scores,
    )
    from entitymatchingmodel_spark.functions.text import blocked_terms_table
    from entitymatchingmodel_spark.operators.pq import (
        ivf_pq_topk,
        pq_codebooks_from_ids,
        pq_encode,
    )

    # 1) DSIR fit+score vs corpus size
    sizes, times = [], []
    for k in FACTORS:
        d = inflate_docs(k).persist()
        d.count()
        t0 = _t.time()
        ratios = dsir_bucket_logratios(
            d.where("lang = 'en'"), d, "doc_id", "text", n_buckets=4096
        )
        dt_fit = _t.time() - t0  # fit materializes (localCheckpoint)
        t = timed(f"dsir fit+score corpus x{k}",
                  dsir_scores(d, ratios, "doc_id", "text", n_buckets=4096))
        times.append(dt_fit + t)
        sizes.append(k)
        d.unpersist()
    report("dsir_fit_score vs corpus", sizes, times)

    # 2) blocklist screen vs corpus size (map-only -> must track the scan)
    sizes, times = [], []
    for k in FACTORS:
        d = inflate_docs(k).persist()
        d.count()
        times.append(timed(f"blocked_terms corpus x{k}",
                           blocked_terms_table(d, "doc_id", "text",
                                               ["spark", "slow", "dup"])))
        sizes.append(k)
        d.unpersist()
    report("blocked_terms vs corpus", sizes, times)

    # 3) PQ encode + IVF-PQ search vs corpus size (fixed query batch)
    sizes, t_enc, t_srch = [], [], []
    for k in FACTORS:
        e = inflate_emb(k).persist()
        e.count()
        cb = pq_codebooks_from_ids(e, "vec_id", "embedding", 4, 16,
                                   normalize=True)
        t_enc.append(timed(f"pq_encode corpus x{k}",
                           pq_encode(e, cb, "vec_id", "embedding", 4)))
        q = e.filter(F.col("vec_id") < 20)
        t_srch.append(timed(f"ivf_pq_topk corpus x{k}",
                            ivf_pq_topk(q, e, "vec_id", "embedding", k=5,
                                        nlist=16, nprobe=4, m=4, pq_k=16,
                                        codebooks=cb, score_decimals=6)))
        sizes.append(k)
        e.unpersist()
    report("pq_encode vs corpus", sizes, t_enc)
    report("ivf_pq_topk vs corpus", sizes, t_srch)


def r9c_probe():
    """r9 late-tranche probe: the C4 rules vs DOCUMENT LENGTH (line count),
    curate_batch / pareto_keep / QualityClassifier.score vs CORPUS SIZE
    (1x/4x/10x).  All map-only or bounded-rollup shapes — expect ~linear;
    the classifier is FIT ONCE on the base corpus (the fit-once posture)
    and only scoring is scaled."""
    import time as _t

    spark = get_spark("r9c-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
    docs.count()

    def timed(label, df):
        t0 = _t.time()
        df.write.format("noop").mode("overwrite").save()
        dt = _t.time() - t0
        print(f"  {label:34s} {dt:7.2f}s", flush=True)
        return dt

    def report(name, sizes, times, limit=1.5):
        ratios = [round(t / times[0], 2) for t in times]
        srat = [round(s / sizes[0], 1) for s in sizes]
        flag = "  <-- SUPERLINEAR" if ratios[-1] > srat[-1] * limit else ""
        print(f"{name}: sizes {srat} -> times {ratios}{flag}", flush=True)

    from entitymatchingmodel_spark.functions.text import c4_rules_table
    from entitymatchingmodel_spark.operators.curation import curate_batch
    from entitymatchingmodel_spark.operators.quality_clf import (
        QualityClassifier,
        pareto_keep,
    )

    def corpus(k):
        return (
            docs.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
            .withColumn("doc_id", F.xxhash64("doc_id", "_r")).drop("_r")
            .repartition(spark.sparkContext.defaultParallelism)
        )

    # 1) c4_rules vs doc length: k sentence-lines per doc (fixed doc count)
    sizes, times = [], []
    for k in FACTORS:
        lined = docs.select(
            "doc_id",
            F.array_join(
                F.array_repeat(F.concat(F.col("text"), F.lit(".")), k), "\n"
            ).alias("text"),
        )
        times.append(timed(f"c4_rules lines x{k}",
                           c4_rules_table(lined, "doc_id", "text")))
        sizes.append(k)
    report("c4_rules(doc length)", sizes, times)

    # 2) curate_batch vs corpus (quality -> c4 -> dedup -> lang)
    sizes, times = [], []
    for k in FACTORS:
        d = corpus(k).select(
            "doc_id",
            F.array_join(
                F.array(F.concat(F.col("text"), F.lit(".")),
                        F.concat(F.col("text"), F.lit(" again."))), "\n"
            ).alias("text"),
        )
        times.append(timed(
            f"curate_batch corpus x{k}",
            curate_batch(d, "doc_id", "text", langs=("en",),
                         min_quality=0.3, c4_clean=True, c4_min_sentences=1),
        ))
        sizes.append(k)
    report("curate_batch(corpus)", sizes, times)

    # 3) pareto_keep vs corpus (map-only pow)
    sizes, times = [], []
    for k in FACTORS:
        d = corpus(k).select(
            "doc_id", (F.pmod(F.xxhash64("doc_id"), F.lit(1000)) / 1000.0
                       ).alias("quality_prob"))
        times.append(timed(f"pareto_keep corpus x{k}",
                           pareto_keep(d, "doc_id")))
        sizes.append(k)
    report("pareto_keep(corpus)", sizes, times)

    # 4) classifier scoring vs corpus (fit ONCE on the base corpus)
    clf = QualityClassifier.fit(
        docs.where(F.col("lang") == "en"), docs, "doc_id", "text",
        n_features=1 << 14, max_iter=10,
    )
    sizes, times = [], []
    for k in FACTORS:
        times.append(timed(f"quality_clf.score corpus x{k}",
                           clf.score(corpus(k), "doc_id", "text")))
        sizes.append(k)
    report("quality_clf.score(corpus)", sizes, times)


def r10_probe():
    """r10 additions: refinedweb_lines_table vs DOCUMENT LENGTH (line
    count) and vs CORPUS SIZE; dedup_against_index vs corpus size (index
    FIXED at the base corpus — the incremental posture: the snapshot
    grows, yesterday's index is what it is)."""
    import time as _t

    spark = get_spark("r10-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
    docs.count()

    def timed(label, df):
        t0 = _t.time()
        df.write.format("noop").mode("overwrite").save()
        dt = _t.time() - t0
        print(f"  {label:34s} {dt:7.2f}s", flush=True)
        return dt

    def report(name, sizes, times, limit=1.5):
        ratios = [round(t / times[0], 2) for t in times]
        srat = [round(s / sizes[0], 1) for s in sizes]
        flag = "  <-- SUPERLINEAR" if ratios[-1] > srat[-1] * limit else ""
        print(f"{name}: sizes {srat} -> times {ratios}{flag}", flush=True)

    from entitymatchingmodel_spark.functions.text import (
        refinedweb_lines_table,
    )
    from entitymatchingmodel_spark.operators.dedup import (
        build_content_index,
        dedup_against_index,
    )

    def corpus(k):
        return (
            docs.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
            .withColumn("doc_id", F.xxhash64("doc_id", "_r"))
            .withColumn(
                "text",
                F.when(F.col("_r") == 0, F.col("text"))
                .otherwise(F.concat(F.col("text"), F.lit(" v"), F.col("_r"))),
            )
            .drop("_r")
            .repartition(spark.sparkContext.defaultParallelism)
        )

    # 1) refinedweb vs doc length: k lines per doc, alternating good/bad
    times = []
    for k in FACTORS:
        lined = docs.select(
            "doc_id",
            F.array_join(
                F.flatten(F.array_repeat(
                    F.array(F.concat(F.col("text"), F.lit(".")),
                            F.lit("SHOUTING HEADLINE LINE HERE."),
                            F.lit("42"),
                            (F.col("doc_id") % 50).cast("string")), k)),
                "\n",
            ).alias("text"),
        )
        times.append(timed(f"refinedweb lines x{k}",
                           refinedweb_lines_table(lined, "doc_id", "text")))
    report("refinedweb_lines(doc length)", FACTORS, times)

    # 2) refinedweb vs corpus size
    times = []
    for k in FACTORS:
        times.append(timed(f"refinedweb corpus x{k}",
                           refinedweb_lines_table(corpus(k), "doc_id", "text")))
    report("refinedweb_lines(corpus)", FACTORS, times)

    # 3) incremental dedup vs snapshot size, base-corpus index
    idx = build_content_index(docs, "text").persist()
    idx.count()
    times = []
    for k in FACTORS:
        times.append(timed(f"dedup_against_index x{k}",
                           dedup_against_index(corpus(k), "text", idx)))
    report("dedup_against_index(snapshot)", FACTORS, times)
    idx.unpersist()


if __name__ == "__main__":
    if "--spans" in sys.argv:
        span_heavy_probe()
    elif "--r9" in sys.argv:
        r9_probe()
    elif "--r9b" in sys.argv:
        r9b_probe()
    elif "--r9c" in sys.argv:
        r9c_probe()
    elif "--r10" in sys.argv:
        r10_probe()
    else:
        main()
