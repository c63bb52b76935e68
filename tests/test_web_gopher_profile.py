"""Unit tests for URL normalization (functions/web.py), Gopher-style
quality rules and the corpus-profile rollup (functions/text.py r8)."""

import pytest
from pyspark.sql import functions as F

from entitymatchingmodel_spark.functions.web import (
    url_domain,
    url_host,
    url_normalize,
    url_registered_domain,
)


@pytest.mark.parametrize("url,host,domain,reg,norm", [
    ("https://www.Example.COM/Path/A?q=1#frag",
     "www.example.com", "example.com", "example.com", "example.com/Path/A"),
    ("http://sub.a.Example.org:8080/x/",
     "sub.a.example.org", "sub.a.example.org", "example.org",
     "sub.a.example.org/x"),
    ("ftp://user:pw@Files.example.net/d",
     "files.example.net", "files.example.net", "example.net",
     "files.example.net/d"),
    # scheme-less input, bare domain, fragment containing a '?'
    ("www.test.de", "www.test.de", "test.de", "test.de", "test.de"),
    ("example.io/a/b#sec?not-query",
     "example.io", "example.io", "example.io", "example.io/a/b"),
    # path case preserved; query dropped before the trailing-slash trim
    ("HTTPS://EXAMPLE.com/KeepCase/?utm=x",
     "example.com", "example.com", "example.com", "example.com/KeepCase"),
])
def test_url_functions(spark, url, host, domain, reg, norm):
    df = spark.createDataFrame([(url,)], "u string")
    row = df.select(
        url_host(F.col("u")).alias("h"),
        url_domain(F.col("u")).alias("d"),
        url_registered_domain(F.col("u")).alias("r"),
        url_normalize(F.col("u")).alias("n"),
    ).collect()[0]
    assert (row["h"], row["d"], row["r"], row["n"]) == (host, domain, reg, norm)


def test_url_null_and_empty(spark):
    df = spark.createDataFrame([(None,), ("",)], "u string")
    rows = df.select(
        url_host(F.col("u")).alias("h"),
        url_normalize(F.col("u")).alias("n"),
    ).collect()
    assert all(r["h"] is None and r["n"] is None for r in rows)


def test_url_dedup_collapses_variants(spark):
    """The C4 posture: scheme/www/query/fragment/trailing-slash variants
    of one page collapse to a single normalized key."""
    variants = [
        "https://www.example.com/a",
        "http://example.com/a/",
        "example.com/a?utm_source=x",
        "HTTPS://EXAMPLE.COM/a#top",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "u string")
    assert (
        df.select(url_normalize(F.col("u")).alias("k")).distinct().count() == 1
    )


def _py_gopher(text):
    import re

    if text is None:
        return (0, None, None, None, None, None, False)
    words = [w for w in re.split(r"\s+", text) if w]
    n = len(words)
    lines = [l for l in text.split("\n") if l.strip()]
    nl = len(lines)
    r6 = lambda x: round(x, 6)
    mwl = r6(sum(map(len, words)) / n) if n else None
    sym = r6((text.count("#") + text.count("...")) / n) if n else None
    bul = r6(sum(1 for l in lines if re.match(r"^[-*•]", l.lstrip())) / nl) if nl else None
    ell = r6(sum(1 for l in lines if l.rstrip().endswith("...")) / nl) if nl else None
    alp = r6(sum(1 for w in words if re.search("[a-zA-Z]", w)) / n) if n else None
    keep = bool(
        n >= 5 and n <= 100000 and mwl is not None and 3 <= mwl <= 10
        and sym <= 0.1 and bul <= 0.9 and ell <= 0.3 and alp >= 0.8
    )
    return (n, mwl, sym, bul, ell, alp, keep)


def test_gopher_rules_match_python_mirror(spark):
    from entitymatchingmodel_spark.functions.text import gopher_rules_table

    rows = [
        (1, "A perfectly normal document with enough clean words to pass the gate today."),
        (2, "short one"),                                   # too few words
        (3, "# # # # # hash heavy line with many symbols"),  # symbol ratio
        (4, "- bullet one\n- bullet two\n- bullet three"),   # all bullets
        (5, "trailing dots...\nmore dots...\nplain line here we go along"),
        (6, "12 34 56 78 90 11 22"),                        # no alpha words
        (7, None),                                          # NULL text
        (8, ""),                                            # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_words"], r["mean_word_len"], r["symbol_ratio"],
            r["bullet_ratio"], r["ellipsis_ratio"], r["alpha_word_ratio"],
            r["keep"],
        )
        for r in gopher_rules_table(df, "doc_id", "text", min_words=5).collect()
    }
    for i, t in rows:
        assert got[i] == _py_gopher(t), (i, got[i], _py_gopher(t))
    # default thresholds from the paper reject the short doc too
    strict = {r["doc_id"]: r["keep"] for r in
              gopher_rules_table(df, "doc_id", "text").collect()}
    assert strict[1] is False  # 13 words < default min 50


def test_corpus_profile_rollup(spark):
    from entitymatchingmodel_spark.functions.text import (
        corpus_profile,
        quality_score,
        token_count,
    )

    rows = [
        (1, "s1", "alpha beta gamma delta epsilon"),
        (2, "s1", "one two three"),
        (3, "s1", None),
        (4, "s2", "hello world again and again today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in
           corpus_profile(df, "source", "text").collect()}
    assert got["s1"]["n_docs"] == 3 and got["s1"]["n_empty"] == 1
    assert got["s1"]["total_tokens"] == 8
    assert got["s2"]["n_docs"] == 1 and got["s2"]["total_tokens"] == 6
    # avg_quality matches the per-row quality_score mean (round 6)
    qs = [r["q"] for r in df.filter("source = 's1'")
          .select(quality_score(F.col("text")).alias("q")).collect()]
    qs = [q for q in qs if q is not None]
    assert abs(got["s1"]["avg_quality"] - round(sum(qs) / len(qs), 6)) < 1e-6
    # partition invariance
    spread = {tuple(r) for r in
              corpus_profile(df.repartition(7), "source", "text").collect()}
    assert spread == {tuple(r) for r in corpus_profile(df, "source", "text").collect()}


def test_chunk_documents_windows(spark):
    from entitymatchingmodel_spark.functions.text import chunk_documents

    text10 = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    rows = [(1, text10), (2, "a b"), (3, None), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # no overlap: 10 tokens / 4 -> [4, 4, 2]
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk"])
        for r in chunk_documents(df, "doc_id", "text", chunk_tokens=4).collect()
    )
    assert got == [
        (1, 0, 4, "t1 t2 t3 t4"),
        (1, 1, 4, "t5 t6 t7 t8"),
        (1, 2, 2, "t9 t10"),
        (2, 0, 2, "a b"),
    ]

    # overlap 1 (stride 3): starts 1,4,7 — NO redundant tail chunk at 10
    got = sorted(
        (r["chunk_id"], r["chunk"])
        for r in chunk_documents(df.filter("doc_id = 1"), "doc_id", "text",
                                 chunk_tokens=4, overlap=1).collect()
    )
    assert got == [
        (0, "t1 t2 t3 t4"), (1, "t4 t5 t6 t7"), (2, "t7 t8 t9 t10"),
    ]

    # every token of every doc appears in at least one chunk; short doc ->
    # exactly one chunk; NULL/empty -> no rows
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=64).collect()
    assert {(r["doc_id"], r["chunk_id"]) for r in out} == {(1, 0), (2, 0)}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=0)
    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_chunk_documents_partition_invariance(spark):
    from entitymatchingmodel_spark.functions.text import chunk_documents

    rows = [(i, " ".join(f"w{i}x{j}" for j in range(i % 17 + 1)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, chunk_documents(df, "doc_id", "text", 5, 2).collect()))
    b = sorted(map(tuple, chunk_documents(df.repartition(7), "doc_id", "text",
                                          5, 2).collect()))
    assert a == b and a


def test_top_terms(spark):
    from entitymatchingmodel_spark.functions.text import top_terms

    rows = [
        (1, "s1", "apple apple banana cherry"),
        (2, "s1", "apple banana banana"),
        (3, "s2", "zebra zebra yak"),
        (4, "s2", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = [(r["source"], r["token"], r["n"], r["rank"]) for r in
           top_terms(df, "source", "text", k=2)
           .orderBy("source", "rank").collect()]
    # s1: apple and banana tie at 3 -> token-ascending tie-break
    assert got == [
        ("s1", "apple", 3, 1), ("s1", "banana", 3, 2),
        ("s2", "zebra", 2, 1), ("s2", "yak", 1, 2),
    ]


def test_drop_url_duplicates_keeps_min_id_per_normalized_url(spark):
    """C4 URL dedup: scheme/www/query/fragment/trailing-slash variants of
    one page collapse to the min-id row; NULL/empty URLs are never deduped
    against each other; plan = ONE exchange (the min-struct aggregate)."""
    from entitymatchingmodel_spark.operators.dedup import drop_url_duplicates
    from entitymatchingmodel_spark.plans import exchange_count

    rows = [
        (1, "https://www.example.com/a?utm=x"),
        (2, "HTTP://EXAMPLE.COM/a#frag"),        # same page as 1
        (3, "example.com/a/"),                   # same page as 1
        (4, "example.com/A"),                    # path case differs: distinct
        (5, "https://other.org/a"),
        (6, None),                               # missing URLs: all kept
        (7, ""),
        (8, None),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = drop_url_duplicates(df, "id", "url")
    # plan shape checked BEFORE the action (post-execution explain shows
    # the AQE final plan, which double-prints the exchange)
    assert exchange_count(out) == 1
    kept = sorted(r["id"] for r in out.collect())
    assert kept == [1, 4, 5, 6, 7, 8]
    # original columns survive untouched
    assert out.columns == ["id", "url"]


def test_url_dedup_stream_matches_batch(spark, tmp_path):
    """drop_url_duplicates_stream keeps exactly one row per normalized URL
    within the watermark horizon and passes NULL-URL rows through
    undeduped — same normalized-key set as the batch operator."""
    import datetime
    import os

    from entitymatchingmodel_spark.functions.web import url_normalize
    from entitymatchingmodel_spark.operators.dedup import drop_url_duplicates
    from entitymatchingmodel_spark.streaming.dedup import (
        drop_url_duplicates_stream,
    )

    T = datetime.datetime
    rows = [
        (1, "https://www.site.com/x?q=1", T(2024, 1, 1, 0, 0)),
        (2, "site.com/x", T(2024, 1, 1, 0, 1)),       # dup of 1
        (3, "site.com/y", T(2024, 1, 1, 0, 2)),
        (4, None, T(2024, 1, 1, 0, 3)),
        (5, None, T(2024, 1, 1, 0, 4)),               # NOT a dup of 4
    ]
    src = str(tmp_path / "url_src")
    os.makedirs(src)
    df = spark.createDataFrame(rows, "id long, url string, ts timestamp")
    df.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("id long, url string, ts timestamp").parquet(src)
    out = drop_url_duplicates_stream(stream, "url", "ts")
    got = []
    q = (out.writeStream.foreachBatch(lambda b, i: got.extend(b.collect()))
         .option("checkpointLocation", str(tmp_path / "ckpt_url")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch_keys = sorted(
        str(r["k"])
        for r in drop_url_duplicates(df, "id", "url")
        .select(url_normalize(F.col("url")).alias("k")).collect()
    )
    got_keys = sorted(str(r["url_norm"]) for r in got)
    assert got_keys == batch_keys
    assert len(got) == 4  # 1-or-2, 3, 4, 5
    assert {r["id"] for r in got if r["url_norm"] is None} == {4, 5}



def test_registered_domain_table_psl_semantics(spark):
    """Longest-suffix resolution with a user-supplied suffix table:
    multi-label ccTLD suffixes resolve correctly, a bare public suffix
    has no registrable part (NULL), unmatched TLDs fall back to the
    naive two-label heuristic, and the longest listed match wins."""
    from entitymatchingmodel_spark.functions.web import registered_domain_table

    sfx = spark.createDataFrame(
        [("uk",), ("co.uk",), ("com.au",), ("com",), ("org",), ("CO.UK",)],
        "suffix string",
    )
    rows = [
        (1, "https://www.example.co.uk/page"),      # multi-label suffix
        (2, "a.b.example.co.uk"),                   # deep subdomain
        (3, "shop.com.au/x?q=1"),                   # com.au
        (4, "https://sub.example.com"),             # single-label suffix
        (5, "co.uk"),                               # IS a suffix -> NULL
        (6, "example.zz"),                          # unmatched -> naive
        (7, "deep.sub.example.zz"),                 # unmatched -> naive 2-label
        (8, None),                                  # NULL -> NULL
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = registered_domain_table(df, "url", sfx)
    # every suffix join is a BROADCAST hash join (the fact side is never
    # shuffled; the only exchanges in the plan are the tiny per-candidate
    # suffix-dedup shuffles inside the broadcast builds)
    from entitymatchingmodel_spark.plans import broadcast_join_count, explain_str

    plan = explain_str(out)
    assert broadcast_join_count(out) == 4, plan
    assert "SortMergeJoin" not in plan, plan
    got = {r["id"]: r["reg_domain"] for r in out.collect()}
    assert got[1] == "example.co.uk"
    assert got[2] == "example.co.uk"
    assert got[3] == "shop.com.au"
    assert got[4] == "example.com"
    assert got[5] is None
    assert got[6] == "example.zz"
    assert got[7] == "example.zz"
    assert got[8] is None
    # row count preserved (no explode), input columns intact
    assert out.count() == len(rows) and set(df.columns) <= set(out.columns)


def test_gopher_repetition_table_hand_expectations(spark):
    """Hand-computed repetition fractions: dup lines/paragraphs, top-ngram
    coverage (repeats only, deterministic tie-break), dup-ngram char
    fraction with the documented overlap-counting + 1.0 clamp, NULL/empty
    text -> all-NULL + keep false."""
    from entitymatchingmodel_spark.functions.text import (
        gopher_keep_table,
        gopher_repetition_table,
    )

    rows = [
        (1, "x y x y x y"),
        (2, "aa\nbb\naa\n\ncc"),
        (3, "one two three four five six"),
        (4, None),
        (5, "   "),
        # repeated bigram but NO repeated trigram: the doc HAS a stats row,
        # so a missing per-n winner must yield 0.0, not a null-skipping
        # least() artifact (regression case for the r9 hashed rewrite)
        (6, "a b c a b d a b e"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r.asDict() for r in gopher_repetition_table(df, "id", "text").collect()}

    # doc 1: 6 words, char_count 6; bigrams x y:3, y x:2 -> top2 =
    # least(1, 3*2/6) = 1.0; trigrams "x y x":2,"y x y":2 -> tie ->
    # longer? equal len -> lexicographic: "x y x" -> least(1, 2*3/6)=1.0;
    # 5-grams both unique -> 0.0
    assert got[1]["top_2gram_char_frac"] == 1.0
    assert got[1]["top_3gram_char_frac"] == 1.0
    assert got[1]["dup_5gram_char_frac"] == 0.0
    assert got[1]["dup_line_frac"] == 0.0
    assert got[1]["keep_repetition"] is False

    # doc 2: lines [aa,bb,aa,cc] -> dup_line 1/4, chars (8-6)/8 = 0.25;
    # paragraphs ["aa\nbb\naa","cc"] distinct -> 0.0
    assert got[2]["dup_line_frac"] == 0.25
    assert got[2]["dup_line_char_frac"] == 0.25
    assert got[2]["dup_para_frac"] == 0.0
    assert got[2]["dup_para_char_frac"] == 0.0

    # doc 3: no repeated anything -> all zeros, keep true
    assert got[3]["keep_repetition"] is True
    assert all(
        got[3][k] == 0.0
        for k in got[3]
        if k.endswith("_frac")
    )

    # NULL / whitespace-only text: all-NULL fractions, keep false
    for i in (4, 5):
        assert got[i]["keep_repetition"] is False
        assert all(got[i][k] is None for k in got[i] if k.endswith("_frac"))

    # doc 6: "a b" repeats 3x (top2 = least(1, 3*2/9) = 0.666667) but no
    # trigram/4-gram repeats -> those must be EXACTLY 0.0
    assert got[6]["top_2gram_char_frac"] == 0.666667
    assert got[6]["top_3gram_char_frac"] == 0.0
    assert got[6]["top_4gram_char_frac"] == 0.0
    assert got[6]["dup_5gram_char_frac"] == 0.0

    # fused table: keep = rules AND repetition
    fused = {r["id"]: r.asDict() for r in gopher_keep_table(df, "id", "text").collect()}
    assert set(fused) == {1, 2, 3, 4, 5, 6}
    for i in fused:
        assert fused[i]["keep"] == (fused[i]["keep_rules"] and fused[i]["keep_repetition"])


def _py_c4(text, min_words_per_line=5, min_sentences=5):
    """Python mirror of c4_rules_table (the c4_utils.py line/page rules)."""
    import re

    from entitymatchingmodel_spark.functions.text import C4_POLICY_PHRASES

    t = text or ""
    lines = [re.sub(r"^\s+|\s+$", "", l) for l in t.split("\n")]
    kept = []
    for l in lines:
        ll = l.lower()
        if not re.search(r'[.!?"]$', l):
            continue
        if l.endswith("..."):  # official c4_utils drops ellipsis endings
            continue
        if len([w for w in re.split(r"\s+", l) if w]) < min_words_per_line:
            continue
        if "javascript" in ll or any(p in ll for p in C4_POLICY_PHRASES):
            continue
        kept.append(l)
    kept_text = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", kept_text))
    has_lorem = "lorem ipsum" in t.lower()
    has_curly = "{" in t
    keep = (not has_lorem) and (not has_curly) and n_sent >= min_sentences
    return (len(lines), len(kept), n_sent, has_lorem, has_curly, keep,
            kept_text)


def test_c4_rules_match_python_mirror(spark):
    from entitymatchingmodel_spark.functions.text import c4_rules_table

    good = "This is a perfectly valid long sentence number %d."
    rows = [
        (1, "\n".join(good % i for i in range(6))),          # kept
        (2, "\n".join(good % i for i in range(3))),          # < 5 sentences
        (3, "\n".join([good % 0] * 5 + ["short line."])),    # short line drops
        (4, "\n".join([good % 0] * 5
                      + ["Please enable JavaScript to continue browsing."])),
        (5, "\n".join([good % 0] * 5
                      + ["We updated our privacy policy terms for users."])),
        (6, "\n".join([good % 0] * 5) + "\nlorem ipsum dolor sit."),  # page drop
        (7, "\n".join([good % 0] * 5) + "\nvar f = function() { };"),  # curly
        (8, "No terminal punctuation on this line at all"),
        (9, "  \tWhitespace padded valid sentence with words here.  " + "\n"
            + "\n".join([good % 0] * 4)),
        (10, None),
        (11, ""),
        (12, 'Quoted line ending with several words present here."'
             + "\n" + "\n".join([good % 0] * 4)),            # quote mark ends
        (13, "Multiple. Sentences! In? One line with words."),  # 4 marks, 1 line
        (14, "This long thought simply trails off into the distance..."
             + "\n" + "\n".join([good % 0] * 5)),            # ellipsis line drops
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_lines"], r["n_lines_kept"], r["n_sentences"],
            r["has_lorem"], r["has_curly"], r["keep"], r["kept_text"],
        )
        for r in c4_rules_table(df, "doc_id", "text").collect()
    }
    for i, t in rows:
        assert got[i] == _py_c4(t), (i, got[i], _py_c4(t))
    # keep verdicts worth asserting by name
    keeps = {i: got[i][5] for i, _ in rows}
    assert keeps[1] and keeps[3] and keeps[9] and keeps[12]
    assert not any(keeps[i] for i in (2, 6, 7, 8, 10, 11))
    # doc 13: one line, 4 terminal marks -> 4 sentences < 5
    assert got[13][2] == 4 and not keeps[13]
    # doc 14: the ellipsis line drops (n_lines_kept == 5, not 6) but the
    # page keeps — the 5 good lines clear min_sentences
    assert got[14][1] == 5 and keeps[14]


def test_c4_rules_validation(spark):
    import pytest

    from entitymatchingmodel_spark.functions.text import c4_rules_table

    df = spark.createDataFrame([(1, "x.")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_words_per_line"):
        c4_rules_table(df, "doc_id", "text", min_words_per_line=0)
    with pytest.raises(ValueError, match="min_sentences"):
        c4_rules_table(df, "doc_id", "text", min_sentences=-1)
    with pytest.raises(ValueError, match="lowercase"):
        c4_rules_table(df, "doc_id", "text", policy_phrases=("Privacy",))


def test_c4_rules_exchange_free(spark):
    from entitymatchingmodel_spark.functions.text import c4_rules_table
    from entitymatchingmodel_spark.plans import exchange_count

    df = spark.createDataFrame(
        [(1, "Valid sentence with five words here.")], "doc_id long, text string"
    )
    assert exchange_count(c4_rules_table(df, "doc_id", "text")) == 0


def test_gopher_keep_fused_matches_two_table_join(spark):
    """The r11 fused gopher_keep_table (keep_rules computed inside the
    repetition base projection) must equal the explicit
    gopher_rules_table ⋈ gopher_repetition_table formulation row for row,
    including NULL/empty text and non-default thresholds."""
    from entitymatchingmodel_spark.functions.text import (
        gopher_keep_table,
        gopher_repetition_table,
        gopher_rules_table,
    )

    rows = [
        (1, "x y x y x y"),
        (2, "aa\nbb\naa\n\ncc"),
        (3, " ".join(f"w{i % 7}" for i in range(120))),
        (4, None),
        (5, "   "),
        (6, "a b c a b d a b e"),
        (7, "- bullet one\n- bullet two\nplain line ends here..."),
        (8, "### symbols # galore ... and more ... " * 5),
        (9, "one two three four five six seven eight nine ten " * 12),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    for rules_kwargs, rep_th in [
        (None, None),
        ({"min_words": 5, "max_symbol_ratio": 0.5}, {"top_2gram_char_frac": 0.9}),
    ]:
        fused = gopher_keep_table(
            df, "id", "text",
            rules_kwargs=rules_kwargs, repetition_thresholds=rep_th,
        )
        rules = gopher_rules_table(
            df, "id", "text", **(rules_kwargs or {})
        ).select("id", F.col("keep").alias("keep_rules"))
        rep = gopher_repetition_table(
            df, "id", "text", thresholds=rep_th
        ).select("id", "keep_repetition")
        explicit = rules.join(rep, "id").select(
            "id", "keep_rules", "keep_repetition",
            (F.col("keep_rules") & F.col("keep_repetition")).alias("keep"),
        )
        got = {r["id"]: (r["keep_rules"], r["keep_repetition"], r["keep"])
               for r in fused.collect()}
        want = {r["id"]: (r["keep_rules"], r["keep_repetition"], r["keep"])
                for r in explicit.collect()}
        assert got == want and set(got) == {1, 2, 3, 4, 5, 6, 7, 8, 9}
