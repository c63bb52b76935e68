"""RefinedWeb line-wise corrections + incremental (snapshot) dedup."""

import re

import pytest

from tests.conftest import *  # noqa: F401,F403  (spark fixture)


# ---------------------------------------------------------------------------
# refinedweb_lines_table
# ---------------------------------------------------------------------------

def _py_rw(text, max_upper_frac=0.6, max_removed_frac=0.05):
    """Python mirror of refinedweb_lines_table (Penedo et al. 2023 §G.2
    as pinned by the RW_* constants)."""
    from entitymatchingmodel_spark.functions.text import (
        RW_COUNTER_WORDS,
        RW_NUMERIC_RE,
    )

    t = text or ""
    lines = t.split("\n")
    counter_re = r"^[0-9]+\s+(" + "|".join(RW_COUNTER_WORDS) + r")s?$"

    def removed(raw):
        s = re.sub(r"^\s+|\s+$", "", raw)
        if not s:
            return False
        alpha = "".join(ch for ch in s if ch.isalpha())
        upper = "".join(ch for ch in s if ch.isupper())
        if alpha and len(upper) * 1_000_000 > round(max_upper_frac * 1e6) * len(alpha):
            return True
        if re.match(RW_NUMERIC_RE, s):
            return True
        if re.match(counter_re, s.lower()):
            return True
        if re.match(r"^\S+$", s):
            return True
        return False

    kept = [l for l in lines if not removed(l)]
    n_chars = sum(len(l) for l in lines)
    n_removed = n_chars - sum(len(l) for l in kept)
    keep = n_removed * 1_000_000 <= round(max_removed_frac * 1e6) * n_chars
    return (len(lines), len(lines) - len(kept), n_chars, n_removed, keep,
            "\n".join(kept))


GOOD = "A perfectly reasonable sentence with many mixed case words here."


def test_refinedweb_rules_match_python_mirror(spark):
    from entitymatchingmodel_spark.functions.text import (
        refinedweb_lines_table,
    )

    long_doc = "\n".join([GOOD] * 40)
    rows = [
        (1, GOOD),                                     # kept, keep=True
        (2, GOOD + "\nTHIS LINE IS ALL CAPS SHOUTING LOUDLY."),  # upper
        (3, GOOD + "\n12 345.67"),                     # numeric-only
        (4, GOOD + "\n3 likes"),                       # counter
        (5, GOOD + "\n12 likes\n7 comments\n1 share"), # counters, plural+singular
        (6, GOOD + "\nLoading"),                       # one word
        (7, long_doc + "\n42"),                        # tiny removal -> keep
        (8, "SHOUTY.\n17\nrefresh"),                   # everything removed
        (9, ""),                                       # empty -> keep
        (10, None),                                    # NULL -> empty
        (11, GOOD + "\n   \n" + GOOD),                 # blank line kept
        (12, GOOD + "\nMcDonald THE III SHOUTS"),      # mixed: 60% rule edge
        (13, GOOD + "\n3 bananas"),                    # not a counter word
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_lines"], r["n_lines_removed"], r["n_chars"],
            r["n_chars_removed"], r["keep"], r["cleaned_text"],
        )
        for r in refinedweb_lines_table(df, "doc_id", "text").collect()
    }
    for i, t in rows:
        assert got[i] == _py_rw(t), (i, got[i], _py_rw(t))
    # semantics worth naming
    assert got[1][4] is True and got[1][5] == GOOD
    assert got[2][1] == 1 and got[2][4] is False       # caps removed, doc drops
    assert got[5][1] == 3                              # all three counters
    assert got[7][4] is True                           # 2 chars of 2600+: keep
    assert got[8][1] == 3 and got[8][5] == ""          # everything removed
    assert got[9] == (1, 0, 0, 0, True, "")            # empty doc kept
    assert got[11][0] == 3 and got[11][1] == 0         # blank line is structure
    assert got[13][1] == 0                             # bananas are not counters


def test_refinedweb_validation_and_plan_shape(spark):
    from entitymatchingmodel_spark.functions.text import (
        refinedweb_lines_table,
    )

    df = spark.createDataFrame([(1, "x y.")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_upper_frac"):
        refinedweb_lines_table(df, "doc_id", "text", max_upper_frac=0.0)
    with pytest.raises(ValueError, match="max_removed_frac"):
        refinedweb_lines_table(df, "doc_id", "text", max_removed_frac=1.5)
    with pytest.raises(ValueError, match="lowercase"):
        refinedweb_lines_table(df, "doc_id", "text", counter_words=("Like",))
    # map-only: no exchange in the plan
    plan = refinedweb_lines_table(df, "doc_id", "text")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# build_content_index + dedup_against_index
# ---------------------------------------------------------------------------

def test_incremental_dedup_keeps_only_novel_content(spark):
    from entitymatchingmodel_spark.operators.dedup import (
        build_content_index,
        dedup_against_index,
    )

    old = spark.createDataFrame(
        [(1, "alpha doc"), (2, "beta doc"), (3, "Alpha  Doc")],
        "doc_id long, text string",
    )
    idx = build_content_index(old, "text")
    # normalized: lower+trim -> "alpha doc" and "beta doc"; internal
    # whitespace is NOT collapsed, so "Alpha  Doc" is its own hash
    assert idx.count() == 3

    new = spark.createDataFrame(
        [
            (10, "ALPHA DOC  "),   # dup of old 1 after trim+lower
            (11, "gamma doc"),     # novel
            (12, "gamma doc"),     # in-batch dup of 11: BOTH survive
            (13, None),            # NULL text: kept (never matches)
        ],
        "doc_id long, text string",
    )
    got = sorted(r["doc_id"]
                 for r in dedup_against_index(new, "text", idx).collect())
    assert got == [11, 12, 13]
    # schema passes through untouched
    assert dedup_against_index(new, "text", idx).columns == new.columns


def test_incremental_dedup_validation(spark):
    from entitymatchingmodel_spark.operators.dedup import (
        dedup_against_index,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    bad = spark.createDataFrame([("h",)], "not_hash string")
    with pytest.raises(ValueError, match="content_hash"):
        dedup_against_index(df, "text", bad)
    clash = df.withColumn("_emm_ch", df["doc_id"].cast("string"))
    good_idx = spark.createDataFrame([("h",)], "content_hash string")
    with pytest.raises(ValueError, match="_emm_ch"):
        dedup_against_index(clash, "text", good_idx)


def test_incremental_dedup_snapshot_composition(spark):
    """The snapshot story: admit snapshot A, index it, dedup snapshot B
    against it, append B's novel hashes, dedup snapshot C against the
    union — C sees duplicates from BOTH earlier snapshots."""
    from entitymatchingmodel_spark.operators.dedup import (
        build_content_index,
        dedup_against_index,
    )

    snap_a = spark.createDataFrame([(1, "one"), (2, "two")], "id long, text string")
    idx = build_content_index(snap_a, "text")
    snap_b = spark.createDataFrame([(3, "two"), (4, "three")], "id long, text string")
    b_novel = dedup_against_index(snap_b, "text", idx)
    assert [r["id"] for r in b_novel.collect()] == [4]
    idx2 = idx.unionByName(build_content_index(b_novel, "text")).distinct()
    snap_c = spark.createDataFrame(
        [(5, "one"), (6, "three"), (7, "four")], "id long, text string"
    )
    c_novel = dedup_against_index(snap_c, "text", idx2)
    assert [r["id"] for r in c_novel.collect()] == [7]


def test_refinedweb_rules_match_mirror_on_random_docs(spark):
    """One batched Spark job over 150 adversarial random multi-line docs
    must agree exactly with the Python mirror — same posture as the
    lang-id scorer's randomized parity test (seeded, not a flake)."""
    import random

    from entitymatchingmodel_spark.functions.text import (
        refinedweb_lines_table,
    )

    rng = random.Random(4242)
    alphabet = "abcDEFgHIJkl MNOpqr 0123456789 .,:%/-\t"
    planted = ["3 likes", "42 comments", "SHOUTY CAPS LINE", "loading",
               "17", "12 345.67", "ok fine", "  ", ""]
    cases = []
    for i in range(150):
        n_lines = rng.randint(0, 8)
        lines = []
        for _ in range(n_lines):
            if rng.random() < 0.4:
                lines.append(rng.choice(planted))
            else:
                ln = rng.randint(0, 30)
                lines.append("".join(rng.choice(alphabet) for _ in range(ln)))
        cases.append((i, "\n".join(lines) if lines else rng.choice(["", None])))

    df = spark.createDataFrame(cases, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_lines"], r["n_lines_removed"], r["n_chars"],
            r["n_chars_removed"], r["keep"], r["cleaned_text"],
        )
        for r in refinedweb_lines_table(df, "doc_id", "text").collect()
    }
    for i, t in cases:
        assert got[i] == _py_rw(t), (i, t, got[i], _py_rw(t))


# ---------------------------------------------------------------------------
# build_bloom_index + dedup_against_bloom
# ---------------------------------------------------------------------------

def _bloom_fixture(spark):
    old = spark.createDataFrame(
        [(i, f"admitted doc {i}") for i in range(40)] + [(99, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100 + i, f"admitted doc {i}") for i in range(0, 40, 2)]   # dups
        + [(200 + i, f"novel doc {i}") for i in range(30)]          # novel
        + [(300, None)],                                            # null text
        "doc_id long, text string",
    )
    return old, new


def test_bloom_dedup_matches_exact_anti_join(spark):
    from entitymatchingmodel_spark.operators.dedup import (
        build_bloom_index,
        build_content_index,
        dedup_against_bloom,
        dedup_against_index,
    )

    old, new = _bloom_fixture(spark)
    idx = build_content_index(old, "text")
    want = sorted(r["doc_id"]
                  for r in dedup_against_index(new, "text", idx).collect())
    out = dedup_against_bloom(new, "text", idx)
    assert out.columns == new.columns
    assert sorted(r["doc_id"] for r in out.collect()) == want


def test_bloom_dedup_exact_under_forced_false_positives(spark):
    """A 64-bit bloom with 7 hashes saturates — nearly every probe is a
    'probable duplicate' — yet the confirm anti-join keeps the output
    identical to the exact operator (false positives cost work, never
    correctness)."""
    from entitymatchingmodel_spark.operators.dedup import (
        build_bloom_index,
        build_content_index,
        dedup_against_bloom,
        dedup_against_index,
    )

    old, new = _bloom_fixture(spark)
    idx = build_content_index(old, "text")
    want = sorted(r["doc_id"]
                  for r in dedup_against_index(new, "text", idx).collect())
    bloom = build_bloom_index(idx, num_bits=64, num_hashes=7)
    got = sorted(
        r["doc_id"]
        for r in dedup_against_bloom(new, "text", idx, bloom=bloom).collect()
    )
    assert got == want


def test_bloom_geometry_comes_from_the_bloom_frame(spark):
    """Probe geometry is read from the bloom frame's embedded parameter
    columns — mismatched caller arguments cannot create false negatives."""
    from entitymatchingmodel_spark.operators.dedup import (
        build_bloom_index,
        build_content_index,
        dedup_against_bloom,
        dedup_against_index,
    )

    old, new = _bloom_fixture(spark)
    idx = build_content_index(old, "text")
    want = sorted(r["doc_id"]
                  for r in dedup_against_index(new, "text", idx).collect())
    bloom = build_bloom_index(idx, num_bits=128, num_hashes=3)
    got = sorted(
        r["doc_id"]
        for r in dedup_against_bloom(
            new, "text", idx, bloom=bloom, num_bits=1 << 20, num_hashes=5
        ).collect()
    )
    assert got == want


def test_bloom_empty_index_keeps_everything(spark):
    from pyspark.sql import functions as F

    from entitymatchingmodel_spark.operators.dedup import (
        build_content_index,
        dedup_against_bloom,
    )

    _, new = _bloom_fixture(spark)
    empty = build_content_index(new.where(F.lit(False)), "text")
    assert dedup_against_bloom(new, "text", empty).count() == new.count()


def test_bloom_validation(spark):
    import pytest

    from entitymatchingmodel_spark.operators.dedup import (
        _BLOOM_MAX_BITS,
        build_bloom_index,
        build_content_index,
        dedup_against_bloom,
    )

    old, new = _bloom_fixture(spark)
    idx = build_content_index(old, "text")
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom_index(idx, num_bits=100)
    with pytest.raises(ValueError, match="ceiling"):
        build_bloom_index(idx, num_bits=_BLOOM_MAX_BITS * 2)
    with pytest.raises(ValueError, match="num_hashes"):
        build_bloom_index(idx, num_hashes=0)
    with pytest.raises(ValueError, match="content_hash"):
        build_bloom_index(idx.withColumnRenamed("content_hash", "h"))
    with pytest.raises(ValueError, match="_emm_ch"):
        dedup_against_bloom(
            new.withColumn("_emm_ch", new["doc_id"].cast("string")),
            "text", idx,
        )
    with pytest.raises(ValueError, match="build_bloom_index"):
        dedup_against_bloom(new, "text", idx, bloom=idx)


def test_bloom_miss_branch_is_map_only(spark):
    """The definitely-new branch of the union must be a pure map stage:
    the only Exchange(s) in the whole plan belong to the probable-sliver
    anti-join, and the bloom prefilter itself adds none."""
    from entitymatchingmodel_spark.operators.dedup import (
        build_content_index,
        dedup_against_bloom,
        dedup_against_index,
    )

    from entitymatchingmodel_spark.plans import explain_str

    old, new = _bloom_fixture(spark)
    idx = build_content_index(old, "text")
    bloom_plan = explain_str(dedup_against_bloom(new, "text", idx))
    exact_plan = explain_str(dedup_against_index(new, "text", idx))
    assert bloom_plan.count("Exchange") <= exact_plan.count("Exchange"), bloom_plan
    # the bitmap probe itself must plan as a literal projection: no join or
    # exchange may mention the bloom's word table
    assert "word_idx" not in bloom_plan, bloom_plan


def test_bloom_dedup_on_a_stream(spark, tmp_path):
    """Incremental dedup IS a streaming concern (new snapshots arrive as
    micro-batches): the bloom probe is a stateless map and the confirm
    join is a stream-static LEFT ANTI, both legal in append mode — the
    streamed output must equal the batch operator on the same data."""
    import os

    from pyspark.sql import functions as F

    from entitymatchingmodel_spark.operators.dedup import (
        build_bloom_index,
        build_content_index,
        dedup_against_bloom,
    )

    old, new = _bloom_fixture(spark)
    idx = build_content_index(old, "text")
    bloom = build_bloom_index(idx, num_bits=1 << 10, num_hashes=5)
    want = sorted(
        r["doc_id"]
        for r in dedup_against_bloom(new, "text", idx, bloom=bloom).collect()
    )

    src = str(tmp_path / "bloom_src")
    os.makedirs(src)
    new.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = dedup_against_bloom(stream, "text", idx, bloom=bloom)
    assert out.isStreaming
    got = []
    q = (
        out.writeStream.foreachBatch(lambda b, i: got.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "bloom_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    assert sorted(r["doc_id"] for r in got) == want


# ---------------------------------------------------------------------------
# build_band_index + dedup_against_band_index (incremental NEAR-dedup)
# ---------------------------------------------------------------------------

def _band_fixture(spark):
    base = ("the quick brown fox jumps over the lazy dog while the rain "
            "falls softly on the quiet village roofs tonight")
    old = spark.createDataFrame(
        [(i, f"{base} chapter {i} begins here") for i in range(10)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, f"{base} chapter 3 begins here")]      # exact re-serve
        + [(101, f"{base} chapter 3 begins now")]     # near-dup (1 word off)
        + [(102 + i,
            f"completely different {i} text about spaceships and gardens "
            f"growing wild under two moons with settlers {i} debating")
           for i in range(5)]                          # novel
        + [(200, ""), (201, None)],                    # no shingles
        "doc_id long, text string",
    )
    return old, new


def test_band_index_drops_exact_and_near_reserves(spark):
    from entitymatchingmodel_spark.operators.dedup import (
        build_band_index,
        dedup_against_band_index,
    )

    old, new = _band_fixture(spark)
    idx = build_band_index(old, "doc_id", "text")
    assert set(idx.columns) == {"band", "bkey", "mh_num_hashes",
                                "mh_shingle_n", "mh_bands", "mh_rows_per_band"}
    out = dedup_against_band_index(new, "doc_id", "text", idx)
    kept = sorted(r["doc_id"] for r in out.collect())
    # the exact re-serve AND the near-dup collide; novel + shingle-less kept
    assert 100 not in kept and 101 not in kept
    assert set(range(102, 107)) <= set(kept)
    assert 200 in kept and 201 in kept
    assert out.columns == new.columns


def test_band_index_geometry_is_self_described(spark):
    """A probe against an index built with a non-default geometry must
    use the INDEX's geometry (caller passes nothing) — collisions keep
    firing."""
    from entitymatchingmodel_spark.operators.dedup import (
        build_band_index,
        dedup_against_band_index,
    )

    old, new = _band_fixture(spark)
    idx = build_band_index(old, "doc_id", "text",
                           num_hashes=24, shingle_n=2, bands=6, rows_per_band=4)
    kept = sorted(r["doc_id"] for r in
                  dedup_against_band_index(new, "doc_id", "text", idx).collect())
    assert 100 not in kept and 101 not in kept


def test_band_index_validation_and_empty_index(spark):
    from entitymatchingmodel_spark.operators.dedup import (
        build_band_index,
        dedup_against_band_index,
    )
    from pyspark.sql import functions as F

    old, new = _band_fixture(spark)
    with pytest.raises(ValueError, match="bands[*]rows_per_band"):
        build_band_index(old, "doc_id", "text", num_hashes=32, bands=5)
    with pytest.raises(ValueError, match="build_band_index"):
        dedup_against_band_index(new, "doc_id", "text", old)
    idx = build_band_index(old, "doc_id", "text")
    assert dedup_against_band_index(
        new, "doc_id", "text", idx.where(F.lit(False))
    ).count() == new.count()


def test_band_index_shared_sigs_matches_recompute(spark):
    """The r11 shared-signature-scan shape (one minhash pass, sliced for
    the index side, reused on the probe side) must be ROW-IDENTICAL to
    the default recompute-per-call-site shape."""
    from pyspark.sql import functions as F

    from entitymatchingmodel_spark.operators.dedup import (
        build_band_index,
        dedup_against_band_index,
        minhash_signatures,
    )

    old, new = _band_fixture(spark)
    both = old.unionByName(new)
    sigs = minhash_signatures(both, "doc_id", "text", 32, 3)
    old_ids = {r["doc_id"] for r in old.collect()}
    idx_shared = build_band_index(
        old, "doc_id", "text",
        sigs=sigs.where(F.col("id").isin(*old_ids)),
    )
    out_shared = dedup_against_band_index(
        new, "doc_id", "text", idx_shared,
        sigs=sigs.where(~F.col("id").isin(*old_ids)),
    )
    idx_plain = build_band_index(old, "doc_id", "text")
    out_plain = dedup_against_band_index(new, "doc_id", "text", idx_plain)
    assert sorted(map(tuple, out_shared.collect())) == sorted(
        map(tuple, out_plain.collect())
    )
