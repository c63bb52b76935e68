"""Property-based tests (hypothesis) for pure-Python kernels — no Spark."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from entitymatchingmodel_spark.operators.features import _jaro_winkler_py
from entitymatchingmodel_spark.functions.preprocessing import (
    _merge_abbr_str,
    _merge_legal_abbr_str,
)
from entitymatchingmodel_spark.sources.noiser import _rng_for

text = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60)


@given(text, text)
@settings(max_examples=300, deadline=None)
def test_jaro_winkler_bounds_and_symmetry(a, b):
    s = _jaro_winkler_py(a, b)
    assert 0.0 <= s <= 1.0
    assert _jaro_winkler_py(b, a) == s


@given(text)
@settings(max_examples=300, deadline=None)
def test_jaro_winkler_identity(a):
    assert _jaro_winkler_py(a, a) == 1.0


@given(text)
@settings(max_examples=300, deadline=None)
def test_merge_abbr_idempotent(s):
    once = _merge_abbr_str(s)
    assert _merge_abbr_str(once) == once


@given(text)
@settings(max_examples=300, deadline=None)
def test_merge_abbr_never_adds_length(s):
    assert len(_merge_abbr_str(s)) <= len(s)


@given(text)
@settings(max_examples=300, deadline=None)
def test_merge_legal_abbr_subset_of_general(s):
    """Legal-only merging must change at most what general merging changes."""
    general = _merge_abbr_str(s)
    legal = _merge_legal_abbr_str(s)
    if legal != s:
        # every collapse the legal variant makes, the general one makes too
        assert len(legal) <= len(s)
        assert len(general) <= len(legal)


@given(st.text(max_size=40), st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=200, deadline=None)
def test_noiser_rng_deterministic(name, seed):
    a = _rng_for(name, seed).integers(0, 1 << 30)
    b = _rng_for(name, seed).integers(0, 1 << 30)
    assert a == b


def test_merge_abbr_known_cases():
    assert _merge_abbr_str("Tzu Sun B.V.") == "Tzu Sun BV"
    assert _merge_abbr_str("B. V.") == "BV"
    assert _merge_abbr_str("plain words here") == "plain words here"
    assert re.sub(r"\s+", " ", _merge_abbr_str("A B C Consulting")).strip() == "ABC Consulting"


def test_token_budget_sample_matches_global_window(spark):
    """The bucketed distributed prefix-sum must equal the naive global
    window cumsum for any budget; boundary doc (the one crossing the
    budget) excluded."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from entitymatchingmodel_spark.functions.sampling import (
        _unit_hash,
        token_budget_sample,
    )

    rng = random.Random(5)
    rows = [(i, rng.randint(1, 50)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w long")

    naive_w = Window.orderBy(
        _unit_hash(F.col("doc_id"), "budget").asc(), F.col("doc_id").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    for budget in (0, 137, 2500, 10**9):
        naive = {
            r["doc_id"]
            for r in df.withColumn("c", F.sum("w").over(naive_w))
            .filter(F.col("c") <= budget).collect()
        }
        got = {
            r["doc_id"]
            for r in token_budget_sample(df, "doc_id", "w", budget, n_buckets=16).collect()
        }
        assert got == naive, budget
    assert token_budget_sample(df, "doc_id", "w", 10**9).count() == 400


def test_pack_sequences_matches_naive_simulation(spark):
    """Distributed concat-and-chunk packing must equal a sequential Python
    simulation over the same deterministic order, and satisfy the packing
    invariants (full chunks sum to seq_len; doc spans partition each doc)."""
    import random

    from pyspark.sql import functions as F

    from entitymatchingmodel_spark.functions.sampling import (
        pack_sequences,
    )

    rng = random.Random(23)
    rows = [(i, rng.randint(0, 300)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    L = 128
    out = pack_sequences(df, "doc_id", "n", seq_len=L, n_buckets=8).collect()

    # naive simulation in the same (hash, key) order
    hs = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id",
            __import__("entitymatchingmodel_spark.functions.sampling",
                       fromlist=["_unit_hash"])._unit_hash(F.col("doc_id"), "pack").alias("h"),
        ).collect()
    }
    want = []
    cum = 0
    for did, n in sorted(rows, key=lambda r: (hs[r[0]], r[0])):
        if n <= 0:
            continue
        start = cum
        cum += n
        for chunk in range(start // L, (cum - 1) // L + 1):
            s, e = max(start, chunk * L), min(cum, (chunk + 1) * L)
            want.append((chunk, did, n, s - start, s - chunk * L, e - s))
    got = sorted((r["chunk_id"], r["doc_id"], r["n"], r["doc_off"],
                  r["chunk_off"], r["span_len"]) for r in out)
    assert got == sorted(want)

    # invariants
    total = sum(n for _, n in rows if n > 0)
    per_chunk = {}
    per_doc = {}
    for c, d, n, doff, coff, sl in got:
        per_chunk[c] = per_chunk.get(c, 0) + sl
        per_doc[d] = per_doc.get(d, 0) + sl
    full_chunks = total // L
    for c, s in per_chunk.items():
        assert s == (L if c < full_chunks else total % L)
    assert all(per_doc[d] == n for d, n in rows if n > 0)


def test_line_dedup_matches_python_reference_random(spark):
    """Randomized corpora: distributed line dedup must equal a sequential
    Python reference (first (doc, pos) occurrence of each normalized line
    wins) including within-doc dups, case/space variants, and empty lines."""
    import random

    from entitymatchingmodel_spark.operators.dedup import line_dedup

    rng = random.Random(31)
    pool = [f"line {i}" for i in range(40)] + ["", "  SHARED  ", "shared"]
    docs = [
        (d, "\n".join(rng.choice(pool) for _ in range(rng.randint(1, 12))))
        for d in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["id"]: (r["n_lines"], r["n_kept"], r["text"])
        for r in line_dedup(df, "doc_id", "text").collect()
    }

    seen = set()
    want = {}
    for d, text in sorted(docs):
        lines = text.split("\n")
        kept = []
        for ln in lines:
            key = ln.strip().lower()
            if key not in seen:
                seen.add(key)
                kept.append(ln)
        want[d] = (len(lines), len(kept), "\n".join(kept))
    assert got == want


def test_interval_join_matches_bruteforce_random(spark):
    """Randomized points/intervals: the bucketed equi-join must equal the
    quadratic reference, across auto and explicit bucket sizes."""
    import random

    from pyspark.sql import functions as F

    from entitymatchingmodel_spark.operators.events import interval_join

    rng = random.Random(37)
    base = 1_700_000_000
    points = [(i, rng.randint(1, 3), base + rng.randint(0, 50_000))
              for i in range(150)]
    ivs = []
    for j in range(40):
        s = base + rng.randint(0, 50_000)
        ivs.append((j, rng.randint(1, 3), s, s + rng.randint(0, 20_000)))

    pdf = spark.createDataFrame(points, "pid long, k long, ts_s long").withColumn(
        "ts", F.timestamp_seconds("ts_s")).drop("ts_s")
    idf = spark.createDataFrame(ivs, "iv long, k long, s_s long, e_s long").withColumn(
        "s", F.timestamp_seconds("s_s")).withColumn(
        "e", F.timestamp_seconds("e_s")).drop("s_s", "e_s")

    want = {
        (p, j)
        for p, pk, pts in points
        for j, ik, s, e in ivs
        if pk == ik and s <= pts <= e
    }
    for bm in (None, 1, 60):
        got = {
            (r["pid"], r["iv"])
            for r in interval_join(pdf, idf, "k", "ts", "s", "e",
                                   bucket_minutes=bm).collect()
        }
        assert got == want, bm

    # how='left' on the same random data: matched pairs identical, plus
    # exactly one NULL-interval row per point with no containing interval
    # (multiset semantics — a point matched by N intervals appears N times)
    matched_pids = {p for p, _ in want}
    want_left = want | {(p, None) for p, _, _ in points if p not in matched_pids}
    for bm in (None, 60):
        rows = interval_join(pdf, idf, "k", "ts", "s", "e",
                             bucket_minutes=bm, how="left").collect()
        got_left = {(r["pid"], r["iv"]) for r in rows}
        assert got_left == want_left, bm
        assert len(rows) == len(want) + (len(points) - len(matched_pids)), bm
        for r in rows:
            if r["iv"] is None:
                assert r["s"] is None and r["e"] is None


def test_prefix_sum_validate_rejects_duplicate_keys(spark):
    from entitymatchingmodel_spark.functions.sampling import (
        pack_sequences,
        token_budget_sample,
    )

    dup = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 5)], "doc_id long, w long"
    )
    with pytest.raises(ValueError, match="not unique"):
        token_budget_sample(dup, "doc_id", "w", budget=100, validate=True)
    with pytest.raises(ValueError, match="not unique"):
        pack_sequences(dup, "doc_id", "w", seq_len=8, validate=True)
    # unique keys pass with validation on, same result as without
    uniq = spark.createDataFrame([(1, 10), (2, 5), (3, 7)], "doc_id long, w long")
    a = sorted(r["doc_id"] for r in token_budget_sample(uniq, "doc_id", "w", 100).collect())
    b = sorted(r["doc_id"] for r in
               token_budget_sample(uniq, "doc_id", "w", 100, validate=True).collect())
    assert a == b == [1, 2, 3]
