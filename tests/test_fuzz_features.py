"""rapidfuzz-parity ratio features (M1: ratio / partial_ratio / WRatio).

Expected values mirror reference tests/unit/test_feature_extractor.py:120-145
(rapidfuzz semantics; the reference stores int8-cast scores, so comparisons
truncate toward zero).
"""

import pytest
from pyspark.sql import functions as F

from entitymatchingmodel_spark.operators.features import (
    PAIR_FEATURES,
    _indel_ratio,
    _partial_ratio_bruteforce,
    _partial_ratio_py,
    _wratio_py,
    pair_features,
)


@pytest.mark.parametrize(
    "fn,a,b,expected",
    [
        (_indel_ratio, "abc", "abc", 100),
        (_indel_ratio, "abc", "xyz", 0),
        (_indel_ratio, "abc", "axbc", 85),
        (_wratio_py, "abc", "abc", 100),
        (_wratio_py, "abc", "xyz", 0),
        (_wratio_py, "abc", "axbc", 85),
        (_partial_ratio_py, "abc bcd abc", "abc abc xyz", 77),
        (_partial_ratio_py, "abc", "xyz abc xyz", 100),
        (_indel_ratio, "", "", 100),
        (_wratio_py, "", "abc", 0),
    ],
)
def test_reference_expectations(fn, a, b, expected):
    assert int(fn(a, b)) == expected


def test_partial_ratio_pruned_matches_bruteforce():
    """The r11 bound-pruned partial_ratio is EXACTLY the brute-force max
    over every alignment window — byte-identical floats, all branches
    (clipped edge windows, repeated chars, non-ascii, empty, equal)."""
    import random

    rng = random.Random(20260817)
    alphabets = ["ab", "abc", "abcdefghijklmnopqrstuvwxyz ", "aab bcc", "日本語 "]
    for _ in range(3000):
        alph = rng.choice(alphabets)
        a = "".join(rng.choice(alph) for _ in range(rng.randint(0, 40)))
        b = "".join(rng.choice(alph) for _ in range(rng.randint(0, 40)))
        assert _partial_ratio_py(a, b) == _partial_ratio_bruteforce(a, b), (a, b)
    # forced containment pairs exercise the `s1 in s2` fast path
    for _ in range(1000):
        alph = rng.choice(alphabets)
        a = "".join(rng.choice(alph) for _ in range(rng.randint(1, 20)))
        pad = "".join(rng.choice(alph) for _ in range(rng.randint(0, 20)))
        i = rng.randint(0, len(pad))
        b = pad[:i] + a + pad[i:]
        assert _partial_ratio_py(a, b) == _partial_ratio_bruteforce(a, b), (a, b)
    for a, b in [
        ("", ""), ("", "x"), ("x", ""), ("a", "a"), ("ab", "ba"),
        ("abc bcd abc", "abc abc xyz"), ("abc", "xyz abc xyz"),
        ("aaaa", "aa"), ("ab" * 40, "ba" * 40),
    ]:
        assert _partial_ratio_py(a, b) == _partial_ratio_bruteforce(a, b), (a, b)


def test_wratio_precomputed_reuse_matches_plain():
    """The batch kernel hands WRatio its already-computed indel and
    partial ratios (r11) — identical floats to the self-computing path,
    across both length-ratio branches and the partial sub-branches."""
    import random

    from entitymatchingmodel_spark.operators.features import _indel_ratio

    rng = random.Random(20260818)
    alphabets = ["ab", "abcdefghijklmnopqrstuvwxyz ", "aab bcc", "日本語 "]
    for _ in range(2000):
        alph = rng.choice(alphabets)
        a = "".join(rng.choice(alph) for _ in range(rng.randint(0, 24)))
        b = "".join(rng.choice(alph) for _ in range(rng.randint(0, 64)))
        e, p = _indel_ratio(a, b), _partial_ratio_py(a, b)
        assert _wratio_py(a, b, _end=e, _p=p) == _wratio_py(a, b), (a, b)


def test_wratio_tokenset_shortcut_matches_three_call_max():
    """WRatio's token-set partial is short-circuited to 100.0 when the
    token intersection is non-empty (sect is a prefix of both combined
    strings, so a perfect alignment window exists) — identical to the
    explicit three-call max it replaces (r11).  The explicit form below
    uses `_partial_ratio_py`, itself pinned byte-equal to the brute
    force above, so this chain reaches back to the reference formula."""
    import random

    from entitymatchingmodel_spark.operators.features import (
        _indel_ratio,
        _token_strings,
    )

    def wratio_explicit(s1, s2):
        if not s1 or not s2:
            return 0.0
        l1, l2 = len(s1), len(s2)
        lr = max(l1, l2) / min(l1, l2)
        end = _indel_ratio(s1, s2)
        sa, sb, sect, c1, c2 = _token_strings(s1, s2)
        if lr < 1.5:
            ts = _indel_ratio(sa, sb)
            tset = max(
                _indel_ratio(sect, c1), _indel_ratio(sect, c2), _indel_ratio(c1, c2)
            )
            return max(end, max(ts, tset) * 0.95)
        ps = 0.9 if lr < 8 else 0.6
        p = _partial_ratio_py(s1, s2)
        pts = _partial_ratio_py(sa, sb)
        ptset = max(
            _partial_ratio_py(sect, c1),
            _partial_ratio_py(sect, c2),
            _partial_ratio_py(c1, c2),
        )
        return max(end, p * ps, max(pts, ptset) * 0.95 * ps)

    rng = random.Random(20260819)
    words = ["acme", "holdings", "intl", "business", "corp", "bv", "a", "日本"]
    alphabets = ["ab", "abcdefghijklmnopqrstuvwxyz "]
    for _ in range(2500):
        if rng.random() < 0.5:  # token-ish pairs: exercises sect branches
            a = " ".join(rng.choice(words) for _ in range(rng.randint(0, 4)))
            b = " ".join(rng.choice(words) for _ in range(rng.randint(0, 8)))
        else:
            alph = rng.choice(alphabets)
            a = "".join(rng.choice(alph) for _ in range(rng.randint(0, 30)))
            b = "".join(rng.choice(alph) for _ in range(rng.randint(0, 60)))
        assert _wratio_py(a, b) == wratio_explicit(a, b), (a, b)
    for a, b in [
        (" ", "   x"), ("x", "   "), ("a b", "c d e f"), ("ab", "ab ab ab"),
        ("a", "b c d e f g h i j"), ("日本 語", "語 日本 xx yy zz"),
    ]:
        assert _wratio_py(a, b) == wratio_explicit(a, b), (a, b)


def test_wratio_closed_forms_match_explicit():
    """WRatio's sect-vs-combined indel ratios close to 200*ls/(ls+lcX)
    (sect is a prefix, hence subsequence, of both combined strings, so
    LCS(sect, cX) == len(sect) exactly), and a 100.0 token-set max makes
    the token-sort term unreachable (every ratio is <= 100) — so the
    r11 rewrite skips those LCS scans.  Pinned byte-equal to the explicit
    reference formulation over pairs BIASED to the lr<1.5 token branch
    and the subset/equal/disjoint token-set shapes that fire the new
    closed-form and skip paths."""
    import random

    from entitymatchingmodel_spark.operators.features import (
        _indel_ratio,
        _token_strings,
    )

    def wratio_explicit(s1, s2):
        if not s1 or not s2:
            return 0.0
        l1, l2 = len(s1), len(s2)
        lr = max(l1, l2) / min(l1, l2)
        end = _indel_ratio(s1, s2)
        sa, sb, sect, c1, c2 = _token_strings(s1, s2)
        if lr < 1.5:
            ts = _indel_ratio(sa, sb)
            tset = max(
                _indel_ratio(sect, c1), _indel_ratio(sect, c2), _indel_ratio(c1, c2)
            )
            return max(end, max(ts, tset) * 0.95)
        ps = 0.9 if lr < 8 else 0.6
        p = _partial_ratio_py(s1, s2)
        pts = _partial_ratio_py(sa, sb)
        ptset = max(
            _partial_ratio_py(sect, c1),
            _partial_ratio_py(sect, c2),
            _partial_ratio_py(c1, c2),
        )
        return max(end, p * ps, max(pts, ptset) * 0.95 * ps)

    rng = random.Random(20260818)
    words = ["acme", "holding", "intl", "corp", "bv", "bank", "van", "der", "ab"]
    for _ in range(2500):
        a_toks = [rng.choice(words) for _ in range(rng.randint(0, 4))]
        mode = rng.random()
        if mode < 0.35:  # subset / equal token sets (closed forms hit 100)
            b_toks = a_toks[: rng.randint(0, len(a_toks))] or a_toks
            rng.shuffle(b_toks)
        elif mode < 0.7:  # overlap: sect, d1, d2 all non-empty
            b_toks = a_toks[: rng.randint(0, len(a_toks))] + [
                rng.choice(words) for _ in range(rng.randint(1, 3))
            ]
        else:  # near-equal lengths keep lr < 1.5 without shared tokens
            b_toks = [rng.choice(words) for _ in range(max(1, len(a_toks)))]
        a, b = " ".join(a_toks), " ".join(b_toks)
        assert _wratio_py(a, b) == wratio_explicit(a, b), (a, b)
        assert _wratio_py(b, a) == wratio_explicit(b, a), (b, a)
    for a, b in [
        ("a b", "a b"), ("a b", "b a"), ("a b c", "c b a d"),
        ("acme bv", "acme holding bv"), ("q w e", "r t y"),
        ("", ""), ("x", ""), ("a", "a a a"),
    ]:
        assert _wratio_py(a, b) == wratio_explicit(a, b), (a, b)


def test_partial_ratio_symmetric_and_bounded():
    pairs = [("abcd", "xabcdy"), ("q", "q"), ("ab", "ba"), ("", "x")]
    for a, b in pairs:
        r = _partial_ratio_py(a, b)
        assert r == _partial_ratio_py(b, a)
        assert 0.0 <= r <= 100.0
        assert r >= _indel_ratio(a, b) or len(a) == len(b)


def test_pair_features_has_all_eleven(spark):
    df = spark.createDataFrame(
        [("ing bank nv", "ing groep nv"), ("abc", "xyz"), (None, "x")],
        "preprocessed string, gt_preprocessed string",
    )
    out = pair_features(df)
    assert set(PAIR_FEATURES) <= set(out.columns)
    assert len(PAIR_FEATURES) == 11
    rows = out.collect()
    for r in rows:
        for f in ("f_ratio", "f_partial_ratio", "f_wratio"):
            assert r[f] is not None and 0.0 <= r[f] <= 100.0


def test_spark_values_match_python(spark):
    cases = [("abc bcd abc", "abc abc xyz"), ("abc", "axbc"), ("kitten", "sitting")]
    df = spark.createDataFrame(cases, "preprocessed string, gt_preprocessed string")
    out = {
        (r["preprocessed"], r["gt_preprocessed"]): r
        for r in pair_features(df, decimals=None).collect()
    }
    for a, b in cases:
        r = out[(a, b)]
        assert r["f_ratio"] == _indel_ratio(a, b)
        assert r["f_partial_ratio"] == _partial_ratio_py(a, b)
        assert r["f_wratio"] == _wratio_py(a, b)


def test_rapidfuzz_gate_is_verified_or_absent():
    """The fast path may only be enabled when the installed rapidfuzz
    reproduces the pure-Python reference values on the self-check corpus."""
    from entitymatchingmodel_spark.operators import features as feat

    if feat._RAPIDFUZZ is None:
        # absent or parity-failed: the pure-Python fallback carries on
        assert feat._load_rapidfuzz() is feat._RAPIDFUZZ or feat._load_rapidfuzz() is None
    else:
        fz, jw = feat._RAPIDFUZZ
        for s1, s2 in feat._SELF_CHECK_PAIRS:
            assert abs(fz.ratio(s1, s2) - feat._indel_ratio(s1, s2)) < 1e-9
            assert abs(fz.WRatio(s1, s2) - feat._wratio_py(s1, s2)) < 1e-9


def test_rapidfuzz_parity_random_corpus():
    """Broad equality between the two paths (runs only where rapidfuzz is
    installed; the sandbox ships without it and skips)."""
    import pytest

    rf = pytest.importorskip("rapidfuzz")
    from rapidfuzz.distance import JaroWinkler

    from entitymatchingmodel_spark.operators import features as feat

    import random
    rng = random.Random(7)
    words = ["acme", "global", "holdings", "bv", "ltd", "intl", "zx", "corp"]
    for _ in range(300):
        s1 = " ".join(rng.choices(words, k=rng.randint(0, 5)))
        s2 = " ".join(rng.choices(words, k=rng.randint(0, 9)))
        assert abs(rf.fuzz.ratio(s1, s2) - feat._indel_ratio(s1, s2)) < 1e-9
        assert abs(rf.fuzz.partial_ratio(s1, s2) - feat._partial_ratio_py(s1, s2)) < 1e-9
        assert abs(rf.fuzz.WRatio(s1, s2) - feat._wratio_py(s1, s2)) < 1e-9
        assert abs(JaroWinkler.similarity(s1, s2) - feat._jaro_winkler_py(s1, s2)) < 1e-9
