"""Corpus-wide exact line dedup (C4/RefinedWeb-style curation)."""

from entitymatchingmodel_spark.operators.dedup import line_dedup


def test_line_dedup_first_occurrence_wins(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta\ncommon footer\ngamma"),
            (2, "common footer\ndelta"),          # footer seen in doc 1
            (3, "COMMON FOOTER  \nalpha beta"),   # normalized dups of doc 1
            (4, "common footer"),                 # fully duplicate doc
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in line_dedup(docs, "doc_id", "text").collect()}
    assert got[1]["text"] == "alpha beta\ncommon footer\ngamma"
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (3, 3)
    assert got[2]["text"] == "delta" and got[2]["n_kept"] == 1
    assert got[3]["text"] == "" and got[3]["n_kept"] == 0
    assert got[4]["text"] == "" and got[4]["n_kept"] == 0


def test_line_dedup_within_doc_and_order(spark):
    docs = spark.createDataFrame(
        [(1, "x\ny\nx\nz")],  # within-doc duplicate line
        "doc_id long, text string",
    )
    r = line_dedup(docs, "doc_id", "text").collect()[0]
    assert r["text"] == "x\ny\nz" and r["n_lines"] == 4 and r["n_kept"] == 3


def test_line_dedup_no_normalize(spark):
    docs = spark.createDataFrame(
        [(1, "A\na")], "doc_id long, text string"
    )
    r = line_dedup(docs, "doc_id", "text", normalize=False).collect()[0]
    assert r["n_kept"] == 2


def test_line_dedup_metachar_separator(spark):
    """sep must split literally even when it is a regex metacharacter."""
    docs = spark.createDataFrame(
        [(1, "aa|bb|aa"), (2, "bb|cc")], "doc_id long, text string"
    )
    got = {r["id"]: r for r in line_dedup(docs, "doc_id", "text", sep="|").collect()}
    assert got[1]["text"] == "aa|bb" and got[1]["n_lines"] == 3
    assert got[2]["text"] == "cc"


def test_duplicate_window_stats_and_spans_match_naive(spark):
    """Windowed substring-dup signal vs a naive Python reference:
    per-doc window counts, dup counts, and MERGED spans must agree on a
    randomized small-vocab corpus with planted repeated passages."""
    import random
    import re

    from entitymatchingmodel_spark.operators.dedup import (
        duplicate_spans,
        duplicate_window_stats,
    )

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    passage = " ".join(rng.choice(vocab) for _ in range(17))
    docs = []
    for i in range(30):
        words = [rng.choice(vocab) for _ in range(rng.randint(3, 60))]
        if i % 4 == 0:  # plant the shared passage mid-document
            pos = rng.randint(0, len(words))
            words = words[:pos] + passage.split() + words[pos:]
        docs.append((i, " ".join(words)))

    W, S = 8, 3

    def naive():
        wins = {}
        per_doc = {}
        for i, text in docs:
            toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
            nw = max(0, (len(toks) - W) // S + 1)
            ws = []
            for p in range(nw):
                key = " ".join(toks[p * S: p * S + W])
                ws.append((p * S, p * S + W, key))
                wins[key] = wins.get(key, 0) + 1
            per_doc[i] = (nw, ws)
        stats, spans = {}, {}
        for i, (nw, ws) in per_doc.items():
            dups = [(s, e) for s, e, k in ws if wins[k] > 1]
            stats[i] = (nw, len(dups))
            merged = []
            for s, e in sorted(dups):
                if merged and s <= merged[-1][1]:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], e))
                else:
                    merged.append((s, e))
            if merged:
                spans[i] = merged
        return stats, spans

    want_stats, want_spans = naive()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got_stats = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
        for r in duplicate_window_stats(df, "doc_id", "text", window=W, stride=S).collect()
    }
    assert got_stats == want_stats
    assert any(d > 0 for _, d in got_stats.values()), "planted passage must duplicate"
    got_spans = {}
    for r in duplicate_spans(df, "doc_id", "text", window=W, stride=S).collect():
        got_spans.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    got_spans = {k: sorted(v) for k, v in got_spans.items()}
    assert got_spans == want_spans


def test_remove_duplicate_passages_matches_naive(spark):
    """First-occurrence-wins passage removal vs a naive Python reference:
    rebuilt texts and removal counts must agree on a randomized corpus
    with planted repeated passages."""
    import random
    import re

    from entitymatchingmodel_spark.operators.dedup import remove_duplicate_passages

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(30)]
    passage = " ".join(rng.choice(vocab) for _ in range(15))
    docs = []
    for i in range(24):
        words = [rng.choice(vocab) for _ in range(rng.randint(2, 50))]
        if i % 3 == 0:
            pos = rng.randint(0, len(words))
            words = words[:pos] + passage.split() + words[pos:]
        docs.append((i, " ".join(words)))

    W, S = 6, 2

    def naive():
        occ = {}
        toks_by_doc = {}
        for i, text in docs:
            toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
            toks_by_doc[i] = toks
            nw = max(0, (len(toks) - W) // S + 1)
            for p in range(nw):
                key = " ".join(toks[p * S: p * S + W])
                occ.setdefault(key, []).append((i, p * S))
        cut = {}
        for key, places in occ.items():
            if len(places) < 2:
                continue
            winner = min(places)
            for i, s in places:
                if (i, s) != winner:
                    cut.setdefault(i, []).append((s, s + W))
        out = {}
        for i, toks in toks_by_doc.items():
            merged = []
            for s, e in sorted(cut.get(i, [])):
                if merged and s <= merged[-1][1]:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], e))
                else:
                    merged.append((s, e))
            kept = [t for j, t in enumerate(toks)
                    if not any(s <= j < e for s, e in merged)]
            out[i] = (" ".join(kept), len(toks), len(toks) - len(kept))
        return out

    want = naive()
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_tokens_removed"])
        for r in remove_duplicate_passages(
            spark.createDataFrame(docs, "doc_id long, text string"),
            "doc_id", "text", window=W, stride=S,
        ).collect()
    }
    assert got == want
    assert any(rm > 0 for _, _, rm in got.values()), "planted passages must be cut"
    # exactly one occurrence of the planted passage text survives corpus-wide
    survivors = sum(passage in t for t, _, _ in got.values())
    assert survivors >= 1


def test_remove_duplicate_passages_null_text(spark):
    """NULL input text propagates NULL (text, n_tokens, n_tokens_removed) —
    the same answer a SQL engine's string/list functions give on NULL input,
    so the DuckDB oracle stays hash-identical if documents.text ever becomes
    nullable.  Pinned per round-5 advice (sampling/dedup NULL semantics)."""
    from entitymatchingmodel_spark.operators.dedup import remove_duplicate_passages

    shared = "a b c d e f a b c d e f"
    df = spark.createDataFrame(
        [(1, shared), (2, shared), (3, None), (4, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_tokens_removed"])
        for r in remove_duplicate_passages(df, "doc_id", "text", window=3, stride=1).collect()
    }
    assert got[3] == (None, None, None)
    assert got[4] == ("", 0, 0)
    # sanity: the duplicated docs still get passages cut (doc 1 wins the
    # first occurrence; its own internal repeat and all of doc 2 are losers)
    assert got[1][2] > 0 and got[2][2] == 12


def test_line_dedup_keeps_null_text_docs(spark):
    """NULL-text documents must keep their output row (posexplode would
    silently drop them): (n_lines NULL, n_kept 0, text '') — the shape the
    SQL-engine formulation (len(NULL)->NULL, unnest drops, outer rejoin)
    yields, so a nullable corpus stays oracle-consistent."""
    from entitymatchingmodel_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        [(1, "a\nb\na"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    got = {r["id"]: (r["n_lines"], r["n_kept"], r["text"])
           for r in line_dedup(df, "doc_id", "text").collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] == (3, 2, "a\nb")
    assert got[2] == (None, 0, "")
    assert got[3] == (1, 1, "")
