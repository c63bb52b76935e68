"""Seeded name-noise generator (ref emm/data/noiser.py:27-168).

The reference's 8 noise operations, re-implemented as ONE Arrow-batched
pandas UDF whose randomness is a pure function of (name, seed) — every
executor produces the same noise for the same row with no driver-side rng
state, so the operator is deterministic under retries/re-partitioning
(the reference's ``np.random.default_rng(seed)`` is order-dependent and
only deterministic single-threaded).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

AVAILABLE_NOISES = [
    "swap_words", "merge_words", "drop_word", "abbreviate",
    "insert_word", "cut_word", "split_word", "change_word",
]

_WORD_RE = re.compile(r"\w{3,}", re.UNICODE)


def _rng_for(name: str, seed: int) -> np.random.Generator:
    h = hashlib.md5(f"{seed}:{name}".encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "little"))


def _swap_words(name, words, rng, vocab):
    if len(words) < 3:
        return name
    a, b = rng.choice(words, 2, replace=False)
    name = name.replace(a, "\x00", 1)
    name = name.replace(b, a, 1)
    return name.replace("\x00", b, 1)


def _merge_words(name, words, rng, vocab):
    if len(words) < 2:
        return name
    i = int(rng.integers(0, len(words) - 1))
    return name.replace(f"{words[i]} {words[i + 1]}", words[i] + words[i + 1], 1)


def _drop_word(name, words, rng, vocab):
    if len(words) < 2:
        return name
    w = words[int(rng.integers(0, len(words)))]
    return re.sub(r"\s+", " ", name.replace(w, "", 1)).strip()


def _abbreviate(name, words, rng, vocab):
    if len(words) < 2:
        return name
    i = int(rng.integers(0, len(words) - 1))
    pair = f"{words[i]} {words[i + 1]}"
    abbr = words[i][0] + words[i + 1][0]
    return name.replace(pair, abbr, 1)


def _insert_word(name, words, rng, vocab):
    if not vocab:
        return name
    w = vocab[int(rng.integers(0, len(vocab)))]
    pos = int(rng.integers(0, len(words) + 1)) if words else 0
    toks = name.split(" ")
    toks.insert(min(pos, len(toks)), w)
    return " ".join(toks)


def _cut_word(name, words, rng, vocab):
    if not words:
        return name
    w = words[int(rng.integers(0, len(words)))]
    keep = int(rng.integers(1, max(2, len(w) - 1)))
    return name.replace(w, w[:keep], 1)


def _split_word(name, words, rng, vocab):
    long_words = [w for w in words if len(w) >= 5]
    if not long_words:
        return name
    w = long_words[int(rng.integers(0, len(long_words)))]
    cut = int(rng.integers(2, len(w) - 1))
    return name.replace(w, f"{w[:cut]} {w[cut:]}", 1)


def _change_word(name, words, rng, vocab):
    if not words:
        return name
    w = words[int(rng.integers(0, len(words)))]
    i = int(rng.integers(0, len(w)))
    c = chr(ord("a") + int(rng.integers(0, 26)))
    return name.replace(w, w[:i] + c + w[i + 1:], 1)


_OPS = dict(zip(AVAILABLE_NOISES, [
    _swap_words, _merge_words, _drop_word, _abbreviate,
    _insert_word, _cut_word, _split_word, _change_word,
]))


def noise_names(
    df: DataFrame,
    name_col: str = "name",
    out_col: str = "noised_name",
    noise_level: float = 0.3,
    noise_type: str = "all",
    seed: int = 1,
    insert_vocabulary: list[str] | None = None,
) -> DataFrame:
    """Append ``out_col`` with a noised copy of ``name_col``.

    ``noise_level`` is the probability a noise op is applied per name;
    ``noise_type`` one of AVAILABLE_NOISES or 'all' (random pick per name).
    """
    if noise_type != "all" and noise_type not in _OPS:
        raise ValueError(f"unknown noise_type {noise_type!r}")
    vocab = list(insert_vocabulary or ["group", "holding", "international"])
    ops = list(_OPS) if noise_type == "all" else [noise_type]

    @pandas_udf(StringType())
    def noiser(s: pd.Series) -> pd.Series:
        def one(name):
            if name is None:
                return None
            rng = _rng_for(name, seed)
            if rng.random() >= noise_level:
                return name
            op = _OPS[ops[int(rng.integers(0, len(ops)))]]
            words = _WORD_RE.findall(name)
            return op(name, words, rng, vocab)

        return s.map(one)

    return df.withColumn(out_col, noiser(F.col(name_col)))
