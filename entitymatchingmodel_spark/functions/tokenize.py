"""Tokenizers as native Column expressions (no MLlib transformer objects).

Reference uses RegexTokenizer + NGram (emm/indexing/spark_word_tokenizer.py:23-26,
spark_character_tokenizer.py:23-26, spark_cos_sim_matcher.py:167).  Here each
tokenizer is a single Column expression over higher-order functions, so it
inlines into the projection that feeds the inverted-index join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_PATTERN = "[^\\p{IsAlphabetic}\\p{Digit}]+"


def word_tokens(c: Column) -> Column:
    """Split on non-alphanumeric runs; drop empties."""
    return F.array_remove(F.split(c, WORD_PATTERN), "")


def word_ngrams(c: Column, n: int) -> Column:
    """n-grams over word tokens, space-joined (n=1 -> the tokens themselves)."""
    toks = word_tokens(c)
    if n == 1:
        return toks
    return F.filter(
        F.transform(
            toks,
            lambda _, i: F.when(
                i + n <= F.size(toks), F.array_join(F.slice(toks, i + 1, n), " ")
            ),
        ),
        lambda x: x.isNotNull(),
    )


def char_ngrams(c: Column, n: int) -> Column:
    """Sliding character n-grams over the whole string (spaces included).

    Native: sequence + transform + substring — stays in codegen.  Strings
    shorter than n yield a single truncated gram (so short names still match).
    """
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - F.lit(n - 1), F.lit(1)))
    return F.transform(idx, lambda i: c.substr(i, F.lit(n)))


def distinct_tokens(tokens: Column) -> Column:
    return F.array_distinct(tokens)
