"""PII scrubbing for training-data pipelines — all native regexp.

Beyond-reference operator family (the reference matches entities; a
training-data engine must also REDACT them).  Every pattern sticks to the
Java-regex/RE2 common subset (no lookahead, ASCII classes, greedy
quantifiers) so the DuckDB oracle reproduces the output bit-for-bit.

Replacement order matters and is fixed: emails first (their local parts
contain digits), then IPv4 (dotted digit runs would otherwise half-match
the phone pattern), then unseparated long digit runs (card/account
numbers — before the phone pattern, which also matches them), then
phone-like separator runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in order
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("long_digits", r"\b\d{13,19}\b", "[NUMBER]"),
    # >= 10 chars of digits/separators; over-redacts long digit-and-space
    # runs by design (a scrubber should err toward redaction)
    ("phone", r"\+?\(?\d[\d\s().-]{8,}\d", "[PHONE]"),
]


def scrub_pii(c: Column) -> Column:
    """Redact emails, IPv4 addresses, phone-like runs, and long digit runs."""
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(c: Column) -> list[Column]:
    """One count column per PII pattern (pre-scrub audit)."""
    return [
        F.size(F.regexp_extract_all(c, F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def scrub_documents(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, scrubbed text, per-pattern counts) — the audit+redact pass."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        scrub_pii(c).alias("scrubbed"),
        *[cc.cast("int") for cc in pii_counts(c)],
    )
