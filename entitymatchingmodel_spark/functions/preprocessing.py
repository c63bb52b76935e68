"""Name-preprocessing functions (reference: emm/preprocessing/functions.py:31-96).

Each function is Column -> Column.  All hot-path transforms are native Spark
expressions (regexp_replace / translate / lower / trim) that stay inside
whole-stage codegen; the only Python boundary in the whole preprocessing layer
is abbreviation merging (a genuine multi-pass regex state machine,
reference abbreviation_util.py:90-139), implemented as an Arrow-batched
pandas UDF.

Pipelines (reference base_name_preprocessor.py:32-80):
  preprocess_name, preprocess_with_punctuation, preprocess_merge_abbr (default),
  preprocess_merge_abbr_v0, preprocess_merge_legal_abbr
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# ---------------------------------------------------------------------------
# Accent stripping — native translate() table (Latin-1 Supplement + Latin
# Extended-A), no UDF.  Multi-char expansions handled by a few regex passes.
# ---------------------------------------------------------------------------
_ACCENT_SRC = (
    "ÀÁÂÃÄÅàáâãäåÇçÈÉÊËèéêëÌÍÎÏìíîïÑñÒÓÔÕÖØòóôõöøÙÚÛÜùúûüÝÿýŠšŽžŸ"
    "ĀāĂăĄąĆćĈĉĊċČčĎďĐđĒēĔĕĖėĘęĚěĜĝĞğĠġĢģĤĥĦħĨĩĪīĬĭĮįİıĴĵĶķĹĺĻļĽľŁł"
    "ŃńŅņŇňŌōŎŏŐőŔŕŖŗŘřŚśŜŝŞşŢţŤťŦŧŨũŪūŬŭŮůŰűŲųŴŵŶŷŹźŻż"
)
_ACCENT_DST = (
    "AAAAAAaaaaaaCcEEEEeeeeIIIIiiiiNnOOOOOOooooooUUUUuuuuYyySsZzY"
    "AaAaAaCcCcCcCcDdDdEeEeEeEeEeGgGgGgGgHhHhIiIiIiIiIiJjKkLlLlLlLl"
    "NnNnNnOoOoOoRrRrRrSsSsSsTtTtTtUuUuUuUuUuUuWwYyZzZz"
)
assert len(_ACCENT_SRC) == len(_ACCENT_DST)

_MULTI = [("ß", "ss"), ("Æ", "AE"), ("æ", "ae"), ("Œ", "OE"), ("œ", "oe"), ("Þ", "Th"), ("þ", "th"), ("Ð", "D"), ("ð", "d")]


def strip_accents(c: Column) -> Column:
    """Transliterate accented Latin chars to ASCII (ref functions.py:52-53)."""
    for src, dst in _MULTI:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return F.translate(c, _ACCENT_SRC, _ACCENT_DST)


def strip_hyphens(c: Column) -> Column:
    """``[-_]`` -> space (ref functions.py:54-55)."""
    return F.regexp_replace(c, "[-_]", " ")


def strip_punctuation(c: Column) -> Column:
    """Punctuation -> space (ref functions.py:56-58; Java regex \\p{Punct})."""
    return F.regexp_replace(c, "[\\p{Punct}$=“”¨]", " ")


def insert_space_around_punctuation(c: Column) -> Column:
    """`` $1 `` around punctuation (ref functions.py:59-62)."""
    return F.regexp_replace(c, "([\\p{Punct}$=“”¨])", " $1 ")


def handle_lower_trim(c: Column) -> Column:
    return F.trim(F.lower(c))


def remove_extra_space(c: Column) -> Column:
    """Collapse whitespace runs; trim (ref functions.py:73-74)."""
    return F.trim(F.regexp_replace(c, "\\s+", " "))


def remove_newline(c: Column) -> Column:
    return F.regexp_replace(c, "[\\n\\r]", " ")


def replace_punctuation(c: Column) -> Column:
    """Unicode dashes -> '-' (ref functions.py:92-95)."""
    return F.regexp_replace(c, "[‐‑‒–—―−]", "-")


def replace_none(c: Column) -> Column:
    """null -> '' (ref functions.py:99-102)."""
    return F.coalesce(c, F.lit(""))


# Dutch/legal shorthand mapping (ref functions.py:37-49) — chained native regex.
_SHORTHANDS = [
    (r"\bstichting\b", "stg"),
    (r"\bvereniging\b", "ver"),
    (r"\blimited\b", "ltd"),
    (r"\bincorporated\b", "inc"),
    (r"\bcompany\b", "co"),
    (r"(\bpublic limited co\b|\bpublic ltd co\b|\bpublic ltd\b)", "plc"),
]


def map_shorthands(c: Column) -> Column:
    for pat, rep in _SHORTHANDS:
        c = F.regexp_replace(c, pat, rep)
    return c


def merge_ampersand(c: Column) -> Column:
    """``H & M`` -> ``HM`` (ref functions.py:77-80)."""
    return F.regexp_replace(
        c, "(?<![\\p{IsAlphabetic}\\d])(\\w)\\s*&\\s*(\\w)(?![\\p{IsAlphabetic}\\d])", "$1$2"
    )


# Legal-form suffix removal — own curated list (public legal-entity suffixes),
# replacing the reference's cleanco dependency (ref functions.py:81-91).
_LEGAL_FORMS = (
    "bv|nv|vof|cv|bvba|gmbh|ag|kg|ug|ohg|ab|as|aps|oy|oyj|sa|sas|sarl|sl|srl|spa|"
    "sp z o o|sp zoo|zoo|sro|plc|ltd|llc|llp|lp|inc|corp|co|company|limited|"
    "incorporated|corporation|kk|kabushiki kaisha|pty|pte|pvt|ulc|se|eurl|snc|"
    "kft|rt|doo|ad|ead|ooo|pao|oao|spol"
)
_LEGAL_RE = f"\\s\\b({_LEGAL_FORMS})\\b\\.?\\s*$"


def remove_legal_form(c: Column) -> Column:
    """Strip trailing legal-entity-form tokens (up to two, e.g. 'X B.V. Ltd')."""
    c1 = F.regexp_replace(c, _LEGAL_RE, "")
    return F.regexp_replace(c1, _LEGAL_RE, "")


# ---------------------------------------------------------------------------
# Abbreviation merging — the one genuine Python step (multi-pass state machine,
# ref abbreviation_util.py:90-99).  Arrow-batched pandas UDF.
# ---------------------------------------------------------------------------
_ABBR_RUN = re.compile(r"\b(?:[A-Za-z](?:[.]\s*|\s+)){1,}[A-Za-z]\b\.?")


def _merge_abbr_str(s: str) -> str:
    """Collapse runs of single letters separated by dots/spaces: 'B. V.'->'BV'."""
    if not s:
        return s

    def _collapse(m: re.Match) -> str:
        return re.sub(r"[.\s]", "", m.group(0))

    return _ABBR_RUN.sub(_collapse, s)


_LEGAL_ABBR_SET = {
    "bv", "nv", "cv", "vof", "gmbh", "ag", "sa", "se", "kk", "plc", "ltd", "llc",
    "llp", "inc", "co", "ab", "as", "oy", "kg", "ug",
}


def _merge_legal_abbr_str(s: str) -> str:
    """Merge letter runs only when the collapsed run is a known legal form."""
    if not s:
        return s

    def _collapse(m: re.Match) -> str:
        merged = re.sub(r"[.\s]", "", m.group(0))
        return merged if merged.lower() in _LEGAL_ABBR_SET else m.group(0)

    return _ABBR_RUN.sub(_collapse, s)


@pandas_udf(StringType())
def merge_abbreviations_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: _merge_abbr_str(x) if x is not None else None)


@pandas_udf(StringType())
def merge_legal_abbreviations_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: _merge_legal_abbr_str(x) if x is not None else None)


def merge_abbreviations(c: Column) -> Column:
    return merge_abbreviations_udf(c)


def merge_legal_form_abbreviations(c: Column) -> Column:
    return merge_legal_abbreviations_udf(c)


# ---------------------------------------------------------------------------
# Named pipelines (ref base_name_preprocessor.py:32-80)
# ---------------------------------------------------------------------------
PIPELINES: dict[str, list] = {
    # pure-native pipeline: accent-strip, punctuation, lower, whitespace
    "preprocess_name": [
        replace_none,
        remove_newline,
        strip_accents,
        replace_punctuation,
        strip_hyphens,
        strip_punctuation,
        handle_lower_trim,
        remove_extra_space,
    ],
    "preprocess_with_punctuation": [
        replace_none,
        remove_newline,
        strip_accents,
        replace_punctuation,
        insert_space_around_punctuation,
        handle_lower_trim,
        remove_extra_space,
    ],
    # default: also merge abbreviations ('B. V.'->'bv'), map shorthands, '&'
    "preprocess_merge_abbr": [
        replace_none,
        remove_newline,
        strip_accents,
        replace_punctuation,
        merge_ampersand,
        merge_abbreviations,
        strip_hyphens,
        strip_punctuation,
        handle_lower_trim,
        map_shorthands,
        remove_extra_space,
    ],
    "preprocess_merge_abbr_v0": [
        replace_none,
        remove_newline,
        strip_accents,
        merge_abbreviations,
        strip_hyphens,
        strip_punctuation,
        handle_lower_trim,
        remove_extra_space,
    ],
    "preprocess_merge_legal_abbr": [
        replace_none,
        remove_newline,
        strip_accents,
        replace_punctuation,
        merge_ampersand,
        merge_legal_form_abbreviations,
        strip_hyphens,
        strip_punctuation,
        handle_lower_trim,
        map_shorthands,
        remove_extra_space,
    ],
}


def apply_pipeline(c: Column, pipeline: str | list = "preprocess_merge_abbr") -> Column:
    steps = PIPELINES[pipeline] if isinstance(pipeline, str) else pipeline
    for step in steps:
        c = step(c)
    return c
