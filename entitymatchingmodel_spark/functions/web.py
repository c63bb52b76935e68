"""URL normalization for web-corpus curation — all native expressions.

C4 deduplicates by normalized URL and WET-pipeline curation buckets by
domain before content-level dedup; this module is those primitives kept
engine-portable (Java-regex ∩ RE2/POSIX subset: no lookaround, ASCII
classes), so every function is oracle-expressible in ANSI SQL and pushes
to the scan (map-only, zero shuffle).

The reference engine (ing-bank/EntityMatchingModel) has no URL handling;
this is part of the beyond-reference LLM-pipeline surface (same family
as functions/text.quality_score and the dedup operators it feeds — a
`dropDuplicates([url_normalize(...)])` is the C4 URL-dedup step).

Normalization contract (documented precisely because the oracle mirrors
it): scheme and a leading ``www.`` are stripped, the host is lowercased,
query (``?...``) and fragment (``#...``) are dropped, one trailing slash
is trimmed; PATH CASE IS PRESERVED (paths are case-sensitive on most
servers; hosts never are).  ``url_registered_domain`` is the naive
last-two-labels heuristic (correct for ``.com``-style single-label
suffixes); for ccTLD-correct resolution (``example.co.uk``), pass a
public-suffix table to :func:`registered_domain_table` — the suffix
LIST is a data dependency the caller supplies, the longest-suffix
resolution is native broadcast joins.  NULL/empty input propagates NULL
(the corpus-wide all-NULL convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://"


def _strip_scheme_qf(c: Column) -> Column:
    """Drop scheme, fragment, then query (fragment first: a '?' inside a
    fragment is fragment text, not a query)."""
    no_scheme = F.regexp_replace(c, _SCHEME_RE, "")
    no_frag = F.regexp_replace(no_scheme, "#.*$", "")
    return F.regexp_replace(no_frag, "\\?.*$", "")


def url_host(c: Column) -> Column:
    """Lowercased host (leading ``www.`` kept — see :func:`url_domain`),
    with any ``user:pass@`` prefix and ``:port`` suffix dropped."""
    bare = _strip_scheme_qf(c)
    host = F.regexp_extract(bare, "^([^/]*)", 1)
    host = F.regexp_replace(host, "^[^@/]*@", "")
    host = F.regexp_replace(host, ":[0-9]+$", "")
    return F.when(F.length(host) > 0, F.lower(host))


def url_domain(c: Column) -> Column:
    """:func:`url_host` minus a leading ``www.`` — the per-site curation
    key (domain caps, domain blocklists)."""
    return F.regexp_replace(url_host(c), "^www\\.", "")


def url_registered_domain(c: Column) -> Column:
    """Last two dot-labels of the domain (``a.b.example.com`` →
    ``example.com``) — the naive registered-domain heuristic, correct
    whenever the public suffix is a single label.  For multi-label
    suffixes (``co.uk``, ``com.au``) use :func:`registered_domain_table`
    with a user-supplied suffix list."""
    return F.regexp_extract(url_domain(c), "([^.]+\\.[^.]+)$", 1)


def registered_domain_table(
    df: DataFrame,
    url_col: str,
    suffixes: DataFrame,
    out_col: str = "reg_domain",
    suffix_col: str = "suffix",
    max_suffix_labels: int = 4,
) -> DataFrame:
    """Public-suffix-aware registered domain: ``df`` plus ``out_col`` =
    one label + the LONGEST entry of ``suffixes`` that suffix-matches the
    URL's domain (``a.b.example.co.uk`` with ``co.uk`` listed →
    ``example.co.uk``).  A domain that IS a listed suffix has no
    registrable part → NULL (publicsuffix semantics); a domain matching
    no suffix falls back to the naive last-two-labels heuristic of
    :func:`url_registered_domain`, so a partial suffix table degrades
    gracefully.  Wildcard/exception PSL rules (``*.ck`` / ``!www.ck``)
    are not interpreted — pre-expand them into plain suffixes.

    Scale shape: the suffix list (~10k rows for the full PSL) is deduped
    and BROADCAST; resolution is ``max_suffix_labels`` broadcast hash
    equi-joins on the candidate label-suffixes (one per candidate
    length) — map-side only, no shuffle of ``df``, no explode (row count
    never changes), longest candidate wins via a first-match when-chain.
    """
    if max_suffix_labels < 1:
        raise ValueError("max_suffix_labels must be >= 1")
    reserved = {f"_rd_c{i}" for i in range(1, max_suffix_labels + 1)}
    reserved |= {f"_rd_m{i}" for i in range(1, max_suffix_labels + 1)}
    reserved |= {"_rd_l", out_col}
    clash = (reserved - {out_col}) & set(df.columns)
    if clash:
        raise ValueError(f"registered_domain_table reserves columns {sorted(clash)}")
    sfx = (
        suffixes.select(F.lower(F.col(suffix_col).cast("string")).alias("_sfx"))
        .filter(F.col("_sfx").isNotNull() & (F.length("_sfx") > 0))
        .dropDuplicates(["_sfx"])
    )
    work = df.withColumn("_rd_l", F.split(url_domain(F.col(url_col)), "\\."))
    nn = F.size(F.col("_rd_l"))
    for i in range(1, max_suffix_labels + 1):
        cand = F.when(
            nn >= i,
            F.concat_ws(".", F.slice(F.col("_rd_l"), nn - F.lit(i) + 1, F.lit(i))),
        )
        work = work.withColumn(f"_rd_c{i}", cand).join(
            F.broadcast(sfx.select(F.col("_sfx").alias(f"_rd_m{i}"))),
            F.col(f"_rd_c{i}") == F.col(f"_rd_m{i}"),
            "left",
        )
    # first-match when-chain built longest-suffix-outermost
    result = url_registered_domain(F.col(url_col))
    for i in range(1, max_suffix_labels + 1):
        reg_i = F.when(
            nn > i,
            F.concat(
                F.element_at(F.col("_rd_l"), nn - F.lit(i)),
                F.lit("."),
                F.col(f"_rd_c{i}"),
            ),
        )  # NULL when the domain IS the suffix (no registrable part)
        result = F.when(F.col(f"_rd_m{i}").isNotNull(), reg_i).otherwise(result)
    return work.withColumn(out_col, result).drop(
        "_rd_l", *[c for i in range(1, max_suffix_labels + 1) for c in (f"_rd_c{i}", f"_rd_m{i}")]
    )


def url_normalize(c: Column) -> Column:
    """C4-style canonical URL: ``domain + path`` with query/fragment
    dropped, host lowercased and de-``www.``-ed, path case preserved, one
    trailing slash trimmed.  ``dropDuplicates`` on this column is the C4
    URL-dedup step."""
    bare = _strip_scheme_qf(c)
    host = F.regexp_extract(bare, "^([^/]*)", 1)
    path = F.regexp_replace(bare, "^[^/]*", "")
    path = F.regexp_replace(path, "/$", "")
    out = F.concat(url_domain(c), path)
    return F.when(F.length(out) > 0, out)
