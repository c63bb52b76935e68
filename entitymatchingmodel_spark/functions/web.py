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
last-two-labels heuristic — it does NOT ship a public-suffix list, so
``example.co.uk`` yields ``co.uk`` (documented limitation; a correct
multi-label suffix table is a data dependency, not an operator change).
NULL/empty input propagates NULL (the corpus-wide all-NULL convention).
"""

from __future__ import annotations

from pyspark.sql import Column
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
    ``example.com``) — the naive registered-domain heuristic (no
    public-suffix list; see module docstring)."""
    return F.regexp_extract(url_domain(c), "([^.]+\\.[^.]+)$", 1)


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
