"""URL column expressions for web-corpus curation — parse, registered
domain, and canonical normalization, all pure Catalyst (JVM-side, zero
Python), each with an exactly-equivalent DuckDB formulation used by the
oracles in ``__spark_entry__.py``.

Why this layer exists: at web scale the URL is the primary curation key —
per-domain quality priors, domain blocklists, and URL-level dedup (the
first dedup pass every crawl pipeline runs, before any content hashing)
all key on it (RefinedWeb §3.1, C4's URL filters; PAPERS.md).  The
reference has no web surface; this is "beyond the reference"
training-pipeline scope like the rest of the quality family.

Cross-engine ground rules (same as functions/text.py):

* regexes stay in the Java↔RE2-agreeing subset — character classes,
  ``(?:...)``, bounded quantifiers; no lookaround, no backreferences —
  so Spark ``regexp_extract`` and DuckDB ``regexp_extract`` see the same
  language;
* list ops map 1:1 (``filter``/``list_filter``, ``array_sort``/
  ``list_sort``, ``concat_ws``/``array_to_string``) and only ever touch
  ASCII strings, where both engines' default binary collation agrees;
* out-of-range list access is guarded by CASE on the label count in both
  engines (Spark would raise under ANSI; DuckDB yields NULL).

Documented limitations (shared by both engines, so parity always holds):
no userinfo (``user:pass@``) handling, IDN hosts are treated as opaque
labels (no punycode), and the multi-part-TLD table is a small frozen set,
not the full public-suffix list — the *shape* (2-vs-3-label registered
domain) is what the rollup semantics need.

Scale note: every function here is a narrow per-row projection — no
shuffle, linear scaling, parquet column pruning applies.  The HOF lambdas
(query-param filter/sort) touch only cheap comparisons on short arrays,
so the BENCH/BASELINE.md §3 HOF-inlining trap does not apply.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RFC-3986-ish split, restricted to the cross-engine regex subset.
# Groups: 1 scheme, 2 host, 3 port, 4 path, 5 query, 6 fragment.
URL_RE = (
    r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]*)(?::([0-9]+))?"
    r"([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"
)

# Frozen multi-part public suffixes: when a host's last TWO labels are in
# this set, the registered domain takes THREE labels (bbc.co.uk), else two
# (example.com).  Duplicated verbatim in the DuckDB oracle IN-list.
MULTI_SUFFIXES: tuple[str, ...] = (
    "ac.uk",
    "co.in",
    "co.jp",
    "co.nz",
    "co.uk",
    "com.au",
    "com.br",
    "com.cn",
    "com.mx",
    "gov.uk",
    "net.au",
    "org.uk",
)

# Query parameters dropped by normalization: tracking params that vary per
# crawl fetch without changing content identity.
TRACKING_PARAM_PREFIX = "utm_"


def url_scheme(url: Column) -> Column:
    return F.regexp_extract(url, URL_RE, 1)


def url_host(url: Column) -> Column:
    return F.regexp_extract(url, URL_RE, 2)


def url_port(url: Column) -> Column:
    return F.regexp_extract(url, URL_RE, 3)


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, URL_RE, 4)


def url_query(url: Column) -> Column:
    return F.regexp_extract(url, URL_RE, 5)


def registered_domain(host: Column) -> Column:
    """eTLD+1 under the frozen ``MULTI_SUFFIXES`` table: the per-site
    rollup key (lowercased).  ``blog.example.co.uk → example.co.uk``,
    ``www.example.com → example.com``, single-label hosts pass through.
    """
    h = F.lower(host)
    parts = F.split(h, r"[.]")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.try_element_at(parts, F.lit(-2)), F.try_element_at(parts, F.lit(-1))
    )
    last3 = F.concat_ws(".", F.try_element_at(parts, F.lit(-3)), last2)
    return (
        F.when((n >= 3) & last2.isin(*MULTI_SUFFIXES), last3)
        .when(n >= 2, last2)
        .otherwise(h)
    )


def url_normalize(url: Column) -> Column:
    """Canonical URL for exact URL-level dedup.  Deterministic spec
    (mirrored token-for-token by the oracle SQL):

    1. scheme and host lowercased;
    2. default ports dropped (``http:80``, ``https:443``), others kept;
    3. trailing ``/`` runs stripped from the path; empty path → ``/``;
    4. query params split on ``&``; empties and ``utm_*`` tracking params
       dropped; survivors sorted bytewise and rejoined (param ORDER is
       fetch noise, so it must not split dedup groups);
    5. fragment dropped (never sent to the server).
    """
    scheme = F.lower(url_scheme(url))
    host = F.lower(url_host(url))
    port = url_port(url)
    port_n = (
        F.when(port == "", "")
        .when((scheme == F.lit("http")) & (port == "80"), "")
        .when((scheme == F.lit("https")) & (port == "443"), "")
        .otherwise(F.concat(F.lit(":"), port))
    )
    path = F.regexp_replace(url_path(url), r"/+$", "")
    path_n = F.when(path == "", "/").otherwise(path)
    params = F.filter(
        F.split(url_query(url), r"[&]"),
        lambda p: (p != "")
        & ~p.startswith(F.lit(TRACKING_PARAM_PREFIX)),
    )
    query_n = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.concat_ws("&", F.array_sort(params))),
    ).otherwise("")
    return F.concat(scheme, F.lit("://"), host, port_n, path_n, query_n)
