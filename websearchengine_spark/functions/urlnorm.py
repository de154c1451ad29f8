"""URL canonicalization — pure column expressions (JVM-side, zero UDF).

The dedup key every Common-Crawl-style pipeline needs before content
dedup: the same page is crawled as `HTTP://WWW.Example.COM:80/a/?b=2&a=1`
and `http://www.example.com/a?a=1&b=2` and must collapse to one key.
Rules (the widely-used safe subset — semantics-preserving per RFC 3986
section 6, plus tracking-param removal):

- scheme and host lowercase;
- default port dropped (http:80, https:443); other ports kept;
- fragment dropped;
- duplicate slashes in the path collapsed, trailing slash dropped
  (root stays "/"; an empty path becomes "/");
- query params split on "&", empties and tracking params
  (utm_*, fbclid, gclid) dropped, the rest SORTED and rejoined;
  an emptied query drops its "?".

Everything is regexp_extract / array expressions so the whole
canonicalization stays inside whole-stage codegen — at 10^12 URLs this
runs in the scan projection, not a Python worker.  Regexes use the
Java/RE2-common subset (character classes only, no lookaround) so the
DuckDB oracle can mirror them verbatim.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def canonical_url(url) -> F.Column:
    """Canonical form of ``url`` (Column or name) per the module rules."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, "#.*$", "")  # fragment
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)", 1))
    host = F.regexp_replace(hostport, ":[0-9]+$", "")
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    rawpath = F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+([^?]*)", 1)
    path = F.regexp_replace(rawpath, "//+", "/")
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(
            (F.length(path) > 1), F.regexp_replace(path, "/$", "")
        ).otherwise(path)
    )
    rawq = F.regexp_extract(u, "\\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(rawq, "&"),
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~p.startswith("fbclid=")
            & ~p.startswith("gclid="),
        )
    )
    query = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


def host_of(url) -> F.Column:
    """Lowercased host (port stripped) — the per-domain grouping key for
    domain caps / per-host stats; same regex subset as canonical_url."""
    u = F.col(url) if isinstance(url, str) else url
    hostport = F.lower(
        F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    return F.regexp_replace(hostport, ":[0-9]+$", "")
