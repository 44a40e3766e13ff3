"""URL canonicalization — step 0 of web-crawl curation.

Before any content dedup runs, a crawl pipeline collapses the URL
aliases that fetch the same resource (scheme/host case, default ports,
trailing slashes, fragments, tracking parameters, unstable query-param
order); skipping it multiplies every downstream stage by the alias
factor. Beyond-reference surface (the reference pipeline has no web
leg); sibling of the text-analysis family in `functions/text.py`.

Everything here is pure Catalyst expressions (`parse_url`, regexp,
array ops) — JVM-side, whole-stage-codegen, zero Python in the hot
path, so canonicalization runs at scan speed over 100 TB of crawl
metadata. The transforms are the standard RFC-3986-adjacent
normalizations every crawler applies (lowercase scheme+host, drop
default port, drop fragment, strip tracking params, sort the query
string, collapse duplicate slashes, strip the trailing slash) — each
one chosen because it never changes which resource an HTTP server
resolves for the overwhelming majority of sites, which is the crawl
trade-off (a pathological site can distinguish `?a=1&b=2` from
`?b=2&a=1`; a pipeline that refuses to canonicalize on those grounds
re-fetches the web several times over).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never select content: analytics/click trackers.
TRACKING_PARAMS_PATTERN = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref_src)="


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_host(c: Column | str) -> Column:
    """Lowercased host (no port) — the per-site rollup key."""
    return F.lower(F.try_parse_url(_col(c), F.lit("HOST")))


def url_registered_domain(c: Column | str) -> Column:
    """Last two dot-labels of the host — a HEURISTIC crawl-quota key,
    right only for default-rule (.com/.org-style) hosts: on ccTLD or
    private-suffix hosts it collapses whole hierarchies
    (``shop.example.co.uk`` -> ``co.uk``). Quota/rollup callers should
    use the true eTLD+1 instead:
    `functions/public_suffix.py:with_registered_domain` (broadcast
    suffix-match join against the checked-in public-suffix snapshot,
    r12) — on multi-label hosts without a trailing dot this expression
    matches its default-rule fallback; they diverge on single-label
    hosts (this returns the host, the PSL path NULL — nothing
    registrable) and trailing-dot hosts (only the PSL path strips the
    dot). Kept for expression-only contexts."""
    h = url_host(c)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(h)


def url_canonicalize(c: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL.

    Normalizations, in order:
    - scheme and host lowercased;
    - default port dropped (``:80`` for http, ``:443`` for https);
      non-default ports kept;
    - path: duplicate slashes collapsed, trailing slash stripped
      (the root path canonicalizes to no path at all);
    - query: tracking params (``TRACKING_PARAMS_PATTERN``) removed,
      the rest SORTED bytewise and rejoined (param order is transport
      noise); an emptied query drops the ``?``;
    - fragment dropped (never sent to the server).

    NULL in -> NULL out; a URL ``try_parse_url`` cannot parse (ANSI
    ``parse_url`` THROWS on garbage — one malformed link in 100 TB of
    crawl metadata must quarantine as NULL, never kill the job) yields
    NULL, the eligibility convention every text operator uses.
    """
    u = _col(c)
    proto = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = url_host(c)
    authority = F.try_parse_url(u, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((proto == "http") & (port == "80"))
        | ((proto == "https") & (port == "443"))
    )
    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"/$", "")
    query = F.try_parse_url(u, F.lit("QUERY"))
    params = F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda p: (F.length(p) > 0)
        & ~p.rlike(TRACKING_PARAMS_PATTERN),
    )
    qs = F.concat_ws("&", F.array_sort(params))
    return F.when(
        proto.isNotNull() & host.isNotNull(),
        F.concat(
            proto,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            path,
            F.when(F.length(qs) > 0, F.concat(F.lit("?"), qs)).otherwise(
                F.lit("")
            ),
        ),
    )
