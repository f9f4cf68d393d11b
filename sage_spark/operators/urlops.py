"""URL canonicalization + registered-domain extraction for crawl corpora.

Common-Crawl-style pipelines dedupe and partition by URL, and raw crawl
URLs are messy: mixed-case schemes/hosts, default ports, fragments,
tracking parameters, unordered query strings. ``canonicalize_url`` folds
all of those so byte-different spellings of the same resource collide —
the key prerequisite for URL-level dedup and per-site stats at 10^12 pages.

Rules (all pure codegen string/array expressions, no UDFs):

1. drop the fragment (``#...``);
2. lowercase scheme and host;
3. strip the scheme's default port (``:80`` http, ``:443`` https);
4. optionally strip a leading ``www.``;
5. drop tracking parameters (utm_*, gclid, fbclid, msclkid, mc_eid,
   igshid), sort the surviving query params byte-wise, and re-join;
6. empty path becomes ``/``.

``registered_domain`` approximates the public-suffix rule relationally:
the last two host labels, or the last three when the second-to-last label
is a known second-level registry (co/com/net/org/ac/gov/edu) under a
2-letter ccTLD — co.uk, com.au, etc. (A full public-suffix list would be a
broadcast dimension table in production; the rule form keeps the operator
oracle-checkable.)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TRACKING_RE = "^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|igshid)(=|$)"
SECOND_LEVEL = ("ac", "co", "com", "edu", "gov", "net", "org")


def canonicalize_url(url: Column, *, strip_www: bool = True) -> Column:
    no_frag = F.regexp_replace(url, "#.*$", "")
    base = F.regexp_extract(no_frag, "^([^?]*)", 1)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    scheme = F.lower(F.regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    rest = F.regexp_replace(base, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, "^([^/]*)", 1))
    path = F.regexp_extract(rest, "^[^/]*(/.*)?$", 1)
    host = F.when(scheme == "http", F.regexp_replace(host, ":80$", "")).when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).otherwise(host)
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    params = F.filter(
        F.split(query, "&"), lambda p: (p != "") & ~p.rlike(TRACKING_RE)
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    out = F.concat(
        scheme, F.lit("://"), host,
        F.when(path == "", F.lit("/")).otherwise(path),
    )
    return F.when(qcanon != "", F.concat(out, F.lit("?"), qcanon)).otherwise(out)


def host_of(canonical_url: Column) -> Column:
    return F.regexp_extract(canonical_url, "^[a-z][a-z0-9+.-]*://([^/]*)", 1)


def registered_domain(host: Column) -> Column:
    labels = F.split(host, r"\.")
    n = F.size(labels)
    second_last = F.element_at(labels, -2)
    tld = F.element_at(labels, -1)
    use_three = (
        (n >= 3) & second_last.isin(*SECOND_LEVEL) & (F.length(tld) == 2)
    )
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    return F.when(n <= 1, host).when(use_three, last3).otherwise(last2)
