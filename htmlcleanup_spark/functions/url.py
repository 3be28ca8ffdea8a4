"""URL normalization for crawl dedup keys.

A Common-Crawl corpus carries the same page under syntactic url variants
(case in scheme/host, default ports, fragments, query-param order); keying
dedup/resume on the RAW url over-counts.  ``url_normalize`` is the
canonicalizer: pure built-in column expressions (JVM-side, codegen'd), with
every regex chosen from the dialect both Java regex and RE2 evaluate
identically, so a DuckDB oracle reproduces the values bit-for-bit.

Normalization spec (deliberately conservative — no path semantics):
  1. strip the #fragment
  2. lowercase scheme and host (never path/query)
  3. drop default ports (http :80, https :443)
  4. sort query parameters (byte order); drop an empty '?'
  5. strings without a scheme://authority prefix pass through (minus
     fragment) unchanged
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEAD = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"


def url_normalize(url_col: str = "url") -> Column:
    frag = F.regexp_replace(F.col(url_col), "#.*", "")
    head = F.lower(F.regexp_extract(frag, _HEAD, 1))
    head = F.regexp_replace(head, "^(http://.*):80$", "$1")
    head = F.regexp_replace(head, "^(https://.*):443$", "$1")
    tail = F.regexp_replace(frag, _HEAD, "")
    path = F.regexp_extract(tail, "^([^?]*)", 1)
    qs = F.regexp_extract(tail, "\\?(.*)$", 1)
    sorted_qs = F.concat_ws("&", F.array_sort(F.split(qs, "&")))
    return (
        F.when(head == "", frag)
        .when(qs == "", F.concat(head, path))
        .otherwise(F.concat(head, path, F.lit("?"), sorted_qs))
    )
