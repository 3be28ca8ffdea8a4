"""Per-page crawl-policy signals: ``<meta name="robots">`` directives
and the ``<link rel="canonical">`` target, as pure column expressions.

A Common-Crawl-style corpus must respect ``noindex`` (drop the page
from the training corpus — the publisher opted out of indexing) and
should collapse duplicates onto the canonical url before dedup ever
runs.  Both signals live in the document head, so a regex header scan —
not a DOM build — is the right cost at 10^12 pages: zero shuffles, zero
Python, whole-stage-codegen JVM regexps (the DOM path exists in
engine/maincontent for jobs that already paid for the parse).

Regex dialect is the Spark(Java)∩DuckDB(RE2) subset used repo-wide
(functions/url.py), so every extraction has an exact SQL twin.
Directive parsing follows the published Google/Bing semantics: token
list split on commas/whitespace, case-insensitive, ``none`` ==
``noindex, nofollow``.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["robots_content", "robots_noindex", "robots_nofollow",
           "canonical_url", "with_robots_flags", "canonical_collapse"]

_META_ROBOTS = "(?i)<meta\\b[^>]*\\bname\\s*=\\s*[\"']?robots[\"']?[^>]*>"
_LINK_CANON = "(?i)<link\\b[^>]*\\brel\\s*=\\s*[\"']?canonical[\"']?[^>]*>"


def _attr(tag: Column, name: str) -> Column:
    """Value of attribute ``name`` inside an extracted tag string —
    double-quoted, single-quoted, or bare, in that precedence."""
    q = F.regexp_extract(tag, '(?i)\\b%s\\s*=\\s*"([^"]*)"' % name, 1)
    s = F.regexp_extract(tag, "(?i)\\b%s\\s*=\\s*'([^']*)'" % name, 1)
    u = F.regexp_extract(
        tag, "(?i)\\b%s\\s*=\\s*([^\\s\"'>][^\\s>]*)" % name, 1
    )
    return F.when(q != "", q).when(s != "", s).otherwise(u)


def robots_content(html_col: str = "html") -> Column:
    """Lowercased contents of ALL robots meta tags, comma-joined ('' if
    absent).  Pages can carry several robots meta tags and the published
    Google/Bing semantics are most-restrictive-wins — since every
    directive we evaluate (noindex/nofollow/none) is an opt-OUT, ORing
    the token test across all tags (one joined token list) implements
    exactly that; a later ``noindex`` is never ignored."""
    tags = F.regexp_extract_all(
        F.col(html_col), F.lit(_META_ROBOTS), F.lit(0)
    )
    contents = F.transform(tags, lambda t: _attr(t, "content"))
    return F.lower(F.array_join(contents, ","))


def _has_token(content: Column, token: str) -> Column:
    return content.rlike("(^|[,\\s])%s([,\\s]|$)" % token)


def robots_noindex(html_col: str = "html") -> Column:
    c = robots_content(html_col)
    return _has_token(c, "noindex") | _has_token(c, "none")


def robots_nofollow(html_col: str = "html") -> Column:
    c = robots_content(html_col)
    return _has_token(c, "nofollow") | _has_token(c, "none")


def canonical_url(html_col: str = "html") -> Column:
    """href of the first rel=canonical link ('' if absent) — collapse
    onto this before url-level dedup so mirrors fold together."""
    tag = F.regexp_extract(F.col(html_col), _LINK_CANON, 0)
    return _attr(tag, "href")


def with_robots_flags(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Annotate pages with (noindex, nofollow, canonical) — the filter
    predicate a corpus build pushes down to the scan."""
    return df.withColumns({
        "noindex": robots_noindex(html_col),
        "nofollow": robots_nofollow(html_col),
        "canonical": canonical_url(html_col),
    })


def canonical_collapse(df: DataFrame, url_col: str = "url",
                       html_col: str = "html") -> DataFrame:
    """Fold mirror/variant pages onto their rel=canonical target BEFORE
    content dedup ever runs — the cheap url-level collapse that removes
    the bulk of parameterized-url duplication without hashing a byte of
    text.

    Group key = the page's canonical href ('' -> its own url).  Within a
    group the survivor is the page whose url IS the canonical target if
    present, else the lexicographically smallest url (deterministic).
    Returns one row per group: (canonical_key, url, n_folded).

    One shuffle, keyed by canonical target; group sizes are mirror
    counts (bounded per site), so no skew pathology — a viral page with
    10^6 parameterized copies is exactly the row this exists to
    collapse."""
    canon = canonical_url(html_col)
    key = F.when(canon != "", canon).otherwise(F.col(url_col))
    w = Window.partitionBy("canonical_key").orderBy(
        (F.col(url_col) == F.col("canonical_key")).desc(),
        F.col(url_col).asc(),
    )
    return (
        df.withColumn("canonical_key", key)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "n_folded",
            F.count("*").over(Window.partitionBy("canonical_key")),
        )
        .filter(F.col("_rn") == 1)
        .select("canonical_key", url_col, "n_folded")
    )
