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


def url_host(url_col: str = "url") -> Column:
    """The lowercased authority of an absolute url ('' when not absolute)
    — pure column expressions in the Spark∩DuckDB∩RE2 regex dialect."""
    return F.lower(
        F.regexp_extract(F.col(url_col), "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    )


def blocklist_filter(df, hosts=None, path_patterns=None,
                     url_col: str = "url", max_labels: int = 5):
    """Drop rows whose url matches a host blocklist or a path regex (the
    C4 / RefinedWeb URL-filter pass: adult/spam domain lists + banned
    path segments).

    - ``hosts``: exact lowercased authorities to drop, INCLUDING
      subdomains (``bad.com`` also blocks ``www.bad.com``, never
      ``notbad.com`` — dot-boundary rule).  Implemented as one chained
      EQUI anti-join per suffix level (host, parent domain, ... up to
      ``max_labels`` trailing labels): each is a broadcast-HASH join —
      a suffix-OR join condition would degrade to BroadcastNestedLoop
      (per-row scan of the whole blocklist), and a per-row IN-list
      expression would put megabytes in the plan.  All levels run
      map-side in a single stage, zero shuffles; a million-entry list
      costs one broadcast.
    - ``path_patterns``: Java∩RE2 regexes OR-ed into one ``rlike`` over
      the url — a pushed-down filter, zero shuffles.

    Blocklist entries deeper than ``max_labels`` labels cannot match and
    are rejected loudly rather than silently ignored.
    """
    out = df
    if path_patterns:
        pat = "|".join("(?:%s)" % p for p in path_patterns)
        out = out.filter(~F.col(url_col).rlike(pat))
    if hosts:
        too_deep = [h for h in hosts if h.count(".") + 1 > max_labels]
        if too_deep:
            raise ValueError(
                "blocklist entries exceed max_labels=%d: %r"
                % (max_labels, too_deep[:3])
            )
        spark = df.sparkSession
        bl = spark.createDataFrame(
            [(h.lower(),) for h in sorted(set(hosts))], "_bl_host string"
        )
        parts = F.split(url_host(url_col), "\\.")
        out = out.withColumn("_hp", parts)
        for i in range(1, max_labels + 1):
            # the last-i-labels suffix; null (never equal) when the host
            # has fewer labels or is empty
            suffix = F.when(
                F.size("_hp") >= i,
                F.concat_ws(".", F.slice(F.col("_hp"), -i, i)),
            )
            out = out.join(
                F.broadcast(bl),
                suffix == F.col("_bl_host"),
                "left_anti",
            )
        out = out.drop("_hp")
    return out


def url_path_templates(df, url_col: str = "url",
                       trap_min_urls: int = 100):
    """URL path-template mining — the crawler-trap detector (calendar
    pages, session-id paths, infinite pagination): collapse every url
    to its PATH SKELETON (query/fragment dropped, digit runs -> ``N``)
    and count urls per (host, template).  A template absorbing a huge
    url count while containing ``N`` is the classic infinite-space
    signature; ``is_trap`` applies the count threshold so the output
    feeds a frontier filter directly.

    Returns (host, template, depth, n_urls, sample_url, is_trap) —
    sample_url the lexicographic min (a deterministic witness), depth
    the template's segment count.

    Scale shape: pure column exprs into ONE map-combined groupBy on
    (host, template) — the template universe is tiny next to the url
    universe (that's the point), so the shuffle output is small;
    min(url) rides the same agg.  No window, no join."""
    host = F.regexp_extract(F.col(url_col), "^[a-z]+://([^/:?#]+)", 1)
    path = F.regexp_extract(
        F.col(url_col), "^[a-z]+://[^/]+(/[^?#]*)?", 1
    )
    template = F.regexp_replace(
        F.when(path == "", "/").otherwise(path), "[0-9]+", "N"
    )
    out = (
        df.select(
            host.alias("host"),
            template.alias("template"),
            F.col(url_col).alias("_u"),
        )
        .groupBy("host", "template")
        .agg(
            F.count("*").alias("n_urls"),
            F.min("_u").alias("sample_url"),
        )
    )
    depth = (F.size(F.split(F.col("template"), "/")) - 1).cast("int")
    return out.select(
        "host", "template", depth.alias("depth"), "n_urls",
        "sample_url",
        (
            (F.col("n_urls") >= trap_min_urls)
            & F.col("template").contains("N")
        ).alias("is_trap"),
    )


_YMD_PATH = r"/((?:19|20)\d\d)/(\d{1,2})/(\d{1,2})(?:/|$)"
_YM_PATH = r"/((?:19|20)\d\d)/(\d{1,2})(?:/|$)"
_COMPACT = r"(?:^|[^0-9])((?:19|20)\d\d)(\d\d)(\d\d)(?:[^0-9]|$)"
_DATE_Q = r"(?:^|&)date=((?:19|20)\d\d)-(\d\d)-(\d\d)(?:&|$)"


def url_publish_dates(df, url_col: str = "url",
                      ref_date: str = "2026-01-01"):
    """Publish-date mining from url shape — the freshness signal a
    recrawl scheduler and a time-aware sampler both need (news/blog
    CMSs encode the publish date in the path; Common Crawl has no
    per-page lastmod).  Four candidate shapes, precision-first:

      path_ymd   /YYYY/M/D/      (WordPress-style calendar paths)
      query      ?date=YYYY-MM-DD
      compact    YYYYMMDD        (digit-run in a path segment)
      path_ym    /YYYY/M/        (month archive -> day 1)

    A matched candidate is calendar-validated (month 1-12, day vs the
    month length with the full Gregorian leap rule); an INVALID match
    yields no date rather than falling through — '20240230' is a
    product id, not a clue about other segments.  All regexes live in
    the Java∩RE2 dialect, all arithmetic is integer, so the DuckDB
    twin is bit-identical.

    Returns the input plus (date_src, pub_date 'yyyy-MM-dd' string,
    age_days int vs ``ref_date``, fresh_band in {future,30d,1y,5y,
    older}).  Scale: pure column expressions, zero shuffle, zero
    join — codegen-resident next to the scan; a fresh_band filter
    pushes down."""
    u = F.col(url_col)
    tail = F.regexp_replace(u, _HEAD, "")
    path = F.regexp_extract(tail, "^([^?#]*)", 1)
    qs = F.regexp_extract(u, r"\?([^#]*)", 1)

    def _g(src, pat, i):
        return F.regexp_extract(src, pat, i)

    ymd_y = _g(path, _YMD_PATH, 1)
    q_y = _g(qs, _DATE_Q, 1)
    c_y = _g(path, _COMPACT, 1)
    ym_y = _g(path, _YM_PATH, 1)

    src = (
        F.when(ymd_y != "", F.lit("path_ymd"))
        .when(q_y != "", F.lit("query"))
        .when(c_y != "", F.lit("compact"))
        .when(ym_y != "", F.lit("path_ym"))
    )
    y = (
        F.when(ymd_y != "", ymd_y)
        .when(q_y != "", q_y)
        .when(c_y != "", c_y)
        .when(ym_y != "", ym_y)
    ).cast("int")
    m = (
        F.when(ymd_y != "", _g(path, _YMD_PATH, 2))
        .when(q_y != "", _g(qs, _DATE_Q, 2))
        .when(c_y != "", _g(path, _COMPACT, 2))
        .when(ym_y != "", _g(path, _YM_PATH, 2))
    ).cast("int")
    d = (
        F.when(ymd_y != "", _g(path, _YMD_PATH, 3))
        .when(q_y != "", _g(qs, _DATE_Q, 3))
        .when(c_y != "", _g(path, _COMPACT, 3))
        .when(ym_y != "", F.lit("1"))
    ).cast("int")

    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    dim = (
        F.when(m == 2, F.when(leap, 29).otherwise(28))
        .when(m.isin(4, 6, 9, 11), 30)
        .otherwise(31)
    )
    valid = (
        src.isNotNull() & (m >= 1) & (m <= 12) & (d >= 1) & (d <= dim)
    )
    # make_date only ever sees validated components (CASE branches are
    # lazily evaluated), so ANSI mode cannot throw here.
    pub = F.when(valid, F.make_date(y, m, d))
    age = F.datediff(F.lit(ref_date).cast("date"), pub)
    band = (
        F.when(age < 0, F.lit("future"))
        .when(age <= 30, F.lit("30d"))
        .when(age <= 365, F.lit("1y"))
        .when(age <= 1825, F.lit("5y"))
        .when(age.isNotNull(), F.lit("older"))
    )
    return df.select(
        "*",
        F.when(valid, src).alias("date_src"),
        F.date_format(pub, "yyyy-MM-dd").alias("pub_date"),
        age.cast("int").alias("age_days"),
        band.alias("fresh_band"),
    )
