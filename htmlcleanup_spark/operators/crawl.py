"""Crawl-snapshot diffing (incremental recrawl processing).

At 100 TB you never reprocess a whole crawl: successive snapshots overlap
~90%+, so the unit of work is the DELTA — pages that appeared, vanished,
or changed content between snapshot N-1 and N.  ``crawl_diff`` computes
that delta as ONE full-outer join on the page key; ``changed_pages``
restricts it to the rows an incremental extract actually has to touch
(added + changed), which then feeds plans/extract unchanged.

Scale notes: the join shuffles both snapshots on the key unless they are
bucketed — write snapshots with the bucketed layout from sources/pages
(``write_pages_bucketed``) and the diff runs with ZERO exchanges (the
same zero-Exchange property tests/test_plans.py gates for the join path).
Content comparison is by digest (md5 here, the repo-wide portable-hash
convention), never by comparing page bodies across the shuffle — the
diff moves 2 small columns per row, not the corpus bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crawl_diff(old: DataFrame, new: DataFrame, key_col: str = "url",
               digest_col: str | None = None,
               text_col: str = "text") -> DataFrame:
    """(key, status, old_digest, new_digest) with status in
    {'added', 'removed', 'changed', 'unchanged'}.

    ``digest_col`` names a precomputed content digest; when absent the
    digest is md5(text) computed map-side BEFORE the join, so only
    (key, 32-char digest) ever shuffles.
    """
    def prep(df: DataFrame, out: str) -> DataFrame:
        if digest_col is not None:
            d = F.col(digest_col)
        else:
            d = F.md5(F.col(text_col))
        return df.select(F.col(key_col).alias("_k"), d.alias(out))

    o = prep(old, "old_digest")
    n = prep(new, "new_digest")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") == F.col("new_digest"),
              F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(n, "_k", "full_outer").select(
        F.col("_k").alias(key_col),
        status.alias("status"),
        "old_digest",
        "new_digest",
    )


def changed_pages(new: DataFrame, diff: DataFrame,
                  key_col: str = "url") -> DataFrame:
    """The rows of snapshot N an incremental extract must process: pages
    whose status is added or changed.  A semi-join on the key — the page
    bodies stay on their side; at scale broadcast the (usually small)
    delta keys."""
    delta = diff.filter(F.col("status").isin("added", "changed")).select(
        key_col
    )
    return new.join(delta, key_col, "left_semi")


def crawl_frontier(outlinks: DataFrame, crawled: DataFrame,
                   url_col: str = "url") -> DataFrame:
    """The next crawl frontier: distinct outlink targets not yet crawled,
    with their inlink count as a crawl-priority signal (more inlinks =
    crawl sooner — the classic frontier ordering).

    Plan: ONE partially-combined shuffle on the target url (distinct +
    count fused into a single groupBy), then an anti-join against the
    crawled set — AQE broadcasts the smaller side; at web scale the
    crawled set is the big side, so the frontier (post-aggregation, one
    row per NEW url) is the one that moves."""
    return (
        outlinks.groupBy(F.col("url"))
        .agg(F.count("*").alias("n_inlinks"))
        .join(
            crawled.select(F.col(url_col).alias("url")),
            "url",
            "left_anti",
        )
    )
