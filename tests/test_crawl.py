"""Crawl-snapshot diff + incremental-extract selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from htmlcleanup_spark.operators.crawl import changed_pages, crawl_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_crawl_diff_statuses(spark):
    old = _snap(spark, [("a", "1"), ("b", "2"), ("c", "3")])
    new = _snap(spark, [("b", "2"), ("c", "CHANGED"), ("d", "4")])
    got = {r["url"]: r["status"] for r in crawl_diff(old, new).collect()}
    assert got == {
        "a": "removed",
        "b": "unchanged",
        "c": "changed",
        "d": "added",
    }


def test_crawl_diff_digest_column_passthrough(spark):
    old = spark.createDataFrame([("a", "h1")], "url string, dg string")
    new = spark.createDataFrame([("a", "h2")], "url string, dg string")
    got = crawl_diff(old, new, digest_col="dg").collect()
    assert got[0]["status"] == "changed"
    assert (got[0]["old_digest"], got[0]["new_digest"]) == ("h1", "h2")


def test_changed_pages_selects_added_and_changed(spark):
    old = _snap(spark, [("a", "1"), ("c", "3")])
    new = _snap(spark, [("a", "1"), ("c", "X"), ("d", "4")])
    diff = crawl_diff(old, new)
    got = {r["url"] for r in changed_pages(new, diff).collect()}
    assert got == {"c", "d"}


def test_diff_shuffles_digests_not_bodies(spark):
    """The exchange moves (key, digest) projections — the text column must
    be pruned out before the join."""
    old = _snap(spark, [("a", "x" * 1000)])
    new = _snap(spark, [("a", "y" * 1000)])
    plan = crawl_diff(old, new)._jdf.queryExecution().optimizedPlan().toString()
    # text appears only inside md5() projections, never as a join output
    assert "md5(" in plan
    for line in plan.splitlines():
        if "Join" in line:
            assert "text" not in line


def test_crawl_frontier(spark):
    from htmlcleanup_spark.operators.crawl import crawl_frontier

    outlinks = spark.createDataFrame(
        [("u1", "a"), ("u2", "a"), ("u3", "b"), ("u1", "b"), ("u1", "c")],
        "src string, url string",
    ).select("url")
    crawled = spark.createDataFrame([("a",), ("x",)], "url string")
    got = {r["url"]: r["n_inlinks"]
           for r in crawl_frontier(outlinks, crawled).collect()}
    assert got == {"b": 2, "c": 1}


def test_crawl_diff_on_bucketed_snapshots_no_exchange(spark, tmp_path):
    """Snapshot tables bucketed by url diff with ZERO Exchange nodes —
    the incremental-recrawl plan at 10^12 rows reads co-located buckets
    (broadcast disabled so the test can't pass via a broadcast plan)."""
    from htmlcleanup_spark.sources.pages import write_bucketed

    rows_old = [("u%d" % i, "text %d" % i) for i in range(40)]
    rows_new = [("u%d" % i, "text %d" % (i if i % 3 else -i))
                for i in range(1, 44)]
    old = spark.createDataFrame(rows_old, "url string, text string")
    new = spark.createDataFrame(rows_new, "url string, text string")
    write_bucketed(old, "t_snap_old", str(tmp_path / "so"), buckets=4)
    write_bucketed(new, "t_snap_new", str(tmp_path / "sn"), buckets=4)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        diff = crawl_diff(spark.table("t_snap_old"), spark.table("t_snap_new"))
        plan = diff._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        got = {r["status"] for r in diff.collect()}
        assert got == {"added", "removed", "changed", "unchanged"}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql("DROP TABLE IF EXISTS t_snap_old")
        spark.sql("DROP TABLE IF EXISTS t_snap_new")


def test_pack_sequences_boundaries(spark):
    """Concatenate-then-chunk: seq/offset from the running token sum;
    per-shard packing restarts the stream."""
    from pyspark.sql import functions as F

    from htmlcleanup_spark.operators.sample import pack_sequences

    df = spark.createDataFrame(
        [(i, " ".join(["w"] * (3 + i))) for i in range(6)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pack_sequences(df, seq_len=10).collect()}
    # cum prefix: 0,3,7,12,19,25
    assert [(out[i].seq_id, out[i].offset) for i in range(6)] == [
        (0, 0), (0, 3), (0, 7), (1, 2), (1, 8), (2, 5)
    ]

    sharded = pack_sequences(
        df.withColumn("shard", F.col("doc_id") % 2),
        seq_len=10, shard_col="shard",
    )
    s = {(r.shard, r.doc_id): (r.seq_id, r.offset)
         for r in sharded.collect()}
    # shard 0: docs 0,2,4 (3,5,7 toks) -> cums 0,3,8
    assert s[(0, 0)] == (0, 0) and s[(0, 2)] == (0, 3)
    assert s[(0, 4)] == (0, 8)


def test_mixture_sample_exact_proportions(spark):
    from htmlcleanup_spark.operators.sample import mixture_sample

    df = spark.createDataFrame(
        [(i, "a" if i < 60 else ("b" if i < 90 else "c"))
         for i in range(100)],
        "doc_id long, source string",
    )
    # n = 60/30/10; weights .5/.3/.2 -> T = min(120, 100, 50) = 50
    out = mixture_sample(df, {"a": 0.5, "b": 0.3, "c": 0.2})
    got = {r["source"]: 0 for r in out.collect()}
    for r in out.collect():
        got[r["source"]] += 1
    assert got == {"a": 25, "b": 15, "c": 10}
    # deterministic: same rows on re-run
    again = {(r.doc_id) for r in
             mixture_sample(df, {"a": 0.5, "b": 0.3, "c": 0.2}).collect()}
    assert again == {r.doc_id for r in out.collect()}


def test_robots_txt_parse_and_longest_match(spark):
    """Grouped UA parsing, longest-match, allow-on-tie, no-match-allows,
    case-insensitive directives."""
    from htmlcleanup_spark.operators.crawl import (
        parse_robots_rules, robots_allowed,
    )

    robots = spark.createDataFrame(
        [
            ("a.com",
             "User-agent: bot\nDisallow: /\n"
             "USER-AGENT: *\ndisallow: /priv\nAllow: /priv/pub\n"
             "Disallow: /tie\nallow: /tie"),   # equal length -> allow
            ("b.com", "User-agent: googlebot\nDisallow: /"),
        ],
        "host string, robots_txt string",
    )
    rules = parse_robots_rules(robots)
    got = {(r.host, r.prefix, r.is_allow) for r in rules.collect()}
    # only the '*' group of a.com survives; b.com has no '*' group
    assert got == {("a.com", "/priv", False),
                   ("a.com", "/priv/pub", True),
                   ("a.com", "/tie", False),
                   ("a.com", "/tie", True)}

    pages = spark.createDataFrame(
        [("a.com", "/priv/x"), ("a.com", "/priv/pub/y"),
         ("a.com", "/tie"), ("a.com", "/open"),
         ("b.com", "/anything")],
        "host string, path string",
    )
    out = {(r.host, r.path): r.allowed
           for r in robots_allowed(pages, rules).collect()}
    assert out[("a.com", "/priv/x")] is False       # blocked prefix
    assert out[("a.com", "/priv/pub/y")] is True    # longer allow wins
    assert out[("a.com", "/tie")] is True           # tie -> allow
    assert out[("a.com", "/open")] is True          # no rule matches
    assert out[("b.com", "/anything")] is True      # no '*' group
