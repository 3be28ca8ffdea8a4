"""Robots-meta directive + canonical-link extraction."""
from pyspark.sql import functions as F


def test_robots_directives_and_canonical(spark):
    from htmlcleanup_spark.functions.robots import with_robots_flags

    rows = [
        (0, '<head><meta name="robots" content="noindex, nofollow">'
            '</head>'),
        (1, "<head><meta name=robots content='NOINDEX'></head>"),
        (2, '<head><meta name="robots" content="none"></head>'),
        (3, '<head><meta name="robots" content="index, follow"></head>'),
        (4, '<head><meta name="description" content="noindex"></head>'),
        (5, '<head><LINK REL=canonical HREF="https://x.com/a"></head>'),
        (6, '<head>no tags at all</head>'),
        # noindexfoo must NOT match the noindex token
        (7, '<head><meta name="robots" content="noindexfoo"></head>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = {r.doc_id: r for r in with_robots_flags(df).collect()}

    assert out[0].noindex and out[0].nofollow
    assert out[1].noindex and not out[1].nofollow   # single directive
    assert out[2].noindex and out[2].nofollow       # none == both
    assert not out[3].noindex and not out[3].nofollow
    assert not out[4].noindex                       # wrong meta name
    assert out[5].canonical == "https://x.com/a"    # case + bare attrs
    assert out[6].canonical == "" and not out[6].noindex
    assert not out[7].noindex                       # token boundaries


def test_canonical_collapse_groups_and_survivor(spark):
    from htmlcleanup_spark.functions.robots import canonical_collapse

    mk = ('<html><head><link rel="canonical" href="%s"></head></html>')
    rows = [
        # group c1: canonical page itself + 2 mirrors -> survivor = c1
        ("https://s.com/c1", mk % "https://s.com/c1"),
        ("https://m1.com/x", mk % "https://s.com/c1"),
        ("https://m2.com/y", mk % "https://s.com/c1"),
        # group c2: mirrors only -> smallest url survives
        ("https://zz.com/b", mk % "https://s.com/c2"),
        ("https://aa.com/a", mk % "https://s.com/c2"),
        # no canonical: own group
        ("https://solo.com/p", "<html><head></head></html>"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = {r.canonical_key: r for r in canonical_collapse(df).collect()}

    assert out["https://s.com/c1"].url == "https://s.com/c1"
    assert out["https://s.com/c1"].n_folded == 3
    assert out["https://s.com/c2"].url == "https://aa.com/a"
    assert out["https://s.com/c2"].n_folded == 2
    assert out["https://solo.com/p"].n_folded == 1


def test_robots_multiple_meta_most_restrictive(spark):
    """Pages with several robots meta tags: a later noindex/nofollow
    must not be ignored (most-restrictive-wins, per the published
    Google/Bing semantics)."""
    from htmlcleanup_spark.functions.robots import with_robots_flags

    df = spark.createDataFrame(
        [
            (0, '<head><meta name="robots" content="index, follow">'
                '<meta name="robots" content="noindex"></head>'),
            (1, '<head><meta name="robots" content="nofollow">'
                '<meta name="robots" content="index"></head>'),
            (2, '<head><meta name="robots" content="all">'
                '<meta name="robots" content="all"></head>'),
        ],
        "doc_id long, html string",
    )
    out = {r.doc_id: r for r in with_robots_flags(df).collect()}
    assert out[0].noindex is True and out[0].nofollow is False
    assert out[1].nofollow is True and out[1].noindex is False
    assert out[2].noindex is False and out[2].nofollow is False
