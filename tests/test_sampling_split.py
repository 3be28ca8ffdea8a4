"""holdout_split (leakage-safe group splits), unimax_sample (UniMax
water-filling), cross_corpus_lsh_pairs (two-corpus fuzzy join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows, schema="doc_id long, host string"):
    return spark.createDataFrame(rows, schema)


def test_holdout_split_is_group_consistent(spark):
    from htmlcleanup_spark.operators.sample import holdout_split

    df = _docs(spark, [(i, "h%d" % (i % 7)) for i in range(140)])
    out = holdout_split(
        df, {"train": 0.8, "valid": 0.1, "test": 0.1}, group_col="host"
    )
    per_host = (
        out.groupBy("host")
        .agg(F.countDistinct("split").alias("k"))
        .collect()
    )
    assert all(r.k == 1 for r in per_host)  # never straddles a host
    assert set(r.split for r in out.collect()) <= {"train", "valid",
                                                   "test"}


def test_holdout_split_deterministic_and_salted(spark):
    from htmlcleanup_spark.operators.sample import holdout_split

    df = _docs(spark, [(i, "host%d" % i) for i in range(64)])
    fr = {"train": 0.5, "test": 0.5}
    a = {r.host: r.split
         for r in holdout_split(df, fr, group_col="host").collect()}
    b = {r.host: r.split
         for r in holdout_split(df, fr, group_col="host").collect()}
    assert a == b  # seedless determinism
    c = {r.host: r.split
         for r in holdout_split(df, fr, group_col="host",
                                salt="v2").collect()}
    assert a != c  # new salt redraws
    # both split names actually occur at this group count
    assert set(a.values()) == {"train", "test"}


def test_holdout_split_validates_fractions(spark):
    from htmlcleanup_spark.operators.sample import holdout_split

    df = _docs(spark, [(1, "h")])
    with pytest.raises(ValueError):
        holdout_split(df, {"train": 0.5, "test": 0.4}, group_col="host")
    with pytest.raises(ValueError):
        holdout_split(df, {}, group_col="host")


def test_unimax_water_filling_exact_allocation(spark):
    from htmlcleanup_spark.operators.sample import unimax_sample

    rows = (
        [(i, "aa") for i in range(2)]
        + [(100 + i, "bb") for i in range(3)]
        + [(200 + i, "cc") for i in range(10)]
    )
    df = _docs(spark, rows, "doc_id long, lang string")
    # ascending: aa(2) bb(3) cc(10); U=9 L=3:
    #   aa min(2, 9//3=3)=2 -> U=7;  bb min(3, 7//2=3)=3 -> U=4
    #   cc min(10, 4//1)=4                       => {aa:2, bb:3, cc:4}
    out = unimax_sample(df, total_budget=9, epoch_cap=1.0)
    got = {r.lang: r.cnt for r in
           out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert got == {"aa": 2, "bb": 3, "cc": 4}


def test_unimax_epoch_cap_binds(spark):
    from htmlcleanup_spark.operators.sample import unimax_sample

    rows = [(i, "aa") for i in range(4)] + [(10 + i, "bb")
                                            for i in range(4)]
    df = _docs(spark, rows, "doc_id long, lang string")
    # cap 0.5 epochs: each language tops out at floor(0.5*4)=2 even
    # though the budget (100) never binds
    out = unimax_sample(df, total_budget=100, epoch_cap=0.5)
    got = {r.lang: r.cnt for r in
           out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert got == {"aa": 2, "bb": 2}


def test_unimax_zero_budget_and_group_guard(spark):
    from htmlcleanup_spark.operators.sample import unimax_sample

    df = _docs(spark, [(i, "l%d" % i) for i in range(8)],
               "doc_id long, lang string")
    assert unimax_sample(df, total_budget=0).count() == 0
    with pytest.raises(ValueError):
        unimax_sample(df, total_budget=4, max_groups=3)


def test_unimax_selection_is_md5_smallest(spark):
    from htmlcleanup_spark.operators.sample import unimax_sample
    import hashlib

    ids = list(range(20))
    df = _docs(spark, [(i, "en") for i in ids],
               "doc_id long, lang string")
    out = unimax_sample(df, total_budget=5, epoch_cap=1.0)
    got = sorted(r.doc_id for r in out.collect())
    want = sorted(sorted(
        ids, key=lambda i: (hashlib.md5(
            ("unimax:%d" % i).encode()).hexdigest(), i)
    )[:5])
    assert got == want


def test_cross_corpus_lsh_finds_planted_twin(spark):
    from htmlcleanup_spark.operators.dedup import cross_corpus_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    a = spark.createDataFrame(
        [(1, base), (2, "completely unrelated text about spark plans "
                        "and shuffle boundaries for testing")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(10, base), (11, "another distinct document mentioning "
                          "watermarks and streaming state stores")],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b)
             for r in cross_corpus_lsh_pairs(a, b).collect()}
    assert (1, 10) in pairs
    # never within-corpus, never the unrelated cross pair by accident
    assert all(x in (1, 2) and y in (10, 11) for x, y in pairs)
    assert (2, 11) not in pairs


def test_cross_corpus_matches_self_join_cross_subset(spark):
    """Property: A-vs-B candidates == the cross-parity subset of the
    self-join candidates over A union B (band keys are corpus-
    independent)."""
    from htmlcleanup_spark.operators.dedup import (
        cross_corpus_lsh_pairs,
        minhash_lsh_pairs,
    )

    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    rows = []
    for i in range(24):
        toks = [words[(i + j) % len(words)] for j in range(6)]
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = df.filter(F.col("doc_id") % 2 == 0)
    b = df.filter(F.col("doc_id") % 2 == 1)
    got = {(r.id_a, r.id_b)
           for r in cross_corpus_lsh_pairs(a, b).collect()}
    allp = {(r.id_a, r.id_b)
            for r in minhash_lsh_pairs(df).collect()}
    want = set()
    for x, y in allp:
        if x % 2 == 0 and y % 2 == 1:
            want.add((x, y))
        elif y % 2 == 0 and x % 2 == 1:
            want.add((y, x))
    assert got == want
