"""Unigram-LM perplexity scoring + bucketing + domain caps."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from htmlcleanup_spark.operators.lm import (
    perplexity,
    ppl_buckets,
    unigram_model,
)
from htmlcleanup_spark.operators.sample import domain_caps


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )


def test_unigram_model_counts(spark):
    df = _mkdocs(spark, ["a b a", "b c"])
    got = {r["word"]: r["cnt"] for r in unigram_model(df).collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


def test_unigram_model_vocab_cap_deterministic(spark):
    df = _mkdocs(spark, ["a b a", "b c"])
    got = {r["word"] for r in unigram_model(df, vocab_size=2).collect()}
    assert got == {"a", "b"}  # ties (cnt 2) before c (cnt 1); a < b


def test_perplexity_hand_computed(spark):
    df = _mkdocs(spark, ["a a b", "c"])
    # model: a=2, b=1, c=1; T=4, V=3 -> denom 8
    p = {"a": 3 / 8, "b": 2 / 8, "c": 2 / 8}
    want = {
        0: math.floor(
            -(2 * math.log(p["a"]) + math.log(p["b"])) / 3 * 1e6
        ),
        1: math.floor(-math.log(p["c"]) * 1e6),
    }
    got = {r["doc_id"]: r["nll_e6"] for r in perplexity(df).collect()}
    assert got == want


def test_perplexity_rare_words_score_higher(spark):
    common = "the quick brown fox " * 10
    df = _mkdocs(spark, [common.strip()] * 8 + ["zyx wvu tsr qpo"])
    got = {r["doc_id"]: r["nll_e6"] for r in perplexity(df).collect()}
    assert got[8] > got[0]


def test_perplexity_oov_floor_with_external_model(spark):
    train = _mkdocs(spark, ["a a a a"])
    model = unigram_model(train)
    score = _mkdocs(spark, ["a", "zzz"])
    got = {r["doc_id"]: r["nll_e6"] for r in perplexity(
        score, model=model
    ).collect()}
    # a: -ln(5/6); zzz OOV: -ln(1/6)
    assert got[0] == math.floor(-math.log(5 / 6) * 1e6)
    assert got[1] == math.floor(-math.log(1 / 6) * 1e6)


def test_ppl_buckets_ntile_and_thresholds(spark):
    scored = spark.createDataFrame(
        [(i, i * 100) for i in range(9)], "doc_id bigint, nll_e6 long"
    )
    nt = {r["doc_id"]: r["ppl_bucket"]
          for r in ppl_buckets(scored, 3).collect()}
    assert nt == {i: i // 3 + 1 for i in range(9)}
    th = {r["doc_id"]: r["ppl_bucket"]
          for r in ppl_buckets(scored, thresholds=[250, 550]).collect()}
    assert th == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 2, 6: 3, 7: 3, 8: 3}


def test_domain_caps(spark):
    rows = [
        (i, "h%d" % (i % 3), 1000 - i) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, host string, n_chars int")
    kept = domain_caps(df, cap=2).collect()
    assert len(kept) == 6
    by_host = {}
    for r in kept:
        by_host.setdefault(r["host"], []).append(r)
    for h, rs in by_host.items():
        assert len(rs) == 2
        assert {r["host_rank"] for r in rs} == {1, 2}
        # highest n_chars in the host == lowest doc_id (n_chars = 1000 - i)
        best = min(i for i in range(30) if "h%d" % (i % 3) == h)
        assert min(r["doc_id"] for r in rs) == best


def test_domain_caps_tie_break_on_id(spark):
    df = spark.createDataFrame(
        [(3, "h", 5), (1, "h", 5), (2, "h", 5)],
        "doc_id bigint, host string, n_chars int",
    )
    kept = sorted(
        (r["doc_id"], r["host_rank"]) for r in domain_caps(df, cap=2).collect()
    )
    assert kept == [(1, 1), (2, 2)]


def test_perplexity_plan_shape(spark):
    """Scale contract: the model join is a broadcast-HASH join and the
    only hash shuffle in the scoring plan is the per-doc aggregation —
    the vocabulary shuffle lives inside the pinned model, computed once
    for both its consumers (totals + broadcast).  The NTILE
    SinglePartition exchange is the documented test-scale bucketing path
    — thresholds replace it at corpus scale."""
    import re

    df = spark.createDataFrame(
        [(i, "a b c w%d" % (i % 5)) for i in range(50)],
        "doc_id bigint, text string",
    )
    plan = ppl_buckets(perplexity(df))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_domain_caps_single_shuffle(spark):
    import re

    df = spark.createDataFrame(
        [(i, "h%d" % (i % 3), i) for i in range(30)],
        "doc_id bigint, host string, n_chars int",
    )
    plan = domain_caps(df)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_token_budget_sample(spark):
    from htmlcleanup_spark.operators.sample import token_budget_sample

    # priority = doc_id here (higher id = higher priority), 5 tokens each
    df = spark.createDataFrame(
        [(i, "w " * 4 + "w", i) for i in range(10)],
        "doc_id bigint, text string, prio int",
    )
    kept = token_budget_sample(df, 17, priority_col="prio").collect()
    # best-first: docs 9, 8, 7 (15 tokens); doc 6 would hit 20 > 17
    assert sorted(r["doc_id"] for r in kept) == [7, 8, 9]
    assert {r["n_tokens"] for r in kept} == {5}
    assert max(r["cum_tokens"] for r in kept) == 15


def test_token_budget_sample_tie_break_and_exact_fit(spark):
    from htmlcleanup_spark.operators.sample import token_budget_sample

    df = spark.createDataFrame(
        [(3, "a b"), (1, "c d"), (2, "e f")],
        "doc_id bigint, text string",
    ).withColumn("p", F.lit(1))
    kept = token_budget_sample(df, 4, priority_col="p").collect()
    # equal priority -> id ASC: docs 1, 2 fill exactly 4 tokens
    assert sorted(r["doc_id"] for r in kept) == [1, 2]


def test_bigram_perplexity_orders_predictability(spark):
    """A doc made of the corpus's dominant bigram chain scores lower
    nll than a doc of rare transitions; single-word docs yield no row."""
    from htmlcleanup_spark.operators.lm import bigram_perplexity

    base = [(i, "the cat sat on the mat") for i in range(10)]
    docs = base + [
        (100, "the cat sat"),        # dominant transitions -> low nll
        (101, "mat the on sat"),     # rare transitions -> higher nll
        (102, "single"),             # no bigrams -> absent
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r.nll_e6 for r in bigram_perplexity(df).collect()}
    assert 102 not in out
    assert out[100] < out[101]
    assert all(v > 0 for v in out.values())


def test_stupid_backoff_branches_hand_computed(spark):
    import math

    from htmlcleanup_spark.operators.lm import stupid_backoff_nll

    model = spark.createDataFrame(
        [(0, "a b c a b d")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(1, "a b c"),    # trigram hit: n(a,b,c)=1 / n(a,b)=2
         (2, "b c q"),    # q is OOV -> add-one unigram floor
         (3, "x b c")],   # backoff: 0.4 * n(b,c)=1 / n(b)=2
        "doc_id long, text string")
    out = {r.doc_id: r.nll_e6
           for r in stupid_backoff_nll(score, model_df=model).collect()}
    a2 = 0.4 * 0.4
    exp = {
        1: math.floor(-math.log(1.0 / 2) * 1e6),
        2: math.floor(-math.log(a2 * ((0 + 1.0) / (6.0 + 4.0 + 1.0)))
                      * 1e6),
        3: math.floor(-math.log(0.4 * (1.0 / 2)) * 1e6),
    }
    assert out == exp


def test_stupid_backoff_short_docs_yield_no_row(spark):
    from htmlcleanup_spark.operators.lm import stupid_backoff_nll

    df = spark.createDataFrame(
        [(1, "only two"), (2, "a b c")], "doc_id long, text string")
    assert [r.doc_id for r in stupid_backoff_nll(df).collect()] == [2]


def test_ppl_buckets_by_lang_ntile(spark):
    from htmlcleanup_spark.operators.lm import ppl_buckets_by_lang

    df = spark.createDataFrame(
        [(i, "en" if i < 6 else "fr", i * 100) for i in range(9)],
        "doc_id long, lang string, nll_e6 long",
    )
    out = {r.doc_id: r.ppl_bucket
           for r in ppl_buckets_by_lang(df, 3).collect()}
    # en: 6 docs -> 2 per bucket; fr: 3 docs -> 1 per bucket
    assert [out[i] for i in range(6)] == [1, 1, 2, 2, 3, 3]
    assert [out[i] for i in range(6, 9)] == [1, 2, 3]


def test_ppl_buckets_by_lang_thresholds_no_window(spark):
    from htmlcleanup_spark.operators.lm import ppl_buckets_by_lang

    df = spark.createDataFrame(
        [(0, "en", 50), (1, "en", 150), (2, "en", 250),
         (3, "xx", 999)],
        "doc_id long, lang string, nll_e6 long",
    )
    out = ppl_buckets_by_lang(
        df, 3, thresholds={"en": [100, 200]})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan          # corpus path: join + expr only
    got = {r.doc_id: r.ppl_bucket for r in out.collect()}
    assert got == {0: 1, 1: 2, 2: 3, 3: 1}   # unknown lang -> head
