"""Round-5 corpus-preparation operators: C4 filter, sentence split,
hashed quality scorer, deterministic shuffle, BPE pair counts."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def test_c4_filter_line_and_page_rules(spark):
    from htmlcleanup_spark.operators.corpus import c4_filter

    good = ("This is a perfectly fine sentence one.\n"
            "Here is another good long sentence two!\n"
            "And a third complete sentence right here?")
    df = spark.createDataFrame(
        [
            (0, good),
            (1, "short line.\n" + good),            # <5-word line dropped
            (2, "no terminal punctuation here at all\n" + good),
            (3, good.replace("another good", "javascript powered")),
            (4, good + "\nfunction f() { return 1; }"),   # curly brace
            (5, good + "\nsome Lorem Ipsum filler text."),
            (6, "One good long sentence stands alone here."),  # <3 sents
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in c4_filter(df).collect()}
    assert out[0].keep is True and out[0].n_lines_kept == 3
    assert out[0].n_sentences == 3
    # line filters drop the bad line but the page survives
    assert out[1].keep is True and out[1].n_lines_kept == 3
    assert "short line" not in out[1].clean_text
    assert out[2].keep is True and out[2].n_lines_kept == 3
    # the javascript line is dropped -> only 2 sentences -> page dropped
    assert out[3].n_lines_kept == 2 and out[3].keep is False
    assert out[4].keep is False         # '{' page rule
    assert out[5].keep is False         # lorem ipsum page rule
    assert out[6].keep is False and out[6].n_lines_kept == 1


def test_sentence_split_positions(spark):
    from htmlcleanup_spark.operators.corpus import sentence_split

    df = spark.createDataFrame(
        [(0, "First one. Second two!  Third three? trailing bit")],
        "doc_id long, text string",
    )
    got = [(r.sent_id, r.sentence)
           for r in sentence_split(df).orderBy("sent_id").collect()]
    assert got == [
        (0, "First one."),
        (1, "Second two!"),
        (2, "Third three?"),
        (3, "trailing bit"),
    ]


def test_quality_classifier_matches_python_replica(spark):
    from htmlcleanup_spark.operators.corpus import quality_classifier

    def _hx(s, n):
        return int(hashlib.md5(s.encode()).hexdigest()[:n], 16)

    def score(text):
        total = 0
        for w in text.split(" "):
            idx = _hx("q1:" + w, 15) % 1024
            h = _hx("qw:%d" % idx, 8)
            import math
            total += math.floor((h / 4294967296.0 * 2.0 - 1.0) * 1e6)
        return total

    rows = [(0, "the quick brown fox"), (1, "a a a"), (2, "singleton")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in quality_classifier(df).collect()}
    for i, text in rows:
        assert out[i].score_e6 == score(text), i
        assert out[i].n_terms == len(text.split(" "))


def test_deterministic_shuffle_is_a_permutation(spark):
    from htmlcleanup_spark.operators.corpus import deterministic_shuffle

    df = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    out = deterministic_shuffle(df, seed="e1", n_shards=16).collect()
    assert len(out) == 200
    assert len({(r.shard, r.pos) for r in out}) == 200   # injective
    # per-shard positions are 1..n_shard dense
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # reproducible; different seed -> different order
    again = deterministic_shuffle(df, seed="e1", n_shards=16).collect()
    assert {(r.doc_id, r.shard, r.pos) for r in again} == {
        (r.doc_id, r.shard, r.pos) for r in out
    }
    other = deterministic_shuffle(df, seed="e2", n_shards=16).collect()
    assert {(r.doc_id, r.shard, r.pos) for r in other} != {
        (r.doc_id, r.shard, r.pos) for r in out
    }


def test_deterministic_shuffle_window_is_shard_keyed(spark):
    from htmlcleanup_spark.operators.corpus import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    plan = (
        deterministic_shuffle(df)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "SinglePartition" not in plan, plan


def test_bpe_pair_counts(spark):
    from htmlcleanup_spark.operators.corpus import bpe_pair_counts

    df = spark.createDataFrame(
        [(0, "aaab aab"), (1, "ab b")], "doc_id long, text string"
    )
    got = {r.pair: r.cnt for r in bpe_pair_counts(df, top_k=10).collect()}
    # pairs: aaab -> aa,aa,ab ; aab -> aa,ab ; ab -> ab ; b -> (len<2)
    assert got == {"aa": 3, "ab": 3}
    top = bpe_pair_counts(df, top_k=1).collect()
    assert [(r.pair, r.cnt) for r in top] == [("aa", 3)]  # tie -> pair asc


def test_learn_bpe_hand_computed_merges(spark):
    from htmlcleanup_spark.operators.corpus import learn_bpe

    # vocabulary: aaab x2, ab x1.  Weighted pair counts per round:
    #   r0: (a,a)=4 (two slots in each aaab), (a,b)=3  -> merge aa
    #   r1: (a,b)=3 (aaab is now [aa,a,b]; ab is [a,b]) -> merge ab
    #   r2: (aa,ab)=2                                   -> merge aaab
    df = spark.createDataFrame([("aaab aaab ab",)], "text string")
    got = [(r.step, r.l, r.r, r.merged, r.pair_count)
           for r in learn_bpe(df, n_merges=3).orderBy("step").collect()]
    assert got == [
        (0, "a", "a", "aa", 4),
        (1, "a", "b", "ab", 3),
        (2, "aa", "ab", "aaab", 2),
    ]


def test_learn_bpe_stops_when_no_pairs_remain_and_filters_tokens(spark):
    from htmlcleanup_spark.operators.corpus import learn_bpe

    # 'XY9' fails ^[a-z]+$ and must not contribute pairs; after the
    # single possible merge the vocabulary is all 1-symbol words, so
    # the loop stops early regardless of n_merges
    df = spark.createDataFrame([("ab XY9 ab",)], "text string")
    got = learn_bpe(df, n_merges=5).collect()
    assert [(r.step, r.merged, r.pair_count) for r in got] == [(0, "ab", 2)]


def test_learn_bpe_greedy_leftmost_overlap(spark):
    from htmlcleanup_spark.operators.corpus import learn_bpe

    # 'aaa': two (a,a) slots but only ONE merge applies (greedy
    # leftmost, non-overlapping) -> round 1 sees [aa, a], not [a, aa]
    df = spark.createDataFrame([("aaa",)], "text string")
    got = [(r.step, r.l, r.r, r.pair_count)
           for r in learn_bpe(df, n_merges=2).orderBy("step").collect()]
    assert got == [(0, "a", "a", 2), (1, "aa", "a", 1)]


def test_apply_bpe_uses_rules_in_step_order(spark):
    from htmlcleanup_spark.operators.corpus import apply_bpe

    # rule 1 ('aa'+'b') only fires because rule 0 created 'aa' first
    df = spark.createDataFrame([("aab aab cab",)], "text string")
    out = {r.w: r for r in
           apply_bpe(df, [("a", "a"), ("aa", "b")]).collect()}
    assert out["aab"].pieces == "aab" and out["aab"].n_pieces == 1
    assert out["aab"].cnt == 2
    assert out["cab"].pieces == "c a b" and out["cab"].n_pieces == 3


def test_badwords_filter_whole_token_only(spark):
    from htmlcleanup_spark.operators.corpus import badwords_filter

    df = spark.createDataFrame(
        [(1, "a classic sextet essex text"),   # substrings never match
         (2, "watch PORN now"),                # case-insensitive token
         (3, "xxx casino xxx")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in badwords_filter(df).collect()}
    assert (out[1].n_flagged, out[1].keep) == (0, True)
    assert (out[2].n_flagged, out[2].keep) == (1, False)
    assert out[3].n_flagged == 3
    assert out[3].flagged_frac_e6 == 1000000
