"""Text-analysis functions: real-sentence quality gates for the language
heuristic (the corpus oracle checks exactness; this checks it is *useful*
on genuine text in each supported language)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

pytestmark = pytest.mark.spark

# one genuinely representative sentence per language (public phrasebook
# material), plus an unidentifiable token soup
_SENTENCES = [
    ("en", "the cat sat on the mat and it was not at all pleased with this"),
    ("de", "der hund lief mit dem ball zu dem kind und das war auch gut"),
    ("fr", "le chat est dans la maison avec les enfants et nous sommes pour"),
    ("nl", "de kat zit op het dak en ze gaat niet met de hond naar huis"),
    ("und", "lorem zorbal quux flibber graxo polytope"),
]


def test_lang_id_real_sentences(spark):
    from htmlcleanup_spark.functions.text import lang_confidence, lang_id

    df = spark.createDataFrame(_SENTENCES, "expected string, text string")
    got = df.select(
        "expected",
        lang_id().alias("pred"),
        lang_confidence().alias("conf"),
    ).collect()
    for r in got:
        assert r.pred == r.expected, (r.expected, r.pred)
        if r.expected == "und":
            assert r.conf == 0.0
        else:
            assert 0.15 <= r.conf <= 1.0, (r.expected, r.conf)


def test_url_normalize_cases(spark):
    from htmlcleanup_spark.functions.url import url_normalize

    cases = [
        # (input, expected)
        ("HTTP://A.COM:80/Path/X?z=1&a=2#f", "http://a.com/Path/X?a=2&z=1"),
        ("https://B.com:443/", "https://b.com/"),
        ("http://a.com:8080/x", "http://a.com:8080/x"),   # non-default kept
        ("http://a.com", "http://a.com"),
        ("http://a.com?", "http://a.com"),                 # empty query dropped
        ("http://a.com/x?b=2&b=1", "http://a.com/x?b=1&b=2"),
        ("ftp://Host.Net/File.TXT", "ftp://host.net/File.TXT"),
        ("no scheme here#frag", "no scheme here"),
        ("https://u.io/p?only=1", "https://u.io/p?only=1"),
    ]
    df = spark.createDataFrame(cases, "url string, expected string")
    bad = df.withColumn("norm", url_normalize("url")).filter(
        "norm != expected"
    )
    assert bad.count() == 0, bad.collect()


def test_chunk_spans_coverage_and_overlap(spark):
    from pyspark.sql import functions as F

    from htmlcleanup_spark.functions.text import chunk_spans

    text = " ".join("w%d" % i for i in range(150))
    df = spark.createDataFrame([(text,), ("short doc",)], "text string")
    rows = (
        df.select(F.split("text", " ").alias("_ws"))
        .select(F.explode(chunk_spans("_ws", 64, 48)).alias("c"))
        .select("c.chunk_id", "c.chunk")
        .collect()
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.chunk[:2], []).append(r)
    # 150 tokens, 64-window / 48-stride: ceil((150-64)/48)+1 = 3 chunks
    long_chunks = sorted(
        (r.chunk_id, r.chunk.split(" ")) for r in rows if len(r.chunk) > 20
    )
    assert len(long_chunks) == 3
    covered = set()
    for _cid, toks in long_chunks:
        covered.update(toks)
    assert covered == {"w%d" % i for i in range(150)}  # no token dropped
    # consecutive chunks overlap by chunk_tokens - stride = 16
    assert long_chunks[0][1][48:] == long_chunks[1][1][:16]
    # short doc: exactly one chunk, the whole doc
    short = [r for r in rows if r.chunk == "short doc"]
    assert len(short) == 1 and short[0].chunk_id == 0


def test_redact_pii_cases(spark):
    from htmlcleanup_spark.functions.text import redact_pii

    cases = [
        ("mail bob.smith+x@corp.example.org now",
         "mail <EMAIL> now"),
        ("server at 192.168.001.1 up", "server at <IP> up"),
        ("call +1 (555) 123-4567 today", "call <PHONE> today"),
        ("call 5551234567", "call <PHONE>"),
        ("v1.2.3 release, room 42", "v1.2.3 release, room 42"),  # untouched
        ("a@b.co and 10.0.0.1 and +12345678",
         "<EMAIL> and <IP> and <PHONE>"),
    ]
    df = spark.createDataFrame(cases, "text string, expected string")
    bad = df.withColumn("got", redact_pii("text")).filter("got != expected")
    assert bad.count() == 0, bad.collect()


def test_lang_confidence_bounds(spark):
    """confidence is hits/tokens in [0, 1] and monotone in marker density."""
    from htmlcleanup_spark.functions.text import lang_confidence

    df = spark.createDataFrame(
        [("the the the the",), ("the big spark table",)], "text string"
    )
    a, b = [r.c for r in df.select(lang_confidence().alias("c")).collect()]
    assert a == 1.0
    assert 0.0 < b < a


def test_quality_signals_values(spark):
    """Hand-computable signal values + keep verdict on crafted docs."""
    from htmlcleanup_spark.functions.text import quality_signals

    docs = [
        # 0: "spam spam ... spam" x 24 — top bigram "spam spam" covers
        # nearly everything, uniq frac 1/24 -> dropped
        (0, " ".join(["spam"] * 24)),
        # 1: 24 distinct 4-char words incl. stopwords -> kept
        (1, " ".join("w%03d" % i for i in range(20)) + " the and of to"),
        # 2: too short -> dropped
        (2, "tiny doc"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r.doc_id: r for r in quality_signals(df).collect()}

    assert rows[0].n_words == 24
    assert rows[0].uniq_word_frac_e6 == int(1 / 24 * 1e6)
    # 23 occurrences of "spam spam" (9 chars) over 119 chars
    assert rows[0].top_bigram_frac_e6 == int(23 * 9 / 119 * 1e6)
    assert not rows[0].keep

    assert rows[1].n_words == 24
    assert rows[1].uniq_word_frac_e6 == 1000000
    assert rows[1].stopword_frac_e6 == int(4 / 24 * 1e6)
    assert rows[1].keep

    assert rows[2].n_words == 2
    assert rows[2].top_bigram_frac_e6 == int(1 * 8 / 8 * 1e6)
    assert not rows[2].keep


def test_source_stats_dup_rate(spark):
    from htmlcleanup_spark.functions.text import source_stats

    df = spark.createDataFrame(
        [
            (0, "a b c", "s0"),
            (1, "a b c", "s0"),   # exact dup within s0
            (2, "d e f", "s0"),
            (3, "g h i", "s1"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r for r in source_stats(df).collect()}
    assert rows["s0"].n_docs == 3 and rows["s0"].n_exact_dups == 1
    assert rows["s1"].n_docs == 1 and rows["s1"].n_exact_dups == 0
    assert rows["s0"].total_tokens == 9


def test_repetition_signals_values(spark):
    """Hand-computable Gopher repetition fractions on crafted docs."""
    from htmlcleanup_spark.functions.text import repetition_signals

    docs = [
        # 0: "a b a b a b" — top2 = 3·3/11, top3 tie-break picks the
        # lexicographically larger "b a b" (2·5/11), top4 = 2·7/11
        # (overlapping chars push it past 1.0 — Gopher's own semantics)
        (0, "a b a b a b"),
        # 1: period-5 word stream — every 5-gram AND the 0/5 10-gram pair
        # repeat, so the dup-coverage union is the whole doc (1.0 each)
        (1, " ".join(["v w x y z"] * 3)),
        # 2: 25 distinct words -> all counts 1, dup coverage 0, kept
        (2, " ".join("w%03d" % i for i in range(25))),
        # 3: one word -> no grams at all, every frac 0, kept
        (3, "tiny"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}

    assert rows[0].top2_frac_e6 == int(3 * 3 / 11 * 1e6)
    assert rows[0].top3_frac_e6 == int(2 * 5 / 11 * 1e6)
    assert rows[0].top4_frac_e6 == int(2 * 7 / 11 * 1e6)
    assert rows[0].dup5_frac_e6 == 0 and not rows[0].keep

    assert rows[1].dup5_frac_e6 == 1000000
    assert rows[1].dup10_frac_e6 == 1000000
    assert not rows[1].keep

    assert rows[2].n_words == 25
    assert rows[2].dup5_frac_e6 == 0 and rows[2].dup10_frac_e6 == 0
    assert rows[2].keep

    assert rows[3].n_words == 1
    assert rows[3].top2_frac_e6 == 0 and rows[3].keep


def test_tfidf_top_terms_values(spark):
    """Rare term outranks common term; smoothed idf; ties break on term."""
    import math
    from htmlcleanup_spark.functions.text import tfidf_top_terms

    docs = [
        (0, "common rare common common"),
        (1, "common common"),
        (2, "common other"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = tfidf_top_terms(df, k=2).collect()
    d0 = sorted([r for r in out if r.doc_id == 0], key=lambda r: r.rank)
    # rare: tf=1, df=1 -> 1 * ln(4/2); common: tf=3, df=3 -> 3 * ln(4/4)=0
    assert d0[0].term == "rare"
    assert d0[0].score_e6 == math.floor(1 * math.log(4 / 2) * 1e6)
    assert d0[1].term == "common" and d0[1].score_e6 == 0


def test_gopher_rules_values(spark):
    """Hand-computable symbol/bullet/ellipsis/alpha/stopword rules."""
    from htmlcleanup_spark.functions.text import gopher_rules

    docs = [
        # 4 lines, 2 bullets, 1 ellipsis-ending; stopwords the+and
        (0, "the cat and dog likes fish\n• item one\n- item two\nread more..."),
        # symbol-heavy, numeric words, no stopwords
        (1, "# # # 12345 67890"),
        # clean prose
        (2, "the quick brown fox and its friends ran to the hill"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r.doc_id: r for r in gopher_rules(df).collect()}

    assert rows[0].bullet_frac_e6 == int(2 / 4 * 1e6)
    assert rows[0].ellipsis_frac_e6 == int(1 / 4 * 1e6)
    assert rows[0].n_stopwords == 2
    # 11 space-split words (newlines stay inside words); one '...'
    assert rows[0].symbol_ratio_e6 == int(1 / 11 * 1e6)
    assert rows[0].keep                     # all under thresholds

    assert rows[1].symbol_ratio_e6 == int(3 / 5 * 1e6)
    assert rows[1].alpha_frac_e6 == 0
    assert rows[1].n_stopwords == 0
    assert not rows[1].keep

    assert rows[2].keep and rows[2].alpha_frac_e6 == 1000000


def test_vocab_stats_and_percentiles(spark):
    from htmlcleanup_spark.functions.text import (
        length_percentiles, vocab_stats,
    )

    df = spark.createDataFrame(
        [(0, "a b a", "en", 5), (1, "a c", "en", 3), (2, "d", "de", 1),
         (3, "e f g", "en", 9)],
        "doc_id long, text string, lang string, n_chars long",
    )
    v = vocab_stats(df).collect()[0]
    # terms: a b c d e f g -> 7; hapax: b c d e f g -> 6; tokens: 9
    assert (v.n_terms, v.n_hapax, v.total_tokens) == (7, 6, 9)

    p = {(r.lang, r.pct): r.value
         for r in length_percentiles(df).collect()}
    # en values sorted: 3, 5, 9 -> p50 = idx floor(2*0.5)=1 -> 5,
    # p90 = idx floor(2*0.9)=1 -> 5, p99 = idx 1 -> 5; de single -> 1
    assert p[("en", 50)] == 5 and p[("en", 90)] == 5
    assert p[("de", 50)] == 1 and p[("de", 99)] == 1


def test_host_quality_rollup_and_fail_closed_min_docs(spark):
    from htmlcleanup_spark.functions.text import host_quality

    good = ("apple bravo candy delta eagle fancy grape happy igloo "
            "jolly koala lemon mango nifty ocean piano queen rapid "
            "sunny tiger umbra vivid wacky xenon")
    bad = " ".join(["aa"] * 25)          # mean word len 2 -> drop
    rows = [(0, "A", good), (1, "A", good), (2, "A", good),
            (3, "A", bad),               # A: 3/4 keep -> 750000
            (4, "B", good), (5, "B", good)]   # B: only 2 docs
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    out = {r.host: r for r in host_quality(df).collect()}
    a = out["A"]
    assert (a.n_docs, a.n_keep, a.keep_frac_e6) == (4, 3, 750000)
    assert a.host_keep is True
    b = out["B"]
    # 100% keep but below min_docs: fail closed
    assert (b.n_docs, b.keep_frac_e6, b.host_keep) == (2, 1000000, False)


def test_readability_flesch(spark):
    from htmlcleanup_spark.functions.text import readability

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),
            (2, ""),
            (3, "word"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in readability(df).collect()}
    r1 = rows[1]
    assert (r1.n_sents, r1.n_words) == (2, 6)
    # syllable groups: e/a/a/e/o/a -> 6
    assert r1.n_syllables == 6
    import math
    exp = math.floor(1000 * (206.835 - 1.015 * 6 / 2 - 84.6 * 6 / 6))
    assert r1.flesch_e3 == exp
    assert rows[2].flesch_e3 is None and rows[2].n_sents == 0
    assert rows[3].flesch_e3 is not None  # 1 word, 1 "sentence"


def test_polyglot_profile_segmentation(spark):
    from htmlcleanup_spark.functions.text import polyglot_profile

    en = "the cat and the dog is in the house"
    de = "der hund und die katze ist nicht hier"
    rows = [
        (1, en + "\n" + en + "\n" + de),      # 2 en + 1 de -> polyglot
        (2, "zzz qqq xyzzy"),                  # 1 und paragraph
        (3, "\n   \n"),                        # only blanks -> no row
        (4, en + "\n" + de),                   # 1-1 tie -> en (order)
        (5, en + "\nzzz qqq"),                 # real beats equal und
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in polyglot_profile(df).collect()}
    assert 3 not in out and len(out) == 4
    r1 = out[1]
    assert (r1.n_paras, r1.c_en, r1.c_de) == (3, 2, 1)
    assert r1.majority_lang == "en" and r1.n_majority == 2
    assert r1.n_langs == 2 and r1.is_polyglot
    r2 = out[2]
    assert r2.majority_lang == "und" and r2.c_und == 1
    assert r2.n_langs == 0 and not r2.is_polyglot
    assert out[4].majority_lang == "en" and out[4].is_polyglot
    r5 = out[5]
    assert r5.majority_lang == "en" and r5.c_und == 1
    assert r5.n_langs == 1 and not r5.is_polyglot


def test_polyglot_profile_single_doc_keyed_shuffle(spark):
    """Plan gate: exactly one exchange, keyed by doc_id — the explode
    and per-paragraph scoring must stay pipelined."""
    import re

    from htmlcleanup_spark.functions.text import polyglot_profile

    df = spark.createDataFrame(
        [(i, "the cat is here\nder hund") for i in range(20)],
        "doc_id long, text string",
    )
    plan = (polyglot_profile(df)
            ._jdf.queryExecution().executedPlan().toString())
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(exchanges) == 1 and "doc_id#" in exchanges[0], plan
    assert "SinglePartition" not in plan


def test_corpus_mix_cube_rollup_totals(spark):
    from htmlcleanup_spark.functions.text import corpus_mix_cube

    long_txt = " ".join(["the cat sat on the mat is a"] * 20)  # 160 tok
    rows = [
        (1, "en", long_txt),
        (2, "en", "the cat"),
        (3, "de", "der hund und die katze " * 8),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = corpus_mix_cube(df).collect()
    by_key = {(r.lang, r.q_band, r.len_band): r for r in out}
    grand = by_key[("(all)", "(all)", "(all)")]
    assert (grand.g_lang, grand.g_q, grand.g_len) == (1, 1, 1)
    assert grand.n_docs == 3
    en_total = by_key[("en", "(all)", "(all)")]
    assert en_total.n_docs == 2 and en_total.g_lang == 0
    assert en_total.g_q == 1 and en_total.g_len == 1
    # leaf rows carry zero grouping flags and sum to the grand total
    leaves = [r for r in out if (r.g_lang, r.g_q, r.g_len) == (0, 0, 0)]
    assert sum(r.n_docs for r in leaves) == 3
    assert sum(r.total_tokens for r in leaves) == grand.total_tokens
    # length bands: 160-token doc is 'm', 2-token doc is 'xs'
    assert {r.len_band for r in leaves if r.lang == "en"} == {"m", "xs"}


def test_oov_rate_against_known_vocab(spark):
    from htmlcleanup_spark.functions.text import oov_rate

    # corpus: 'a' x 30, 'b' x 20, 'c' x 10, 'z' x 1 -> top-2 vocab {a, b}
    rows = [
        (1, " ".join(["a"] * 3 + ["b"] * 2)),       # all in vocab
        (2, " ".join(["a"] * 2 + ["c"] * 2)),       # half oov
        (3, " ".join(["c"] * 3 + ["z"])),           # all oov
        (4, " ".join(["a"] * 25 + ["b"] * 18 + ["c"] * 5)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in oov_rate(df, vocab_size=2).collect()}
    assert out[1].n_oov == 0 and out[1].oov_e6 == 0
    assert out[2].n_oov == 2 and out[2].oov_e6 == 500000
    assert out[3].n_oov == 4 and out[3].oov_e6 == 1000000
    assert out[4].n_oov == 5 and out[4].n_tokens == 48


def test_oov_rate_vocab_tiebreak_deterministic(spark):
    from htmlcleanup_spark.functions.text import oov_rate

    # 'x' and 'y' tie on count at the vocab boundary; ASC keeps 'x'
    df = spark.createDataFrame(
        [(1, "a a a x y"), (2, "x y")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in oov_rate(df, vocab_size=2).collect()}
    # vocab = {a (3), x (2 ties with y -> 'x' wins)}
    assert out[2].n_oov == 1
    assert out[1].n_oov == 1


def test_heavy_hitters_exact_shares(spark):
    from htmlcleanup_spark.functions.text import heavy_hitters

    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = {r.value: r for r in heavy_hitters(df, "k", k=2).collect()}
    assert set(out) == {"a", "b"}
    assert (out["a"].rank, out["a"].n, out["a"].share_e6) == (1, 6, 600000)
    assert (out["b"].rank, out["b"].n, out["b"].share_e6) == (2, 3, 300000)


def test_heavy_hitters_tie_and_heap_plan(spark):
    from htmlcleanup_spark.functions.text import heavy_hitters

    rows = [("x",)] * 2 + [("y",)] * 2 + [("z",)] * 2 + [("w",)] * 1
    df = spark.createDataFrame(rows, "k string")
    res = heavy_hitters(df, "k", k=2)
    got = sorted((r.rank, r.value) for r in res.collect())
    # ties break value ASC: x then y; z drops at the cut
    assert got == [(1, "x"), (2, "y")]
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the top-k must be heap-based, never a global sort of the counts
    assert "TakeOrderedAndProject" in plan, plan
