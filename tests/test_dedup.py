"""Dedup-layer gates: pairs->clusters correctness, the ngram work-pruning
plan shape, and the HLL corpus-stats tolerance."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from htmlcleanup_spark.operators import dedup

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_connected_components_shapes(spark):
    # path (worst case for naive propagation), star, isolated pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (20, 22)],
        "id_a long, id_b long",
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_connected_components_long_path_converges(spark):
    """A 64-node path exercises the O(log^2 n) star-contraction bound —
    naive min-propagation would need 63 rounds; the default budget (25)
    must be plenty for large-star/small-star."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 64)], "id_a long, id_b long"
    )
    cc = dedup.connected_components(pairs)
    assert cc.filter(F.col("cluster_id") != 1).count() == 0
    assert cc.count() == 64


def test_connected_components_reliable_checkpoint_identical(spark, tmp_path):
    """checkpoint_dir (reliable checkpoint, the executor-loss-tolerant
    cluster mode) must produce exactly the localCheckpoint result."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22)],
        "id_a long, id_b long",
    )
    local = {
        (r.doc_id, r.cluster_id)
        for r in dedup.connected_components(pairs).collect()
    }
    reliable = {
        (r.doc_id, r.cluster_id)
        for r in dedup.connected_components(
            pairs, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert reliable == local and len(local) == 9


def test_containment_catches_partial_copy(spark):
    """A short doc quoted verbatim inside a much larger one: containment
    (quote in host) ~1.0 while symmetric Jaccard is diluted far below any
    usable threshold — the operator's reason to exist."""
    quote = " ".join("q%d" % i for i in range(40))
    host = (
        " ".join("h%d" % i for i in range(300))
        + " " + quote + " "
        + " ".join("t%d" % i for i in range(300))
    )
    other = " ".join("z%d" % i for i in range(100))
    docs = spark.createDataFrame(
        [(1, quote), (2, host), (3, other)], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): r.containment
        for r in dedup.containment_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 0.8  # quote covered by host
    assert (2, 1) not in got                      # host not covered by quote
    assert not any(3 in pair for pair in got)
    # symmetric Jaccard misses the same pair at any practical threshold
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.2)
    assert jac.filter("id_a = 1 and id_b = 2").count() == 0


def test_dedup_survivors_keeps_one_per_cluster(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 7, 8, 42)], "doc_id long"
    )
    cc = dedup.connected_components(pairs)
    kept = sorted(r.doc_id for r in dedup.dedup_survivors(docs, cc).collect())
    assert kept == [1, 7, 42]  # 42 never paired -> kept


def test_ngram_candidates_mode_matches_bare_restriction(spark):
    """With candidates, jaccard values equal the bare run restricted to
    those pairs (the semi-joins prune work, not semantics)."""
    docs = spark.read.parquet(SF + "/documents.parquet")
    bare = dedup.ngram_jaccard_pairs(docs, threshold=0.2)
    cand = dedup.minhash_lsh_pairs(docs)
    pruned = dedup.ngram_jaccard_pairs(docs, threshold=0.2, candidates=cand)
    bare_on_cand = bare.join(cand, ["id_a", "id_b"])
    a = {(r.id_a, r.id_b, r.jaccard) for r in bare_on_cand.collect()}
    b = {(r.id_a, r.id_b, r.jaccard) for r in pruned.collect()}
    assert a == b and len(b) > 0


def test_ngram_candidate_filter_below_aggregation(spark):
    """Both prunes must sit under the intersection aggregate: the id
    semi-join and the exact-pair semi-join appear as LeftSemi joins in the
    plan (work pruning), not as a post-aggregation inner join."""
    docs = spark.read.parquet(SF + "/documents.parquet")
    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    plan = plan_of(dedup.ngram_jaccard_pairs(docs, candidates=cand))
    assert plan.count("LeftSemi") >= 2


def test_ngram_df_cap_drops_hot_shingles(spark):
    """max_shingle_df must remove capped shingles from BOTH intersection
    and sizes: two docs overlapping only in a hot shingle score nothing."""
    rows = [
        (1, "x x a b c"),
        (2, "x x a b d"),
        (3, "x x a q r"),
        (4, "x x a s t"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # shingle "x x a" has df=4; cap=3 drops it everywhere
    out = dedup.ngram_jaccard_pairs(
        docs, threshold=0.0001, max_shingle_df=3
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
    # docs 1,2 still share "x a b" (df=2): sizes are 2 each after the cap
    # ("x x a" removed), so jaccard = 1/(2+2-1)
    assert got[(1, 2)] == round(1 / 3, 6)
    # docs 3,4 shared ONLY capped shingles -> no pair at all
    assert (3, 4) not in got


def test_corpus_stats_hll_within_tolerance(spark):
    from htmlcleanup_spark.functions.text import corpus_stats

    docs = spark.read.parquet(SF + "/documents.parquet")
    exact = {r.lang: r.n_distinct_texts
             for r in corpus_stats(docs).collect()}
    approx = {r.lang: r.n_distinct_texts
              for r in corpus_stats(docs, approx=True).collect()}
    assert set(exact) == set(approx)
    for lang, n in exact.items():
        assert abs(approx[lang] - n) <= max(0.1 * n, 2), lang


def test_lsh_hot_bucket_cap(spark):
    """max_bucket_size drops degenerate band buckets (the m^2 tail): five
    identical docs form hot buckets in every band and emit no pairs under
    the cap, while a small genuine duplicate pair is still found."""
    rows = [(i, "the same boilerplate text repeated here") for i in range(5)]
    rows += [(10, "a unique document about owls and trees"),
             (11, "a unique document about owls and trees")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.minhash_lsh_pairs(docs)
    assert uncapped.count() == 10 + 1  # C(5,2) + the (10,11) pair
    capped = dedup.minhash_lsh_pairs(docs, max_bucket_size=3)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(10, 11)}


def test_line_dedup_removes_boilerplate_lines(spark):
    """Lines present in >=30% of docs (and >=2 docs) are dropped
    everywhere; order is preserved; an all-boilerplate doc vanishes."""
    from htmlcleanup_spark.operators.dedup import line_dedup

    footer = "copyright corp"
    docs = [
        (0, "alpha\n%s\nbeta" % footer),
        (1, "gamma\n%s" % footer),
        (2, "%s\ndelta" % footer),
        (3, "unique one\nunique two"),
        (4, footer),                       # only boilerplate -> no row
        (5, "epsilon\nepsilon"),           # intra-doc repeat: df=1, kept
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in line_dedup(df, id_col="doc_id", text_col="text").collect()
    }

    assert 4 not in out
    assert out[0].text == "alpha\nbeta"
    assert out[0].n_lines_kept == 2 and out[0].n_lines_dropped == 1
    assert out[1].text == "gamma"
    assert out[2].text == "delta"
    assert out[3].text == "unique one\nunique two"
    assert out[3].n_lines_dropped == 0
    assert out[5].text == "epsilon\nepsilon"


def test_line_dedup_min_df_floor(spark):
    """max_doc_frac alone can't drop a line seen once in a tiny corpus:
    the min_df floor keeps singleton lines."""
    from htmlcleanup_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        [(0, "only line")], "doc_id long, text string"
    )
    rows = line_dedup(df, id_col="doc_id", text_col="text").collect()
    assert len(rows) == 1 and rows[0].text == "only line"


def test_decontaminate_flags_exact_and_partial_overlap(spark):
    from htmlcleanup_spark.operators.dedup import decontaminate

    ev = spark.createDataFrame(
        [(100, "q1 q2 q3 q4 q5 q6 q7 q8 tail tail")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (0, "q1 q2 q3 q4 q5 q6 q7 q8"),            # exact 8-gram
            (1, "pre q1 q2 q3 q4 q5 q6 q7 q8 post"),   # embedded 8-gram
            (2, "q1 q2 q3 q4 q5 q6 q7 other"),         # only 7 shared
            (3, "clean text with nothing shared here at all"),
            (4, "short doc"),                           # < k words
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.contaminated for r in decontaminate(train, ev, k=8).collect()}
    assert out == {0: True, 1: True, 2: False, 3: False, 4: False}


def test_stratified_sample_deterministic_and_rate(spark):
    from htmlcleanup_spark.operators.sample import (
        rate_threshold_hex,
        stratified_sample,
    )

    assert rate_threshold_hex(0.0) == "00000000"
    assert rate_threshold_hex(1.0) == "ffffffff"
    assert rate_threshold_hex(0.5) == "80000000"

    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("s"),
    )
    rates = {"a": 0.25, "b": 1.0}
    got1 = set(
        r.doc_id
        for r in stratified_sample(df, rates, strat_col="s").collect()
    )
    got2 = set(
        r.doc_id
        for r in stratified_sample(df, rates, strat_col="s").collect()
    )
    assert got1 == got2                       # deterministic
    n_a = sum(1 for i in got1 if i % 2 == 0)
    assert abs(n_a / 2000 - 0.25) < 0.05      # rate within 5 points
    assert sum(1 for i in got1 if i % 2 == 1) == 2000  # rate 1.0 keeps all
    # different salt redraws
    got3 = set(
        r.doc_id
        for r in stratified_sample(df, rates, strat_col="s",
                                   salt="v2").collect()
    )
    assert got3 != got1


def test_ngram_jaccard_hash_key_matches_exact(spark):
    """The 8-byte-key fast path must produce identical pairs and values
    to the exact string-key path (collisions are ~2^-65 per key pair)."""
    from htmlcleanup_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    kw = dict(threshold=0.2, max_shingle_df=50)
    exact = sorted(
        map(tuple, ngram_jaccard_pairs(docs, **kw).collect())
    )
    hashed = sorted(
        map(tuple, ngram_jaccard_pairs(docs, hash_key=True, **kw).collect())
    )
    assert exact == hashed and len(exact) > 0


# ---------------------------------------------------------------------------
# exact repeated-span removal (ExactSubstr, Lee et al. 2021)
# ---------------------------------------------------------------------------

def _pure_exactsubstr(texts, k=8, min_count=2):
    """Independent reference: brute-force k-gram coverage in pure Python."""
    from collections import Counter

    counts = Counter()
    for t in texts.values():
        toks = t.split(" ")
        for i in range(len(toks) - k + 1):
            counts[" ".join(toks[i:i + k])] += 1
    out = {}
    for did, t in texts.items():
        toks = t.split(" ")
        covered = [False] * len(toks)
        for i in range(len(toks) - k + 1):
            if counts[" ".join(toks[i:i + k])] >= min_count:
                for j in range(i, i + k):
                    covered[j] = True
        out[did] = (
            " ".join(tok for tok, c in zip(toks, covered) if not c),
            sum(covered),
        )
    return out


def test_remove_repeated_spans_matches_pure(spark):
    from htmlcleanup_spark.operators.dedup import remove_repeated_spans

    shared = "the quick brown fox jumps over the lazy dog tonight"
    texts = {
        0: "alpha beta " + shared + " gamma delta epsilon zeta eta theta",
        1: "one two three " + shared + " four five six seven eight nine",
        2: "no overlap here at all just unique words in this document text",
        3: "short doc",  # < k tokens: must pass through
        4: "rep rep rep rep rep rep rep rep rep rep rep rep",  # self-repeat
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_repeated_spans(df, k=8).collect()
    }
    want = _pure_exactsubstr(texts, k=8)
    assert got == want
    # sanity on the semantics themselves: the shared sentence vanished
    assert shared not in got[0][0] and shared not in got[1][0]
    assert got[2][1] == 0 and got[3] == ("short doc", 0)
    assert got[4][0] == ""  # fully self-repetitive doc is deleted


def test_remove_repeated_spans_exactness_boundary(spark):
    """A repeat of exactly k tokens is removed; k-1 shared tokens are NOT
    (no k-gram repeats) — the threshold is sharp."""
    from htmlcleanup_spark.operators.dedup import remove_repeated_spans

    seven = "a b c d e f g"            # 7 shared tokens, k=8 -> kept
    eight = "a b c d e f g h"          # 8 shared tokens -> removed
    df = spark.createDataFrame(
        [
            (0, "x0 " + eight + " y0"),
            (1, "x1 " + eight + " y1"),
            (2, "p0 " + seven + " q0r"),
            (3, "p1 " + seven + " q1r"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["n_removed"]
           for r in remove_repeated_spans(df, k=8).collect()}
    assert got == {0: 8, 1: 8, 2: 0, 3: 0}


def test_paragraph_minhash_pairs_planted(spark):
    """A paragraph copied across two documents (and repeated inside one)
    must surface as candidate pairs with correct (doc, pos) backrefs;
    unique paragraphs must not pair.  Pairs are canonically ordered by
    the composite 'id:pos' string key."""
    from htmlcleanup_spark.operators.dedup import paragraph_minhash_pairs

    dup = "the quick brown fox jumps over the lazy sleeping dog again"
    uniq1 = "completely different words about spark shuffles and skew"
    uniq2 = "another unrelated paragraph mentioning parquet row groups"
    df = spark.createDataFrame(
        [
            (1, uniq1 + "\n" + dup),
            (2, dup + "\n" + uniq2),
            (3, dup + "\n" + dup),        # intra-doc repeat
            (4, "short one"),             # < k words: no shingles
        ],
        "doc_id bigint, text string",
    )
    got = {
        ((r.id_a, r.pos_a), (r.id_b, r.pos_b))
        for r in paragraph_minhash_pairs(df).collect()
    }
    units = [(1, 1), (2, 0), (3, 0), (3, 1)]
    want = {
        (a, b)
        for i, a in enumerate(units)
        for b in units[i + 1:]
        if "%d:%d" % a < "%d:%d" % b
    } | {
        (b, a)
        for i, a in enumerate(units)
        for b in units[i + 1:]
        if "%d:%d" % b < "%d:%d" % a
    }
    assert got == want
    assert all(
        "%d:%d" % a < "%d:%d" % b for a, b in got
    ), "canonical composite ordering violated"


def test_host_line_dedup_per_host_independence(spark):
    """The SAME literal line is template on one host (dropped) and rare on
    another (kept); per-page order survives; all-template pages vanish."""
    from htmlcleanup_spark.operators.dedup import host_line_dedup

    rows = [
        # host a: NAV on all 4 pages (df 4 >= 2, >= 0.5*4) -> dropped
        ("http://a.com/1", "NAV\nalpha one"),
        ("http://a.com/2", "NAV\nbeta two"),
        ("http://a.com/3", "NAV\ngamma three"),
        ("http://a.com/4", "NAV"),              # all-template -> no row
        # host b: identical NAV line but on 1 of 3 pages -> kept (df < 2)
        ("http://b.com/1", "NAV\ndelta"),
        ("http://b.com/2", "epsilon\nzeta"),
        ("http://b.com/3", "eta"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    out = {r.url: r for r in host_line_dedup(df).collect()}

    assert "http://a.com/4" not in out          # fully-template page
    assert out["http://a.com/1"].text == "alpha one"
    assert out["http://a.com/1"].n_lines_dropped == 1
    assert out["http://a.com/1"].host == "a.com"
    assert out["http://b.com/1"].text == "NAV\ndelta"   # same line, kept
    assert out["http://b.com/1"].n_lines_dropped == 0
    assert out["http://b.com/2"].text == "epsilon\nzeta"  # order kept


def test_dedup_survivors_by_quality(spark):
    from htmlcleanup_spark.operators.dedup import dedup_survivors_by_quality

    docs = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (4, 99), (5, 7), (6, 9)],
        "doc_id long, quality_e6 long",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)],
        "doc_id long, cluster_id long",
    )
    kept = sorted(
        r.doc_id
        for r in dedup_survivors_by_quality(docs, clusters).collect()
    )
    # cluster 1: quality tie 50/50 between docs 2 and 3 -> smaller id 2;
    # cluster 5: doc 6 (9 > 7); doc 4 never clustered -> kept
    assert kept == [2, 4, 6]


def test_dedup_survivors_by_quality_no_window(spark):
    """Plan gate: winner selection is an aggregate, not a row_number
    window over cluster members (a mega-cluster must not become one
    window partition)."""
    from htmlcleanup_spark.operators.dedup import dedup_survivors_by_quality

    docs = spark.createDataFrame(
        [(i, i % 7) for i in range(50)], "doc_id long, quality_e6 long"
    )
    clusters = spark.createDataFrame(
        [(i, i % 5) for i in range(40)], "doc_id long, cluster_id long"
    )
    plan = (dedup_survivors_by_quality(docs, clusters)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan, plan
    assert "SinglePartition" not in plan, plan


def test_lsh_recall_report_bands(spark):
    from htmlcleanup_spark.operators.dedup import lsh_recall_report

    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "completely different words about spark shuffles and parquet files"
    docs = spark.createDataFrame(
        [(1, a), (2, a),          # identical pair -> J=1, band 4, detected
         (3, b), (4, a + " x")],  # unrelated pair -> J~0, band 0
        "doc_id long, text string",
    )
    planted = spark.createDataFrame(
        [(1, 2), (3, 4)], "id_a long, id_b long"
    )
    out = {r.jband: r for r in lsh_recall_report(docs, planted).collect()}
    assert out[4].n_pairs == 1 and out[4].n_detected == 1
    assert out[4].recall_e6 == 1000000
    assert out[0].n_pairs == 1 and out[0].n_detected == 0
    assert out[0].recall_e6 == 0


def test_lsh_recall_report_excludes_short_docs(spark):
    from htmlcleanup_spark.operators.dedup import lsh_recall_report

    docs = spark.createDataFrame(
        [(1, "one two"), (2, "one two"),
         (3, "the quick brown fox jumps high"),
         (4, "the quick brown fox jumps high")],
        "doc_id long, text string",
    )
    planted = spark.createDataFrame(
        [(1, 2), (3, 4)], "id_a long, id_b long"
    )
    rows = lsh_recall_report(docs, planted).collect()
    # pair (1,2) has < k words per side -> no defined Jaccard -> excluded
    assert sum(r.n_pairs for r in rows) == 1


def test_dedup_report_histogram_reconciles(spark):
    from htmlcleanup_spark.operators.dedup import dedup_report

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 11)], "doc_id long"
    )
    # clusters: {1,2,3} size 3, {5,6} size 2; docs 4,7..10 never paired
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)],
        "doc_id long, cluster_id long",
    )
    rows = {r.cluster_size: (r.n_clusters, r.n_docs)
            for r in dedup_report(docs, clusters).collect()}
    assert rows == {3: (1, 3), 2: (1, 2), 1: (5, 5)}
    # the histogram reconciles to the corpus: sum(n_docs) == |docs|,
    # and duplicates = sum(n_docs) - sum(n_clusters)
    assert sum(v[1] for v in rows.values()) == 10
    assert sum(v[1] - v[0] for v in rows.values()) == 3


def test_dedup_report_no_singleton_row_when_all_clustered(spark):
    from htmlcleanup_spark.operators.dedup import dedup_report

    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, cluster_id long"
    )
    rows = dedup_report(docs, clusters).collect()
    assert len(rows) == 1 and rows[0].cluster_size == 2


def test_dedup_by_source_accounting(spark):
    """Registry composition invariant: per-source totals reconcile to
    the corpus, and n_dups counts exactly the non-canonical docs."""
    import __spark_entry__ as e

    rows = e.q_dedup_by_source(spark, "/root/testdata/sf0.001").collect()
    assert sum(r.n_docs for r in rows) == 500
    total_dups = sum(r.n_dups for r in rows)
    rep = {r.cluster_size: r for r in
           e.q_dedup_report(spark, "/root/testdata/sf0.001").collect()}
    # duplicates = clustered docs minus one canonical per cluster
    expect = sum((r.n_docs - r.n_clusters) for r in rep.values())
    assert total_dups == expect
    for r in rows:
        assert 0 <= r.dup_rate_e6 <= 1_000_000
