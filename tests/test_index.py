"""Inverted index, word2phrase collocation scores, and intra-document
line dedup."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_inverted_index_exact(spark):
    from htmlcleanup_spark.operators.index import inverted_index

    df = spark.createDataFrame(
        [
            (3, "apple banana apple"),
            (1, "banana cherry"),
            (2, "apple  cherry"),  # double space -> empty token dropped
        ],
        "doc_id long, text string",
    )
    out = {r.term: r for r in inverted_index(df).collect()}
    assert set(out) == {"apple", "banana", "cherry"}
    # df is per-document (apple twice in doc 3 counts once)
    assert out["apple"].doc_freq == 2
    assert out["apple"].postings == "2,3"  # ascending ids
    assert out["banana"].doc_freq == 2 and out["banana"].postings == "1,3"
    assert out["cherry"].postings == "1,2"


def test_inverted_index_posting_cap_keeps_exact_df(spark):
    from htmlcleanup_spark.operators.index import inverted_index

    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("common word").alias("text")
    )
    out = {r.term: r for r in inverted_index(df, max_postings=3).collect()}
    assert out["common"].doc_freq == 10          # exact, pre-cap
    assert out["common"].postings == "0,1,2"     # smallest ids kept


def test_phrase_scores_word2phrase_formula(spark):
    from htmlcleanup_spark.operators.index import phrase_scores

    # "new york" x7, plus lone "new"/"york" occurrences
    rows = [(i, "new york is a big city") for i in range(7)]
    rows.append((7, "york new brand"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.word_a, r.word_b): r
           for r in phrase_scores(df, delta=5, min_pair_count=2).collect()}
    ny = out[("new", "york")]
    n_tokens = 7 * 6 + 3
    assert ny.pair_count == 7
    # (7 - 5) * N * 1e6 // (cnt(new)=8 * cnt(york)=8)
    assert ny.score_e6 == (2 * n_tokens * 1_000_000) // 64
    # pairs at or below delta occurrences are dropped entirely
    assert ("york", "new") not in out
    assert ("is", "a") in out  # count 7 > delta


def test_phrase_scores_single_token_rows_ignored(spark):
    from htmlcleanup_spark.operators.index import phrase_scores

    df = spark.createDataFrame(
        [(0, "solo")] * 10 + [(1, "a b")] * 6,
        "doc_id long, text string",
    )
    out = phrase_scores(df, delta=5, min_pair_count=2).collect()
    assert [(r.word_a, r.word_b, r.pair_count) for r in out] == [
        ("a", "b", 6)
    ]


def test_doc_line_dedup_keeps_first_occurrence(spark):
    from htmlcleanup_spark.operators.corpus import doc_line_dedup

    df = spark.createDataFrame(
        [
            (0, "alpha\nbeta\nalpha\n  beta  \ngamma"),
            (1, "only\nlines\nhere"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in doc_line_dedup(df).collect()}
    # trimmed-key dup detection, first occurrence kept verbatim
    assert out[0].text == "alpha\nbeta\ngamma"
    assert out[0].n_lines_kept == 3 and out[0].n_dupes_removed == 2
    assert out[1].text == "only\nlines\nhere"
    assert out[1].n_dupes_removed == 0


def test_doc_line_dedup_is_intra_document_only(spark):
    from htmlcleanup_spark.operators.corpus import doc_line_dedup

    df = spark.createDataFrame(
        [(0, "shared line\nown a"), (1, "shared line\nown b")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in doc_line_dedup(df).collect()}
    # the same line in two documents survives in both (cross-doc dedup
    # is dedup.line_dedup's job, not this operator's)
    assert out[0] == "shared line\nown a"
    assert out[1] == "shared line\nown b"


def _bm25_expected(docs, queries, k=10, k1=1.2, b=0.75):
    """Reference BM25 in pure Python mirroring the operator's
    quantize-then-sum arithmetic."""
    import math

    toks = {i: [w for w in t.split(" ") if w] for i, t in docs}
    n = len(docs)
    tot = sum(len(ws) for ws in toks.values())
    avgdl = tot / n
    dfreq = {}
    for ws in toks.values():
        for t in set(ws):
            dfreq[t] = dfreq.get(t, 0) + 1
    scored = {}
    for qid, term in queries:
        for i, ws in toks.items():
            tf = ws.count(term)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
            w = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(ws) / avgdl))
            scored[(qid, i)] = scored.get((qid, i), 0) + math.floor(w * 1e6)
    out = {}
    for (qid, i), s in scored.items():
        out.setdefault(qid, []).append((-s, i))
    exp = []
    for qid, rows in out.items():
        for rank, (neg, i) in enumerate(sorted(rows)[:k], 1):
            exp.append((qid, i, -neg, rank))
    return sorted(exp)


def test_bm25_topk_matches_reference(spark):
    from htmlcleanup_spark.operators.index import bm25_topk

    docs = [
        (0, "spark window agg spark spark"),
        (1, "window window table"),
        (2, "agg   spark table window"),
        (3, "table table table"),
        (4, "spark"),
        (5, ""),
    ]
    queries = [(0, "spark"), (0, "window"), (1, "table")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    q = spark.createDataFrame(queries, "qid int, term string")
    got = sorted(
        (r.qid, r.doc_id, r.score_e6, r.rank)
        for r in bm25_topk(df, q, k=3).collect()
    )
    assert got == _bm25_expected(docs, queries, k=3)


def test_bm25_topk_two_stage_cut_plan(spark):
    """The top-k must be the salted two-stage cut: a local window keyed
    (qid, _p) precedes the final per-qid window — never one window over
    the full scored set per query (the mixture_sample anti-pattern)."""
    from htmlcleanup_spark.operators.index import bm25_topk
    import re

    df = spark.createDataFrame(
        [(i, "spark window") for i in range(20)], "doc_id long, text string")
    q = spark.createDataFrame([(0, "spark")], "qid int, term string")
    plan = bm25_topk(df, q, k=2)._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"hashpartitioning\(qid#\d+, _p#\d+", plan)
    assert plan.count("RunningWindowFunction") + plan.count("Window") >= 2
