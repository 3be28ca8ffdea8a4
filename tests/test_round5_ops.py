"""Late round-5 operators: RefinedWeb line rules, Zipf slope fit,
extraction-churn QA, D4 cluster-cap sampling, magic-byte MIME sniff."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F


def test_refinedweb_line_rules(spark):
    from htmlcleanup_spark.operators.corpus import refinedweb_line_rules

    prose = ("A normal first sentence of prose.\n"
             "Another perfectly ordinary line of text here.")
    df = spark.createDataFrame(
        [
            (0, prose),
            (1, prose + "\nBREAKING NEWS EXCLUSIVE"),      # uppercase
            (2, prose + "\n42"),                           # numeric only
            (3, prose + "\n3 likes\n12 comments"),         # counters
            (4, prose + "\nHome"),                         # single word
            (5, "MENU\n7 shares\nNav\n9\n" + "x y.\n"),    # heavy damage
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in refinedweb_line_rules(df).collect()}
    assert out[0].n_lines_removed == 0 and out[0].keep is True
    assert out[1].n_lines_removed == 1
    assert "BREAKING" not in out[1].clean_text
    assert out[2].n_lines_removed == 1
    assert out[3].n_lines_removed == 2 and "likes" not in out[3].clean_text
    assert out[4].n_lines_removed == 1
    # doc 5: everything but the tiny prose tail is removed -> dropped
    assert out[5].keep is False
    assert out[5].removed_ratio_e6 > 50_000
    # the mixed-case prose lines never trip the uppercase-majority rule
    assert out[0].clean_text == prose


def test_refinedweb_ratio_is_integer_quantized(spark):
    from htmlcleanup_spark.operators.corpus import refinedweb_line_rules

    df = spark.createDataFrame([(0, "ok text here.\nNAVBAR")],
                               "doc_id long, text string")
    r = refinedweb_line_rules(df).collect()[0]
    total = len("ok text here.\nNAVBAR")
    removed = total - len("ok text here.")
    assert r.removed_ratio_e6 == math.floor(1e6 * removed / total)


def test_zipf_fit_recovers_synthetic_slope(spark):
    from htmlcleanup_spark.functions.text import zipf_fit

    # build a corpus whose rank-frequency curve IS zipfian with s=1:
    # term t_r appears floor(1200 / r) times, r = 1..40
    words = []
    for r in range(1, 41):
        words += [f"t{r:02d}"] * (1200 // r)
    df = spark.createDataFrame([(0, " ".join(words))],
                               "doc_id long, text string")
    row = zipf_fit(df, top_n=40).collect()[0]
    assert row.n_terms == 40
    # slope should be close to -1 (floor(1200/r) quantization wiggles it)
    assert -1_100_000 < row.slope_e6 < -900_000
    # intercept ~ ln(1200) = 7.09
    assert 6_800_000 < row.intercept_e6 < 7_300_000


def test_zipf_fit_deterministic_and_tie_broken(spark):
    from htmlcleanup_spark.functions.text import zipf_fit

    df = spark.createDataFrame(
        [(0, "b b a a c")], "doc_id long, text string"
    ).repartition(4)
    a = zipf_fit(df, top_n=3).collect()[0]
    b = zipf_fit(df, top_n=3).collect()[0]
    assert (a.slope_e6, a.intercept_e6) == (b.slope_e6, b.intercept_e6)
    assert a.n_terms == 3


def test_extraction_churn_flags(spark):
    from htmlcleanup_spark.functions.text import extraction_churn

    base = "The quick brown fox jumps over the lazy dog. " * 3
    df = spark.createDataFrame(
        [
            (0, base, base),                        # identical
            (1, base, base + "tail growth " * 20),  # big length change
            (2, base, "X" + base[1:]),              # head edit, tiny delta
            (3, base, base.replace("quick", "slow")),
        ],
        "doc_id long, old_text string, new_text string",
    )
    out = {r.doc_id: r for r in extraction_churn(df).collect()}
    assert out[0].exact_match is True and out[0].churned is False
    assert out[0].prefix_dist == 0 and out[0].rel_change_e6 == 0
    assert out[1].churned is True          # > 10% length growth
    assert out[1].rel_change_e6 > 100_000
    assert out[2].exact_match is False and out[2].prefix_dist == 1
    assert out[2].churned is False         # 1-char head edit is fine
    assert out[3].prefix_dist > 0 and out[3].churned is False


def test_extraction_churn_prefix_cap(spark):
    from htmlcleanup_spark.functions.text import extraction_churn

    # edits BEYOND the prefix window are invisible to prefix_dist
    old = "a" * 500
    new = "a" * 400 + "b" * 100
    df = spark.createDataFrame([(0, old, new)],
                               "doc_id long, old_text string, new_text string")
    r = extraction_churn(df, prefix_chars=400).collect()[0]
    assert r.prefix_dist == 0 and r.exact_match is False


def test_cluster_sample_cap_and_determinism(spark):
    from htmlcleanup_spark.operators.ann import cluster_sample

    import numpy as np

    rng = np.random.RandomState(7)
    # two tight blobs far apart -> with 2 sampled centroids (one from
    # each blob, whichever ids md5-sort first) every vector joins its
    # own blob's centroid
    rows = []
    for i in range(60):
        blob = i % 2
        base = np.zeros(8)
        base[blob] = 10.0
        v = base + rng.normal(0, 0.05, 8)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cluster_sample(df, n_centroids=2, cap=5)
    got = out.collect()
    # exactly cap survivors per non-empty cluster
    from collections import Counter
    per = Counter(r.cluster_id for r in got)
    assert all(v == 5 for v in per.values())
    assert {r.rank for r in got} == {1, 2, 3, 4, 5}
    # md5-smallest selection: recompute expected survivors per cluster
    asg = {r.vec_id: r.cluster_id
           for r in cluster_sample(df, n_centroids=2, cap=10**6).collect()}
    expect = {}
    for vid, cid in asg.items():
        k = hashlib.md5(f"d4:{vid}".encode()).hexdigest()
        expect.setdefault(cid, []).append((k, vid))
    want = set()
    for cid, lst in expect.items():
        for k, vid in sorted(lst)[:5]:
            want.add((vid, cid))
    assert {(r.vec_id, r.cluster_id) for r in got} == want


def test_cluster_sample_bucketed_rank_matches_plain_window(spark):
    from htmlcleanup_spark.operators.ann import cluster_sample

    rows = [(i, [float(i % 3), 1.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # 1-nibble buckets (16-way) and 2-nibble must agree exactly
    a = sorted(map(tuple, cluster_sample(
        df, n_centroids=3, cap=4, bucket_nibbles=1).collect()))
    b = sorted(map(tuple, cluster_sample(
        df, n_centroids=3, cap=4, bucket_nibbles=2).collect()))
    assert a == b


def test_mime_sniff_magic_and_fallbacks(spark):
    from htmlcleanup_spark.operators.multimodal import mime_sniff

    cases = [
        (0, b"%PDF-1.4 rest", "application/pdf"),
        (1, b"\x89PNG\r\n\x1a\x0aXXXX", "image/png"),
        (2, b"\xff\xd8\xff\xe0 jfif", "image/jpeg"),
        (3, b"GIF89a.....", "image/gif"),
        (4, b"RIFF\x00\x00\x00\x00WEBPVP8 ", "image/webp"),
        (5, b"RIFF\x00\x00\x00\x00WAVEfmt ", "audio/wav"),
        (6, b"RIFF\x00\x00\x00\x00AVI LIST", "application/riff"),
        (7, b"\x1f\x8b\x08\x00gz", "application/gzip"),
        (8, b"PK\x03\x04zipzip", "application/zip"),
        (9, b"OggS\x00\x02vorbis", "application/ogg"),
        (10, b"ID3\x04\x00tag", "audio/mpeg"),
        (11, b"\x00\x00\x00\x18ftypisom", "video/mp4"),
        (12, b"<!DOCTYPE html><p>", "text/html"),
        (13, b"<html><head>", "text/html"),
        (14, b"plain old text, nothing else", "text/plain"),
        (15, b"\x00\x01\x02binary junk", "application/octet-stream"),
        (16, b"tab\tand\nnewline ok", "text/plain"),
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in cases], "doc_id long, payload binary"
    )
    out = {r.doc_id: r.mime for r in mime_sniff(df).collect()}
    for i, _, want in cases:
        assert out[i] == want, (i, out[i], want)


def test_mime_sniff_slices_before_hex(spark):
    from htmlcleanup_spark.operators.multimodal import mime_sniff

    big = b"%PDF-" + b"\x00" * 100_000
    df = spark.createDataFrame([(0, big)], "doc_id long, payload binary")
    r = mime_sniff(df, prefix_bytes=32).collect()[0]
    assert r.mime == "application/pdf"
    assert len(r.sniff_hex) == 64            # 32 bytes, not 100 KB
    assert r.n_bytes == len(big)


def test_training_corpus_v5_composition(spark):
    import __spark_entry__ as e

    out = e.q_training_corpus_v5(spark, "/root/testdata/sf0.001").collect()
    # 8 survivor-derived clusters, at most 5 picks each
    from collections import Counter
    per = Counter(r.cluster_id for r in out)
    assert set(per) <= set(range(8))
    assert all(v <= 5 for v in per.values())
    assert all(1 <= r.rank <= 5 for r in out)
    assert len({r.doc_id for r in out}) == len(out)
    assert all(r.n_chars > 0 for r in out)


def test_soft_dedup_weights(spark):
    from htmlcleanup_spark.operators.dedup import soft_dedup_weights

    df = spark.createDataFrame(
        [(0, "aaa"), (1, "aaa"), (2, "aaa"), (3, "bbb"), (4, "ccc")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in soft_dedup_weights(df).collect()}
    assert out[0].n_copies == 3 and out[0].weight_e6 == 333_333
    assert out[0].digest == out[1].digest == out[2].digest
    assert out[3].n_copies == 1 and out[3].weight_e6 == 1_000_000
    # every row survives (reweight, never remove)
    assert len(out) == 5


def test_token_fertility_integer_ratios(spark):
    from htmlcleanup_spark.functions.text import token_fertility

    df = spark.createDataFrame(
        [(0, "hello world", "en"), (1, "a b c, d!", "en"),
         (2, "xx", "de")],
        "doc_id long, text string, lang string",
    )
    out = {r.lang: r for r in token_fertility(df).collect()}
    en = out["en"]
    assert en.n_docs == 2
    assert en.total_chars == len("hello world") + len("a b c, d!")
    # BPE-ish: 'hello'' world' = 2; 'a'' b'' c'','' d''!' = 6
    assert en.total_tokens == 8
    assert en.total_words == 2 + 4
    assert en.chars_per_token_e6 == (en.total_chars * 10**6) // en.total_tokens
    assert en.tokens_per_word_e6 == (en.total_tokens * 10**6) // en.total_words


def test_lang_confusion_counts(spark):
    import __spark_entry__ as e

    out = e.q_lang_confusion(spark, "/root/testdata/sf0.001").collect()
    total = sum(r.n_docs for r in out)
    assert total == 500
    # the matrix is keyed uniquely
    keys = [(r.tagged_lang, r.pred_lang) for r in out]
    assert len(keys) == len(set(keys))


def test_reciprocal_link_stats(spark):
    from htmlcleanup_spark.operators.links import reciprocal_link_stats

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"),          # reciprocated pair
            ("a", "b"),                      # duplicate edge (distinct)
            ("a", "c"),                      # one-way
            ("c", "c"),                      # self-loop, excluded
            ("d", "a"),                      # one-way into a
        ],
        "src_host string, dst_host string",
    )
    out = {r.src_host: r for r in reciprocal_link_stats(edges).collect()}
    assert out["a"].n_out == 2 and out["a"].n_recip == 1
    assert out["a"].reciprocity_e6 == 500_000
    assert out["b"].n_out == 1 and out["b"].n_recip == 1
    assert out["b"].reciprocity_e6 == 1_000_000
    assert out["d"].n_out == 1 and out["d"].n_recip == 0
    assert "c" not in out                    # only a self-loop -> no rows


def test_jsonl_export_escapes_and_shards(spark):
    import json

    from htmlcleanup_spark.operators.corpus import jsonl_export

    df = spark.createDataFrame(
        [
            (0, 'plain text', 'web'),
            (9, 'quote " and \\ backslash', 'web'),
            (3, 'line1\nline2\ttabbed\rcr', 's"rc'),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.doc_id: r for r in jsonl_export(df).collect()}
    assert out[9].shard == 1 and out[0].shard == 0 and out[3].shard == 3
    # every line round-trips through a real JSON parser
    for i, row in out.items():
        obj = json.loads(row.line)
        assert obj["id"] == i
    assert json.loads(out[9].line)["text"] == 'quote " and \\ backslash'
    assert json.loads(out[3].line)["text"] == 'line1\nline2\ttabbed\rcr'
    assert json.loads(out[3].line)["source"] == 's"rc'


def test_script_mix_profile(spark):
    from htmlcleanup_spark.functions.text import script_mix

    df = spark.createDataFrame(
        [
            (0, "plain latin words only"),
            (1, "Привет мир"),
            (2, "latin with Привет mixed in"),
            (3, "1234 ... !!"),                       # no scripted chars
            (4, "ab 漢字"),                   # Han ties broken by count
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in script_mix(df).collect()}
    assert out[0].dominant_script == "latin" and out[0].mixed is False
    assert out[1].dominant_script == "cyrillic" and out[1].n_cyrillic == 9
    assert out[1].mixed is False
    assert out[2].dominant_script == "latin" and out[2].mixed is True
    assert out[3].dominant_script == "none" and out[3].mixed is False
    assert out[3].n_scripted == 0
    # 2 latin vs 2 han: tie -> first in SCRIPTS order (latin) wins
    assert out[4].dominant_script == "latin" and out[4].n_han == 2
    assert out[4].mixed is True


def test_ann_recall_report(spark):
    from htmlcleanup_spark.operators.ann import ann_recall_report

    import numpy as np

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 8)])
            for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = df.filter("vec_id % 20 = 0").select(
        df.vec_id.alias("query_id"), df.embedding.alias("query_vec"))
    out = {r.query_id: r for r in ann_recall_report(
        df, qs, k=5, n_centroids=4, nprobe=4).collect()}
    # nprobe == n_centroids -> IVF scans everything -> perfect recall
    assert len(out) == 4
    assert all(r.n_hit == 5 and r.recall_e6 == 1_000_000
               for r in out.values())
    part = {r.query_id: r for r in ann_recall_report(
        df, qs, k=5, n_centroids=4, nprobe=1).collect()}
    # pruned probes can only lose recall, and every query keeps a row
    assert len(part) == 4
    assert all(0 <= r.n_hit <= 5 for r in part.values())
    assert all(r.recall_e6 == r.n_hit * 200_000 for r in part.values())


def test_contamination_report_fractions(spark):
    from htmlcleanup_spark.operators.dedup import contamination_report

    train = spark.createDataFrame(
        [
            (0, "a b c d e f g h i j"),     # 3 distinct 8-shingles
            (1, "one two three four five six seven eight nine"),
            (2, "short doc"),               # too short to shingle
            (3, "x a b c d e f g h tail"),  # shares shingle 'a..h'
        ],
        "doc_id long, text string",
    )
    ev = train.filter("doc_id = 0")
    out = {r.doc_id: r for r in contamination_report(train, ev).collect()}
    assert out[0].n_shingles == 3 and out[0].n_hit == 3
    assert out[0].overlap_e6 == 1_000_000          # eval doc itself
    assert out[1].n_hit == 0 and out[1].overlap_e6 == 0
    assert out[2].n_shingles == 0 and out[2].n_hit == 0
    assert out[2].overlap_e6 == 0                  # zeroed, row kept
    assert out[3].n_shingles == 3 and out[3].n_hit == 1
    assert out[3].overlap_e6 == 333_333


def test_url_publish_dates(spark):
    from htmlcleanup_spark.functions.url import url_publish_dates

    df = spark.createDataFrame(
        [
            (0, "https://a.example/blog/2024/2/29/post-1"),   # leap OK
            (1, "https://a.example/news/20230229-x"),          # Feb 29 invalid
            (2, "https://a.example/a/item?date=2026-06-15"),   # future
            (3, "https://a.example/archive/2019/7/"),          # ym -> day 1
            (4, "https://a.example/about"),                    # no date
            (5, "https://a.example/2024/1/5/x?date=2020-01-01"),  # ymd wins
            (6, "https://a.example/p/20240431-z"),             # Apr 31 invalid
            (7, "https://a.example/blog/2025/12/20/y"),        # 30d band
        ],
        "doc_id long, url string",
    )
    out = {r.doc_id: r for r in url_publish_dates(df).collect()}
    assert out[0].date_src == "path_ymd" and out[0].pub_date == "2024-02-29"
    assert out[1].date_src is None and out[1].pub_date is None
    assert out[2].date_src == "query" and out[2].fresh_band == "future"
    assert out[3].date_src == "path_ym" and out[3].pub_date == "2019-07-01"
    assert out[4].date_src is None and out[4].fresh_band is None
    assert out[5].date_src == "path_ymd" and out[5].pub_date == "2024-01-05"
    assert out[6].date_src is None                    # no fall-through
    assert out[7].fresh_band == "30d" and out[7].age_days == 12


def test_filter_funnel_sequential_charging(spark):
    from htmlcleanup_spark.operators.corpus import filter_funnel

    # doc 1 fails BOTH stages -> charged to s1 only; doc 2 fails s2;
    # doc 3 survives.  Tokens: 2 / 3 / 4.
    df = spark.createDataFrame(
        [(1, "a b", False, False), (2, "a b c", True, False),
         (3, "a b c d", True, True)],
        "doc_id long, text string, f1 boolean, f2 boolean",
    )
    rows = {r.stage: r for r in filter_funnel(
        df, [("s1", F.col("f1")), ("s2", F.col("f2"))]).collect()}
    assert rows["s1"].docs_in == 3 and rows["s1"].docs_dropped == 1
    assert rows["s1"].tokens_dropped == 2
    assert rows["s2"].docs_in == 2 and rows["s2"].docs_dropped == 1
    assert rows["s2"].tokens_in == 7 and rows["s2"].tokens_kept == 4
    assert rows["s2"].drop_rate_e6 == 500000


def test_filter_funnel_zero_drop_stage_reported(spark):
    from htmlcleanup_spark.operators.corpus import filter_funnel

    df = spark.createDataFrame(
        [(1, "x y", True)], "doc_id long, text string, f boolean")
    rows = filter_funnel(df, [("only", F.col("f"))]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.docs_in == 1 and r.docs_dropped == 0 and r.docs_kept == 1
    assert r.drop_rate_e6 == 0


def test_quality_agreement_reconciles(spark):
    """The cross-tab partitions the corpus: every doc lands in exactly
    one (lang, ppl_bucket, score_bucket) cell, buckets are 1..3."""
    import __spark_entry__ as e

    rows = e.q_quality_agreement(spark, "/root/testdata/sf0.001").collect()
    assert sum(r.n_docs for r in rows) == 500
    assert {r.ppl_bucket for r in rows} <= {1, 2, 3}
    assert {r.score_bucket for r in rows} <= {1, 2, 3}
    # per-language cell totals reconcile to the language's doc count
    per_lang = {}
    for r in rows:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + r.n_docs
    from pyspark.sql import functions as F
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    expect = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per_lang == expect


def test_shard_balance_reconciles(spark):
    """Shares sum to ~1e6, bytes are exact JSON-line octets + newline,
    every doc is counted exactly once across shards."""
    import __spark_entry__ as e

    rows = e.q_shard_balance(spark, "/root/testdata/sf0.001").collect()
    assert sum(r.n_docs for r in rows) == 500
    assert len(rows) == 8
    total = sum(r.shard_bytes for r in rows)
    for r in rows:
        assert r.share_e6 == int(1e6 * r.shard_bytes / total)
    # floor rounding: shares sum within 8 millionths of unity
    s = sum(r.share_e6 for r in rows)
    assert 1_000_000 - 8 <= s <= 1_000_000
