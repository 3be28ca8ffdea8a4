"""WARC source: pure-parser unit tests + Spark ingestion to the pages
shape, ending in the extraction pipeline (byte-identical vs local engine)."""

from __future__ import annotations

import pytest

from htmlcleanup_spark.sources.warc import (
    iter_warc_batches,
    iter_warc_records,
    parse_warc_records,
    read_warc,
    write_synth_warc,
)

pytestmark = pytest.mark.spark


def test_parser_pure(tmp_path):
    p = str(tmp_path / "a.warc")
    write_synth_warc(p, 5)
    with open(p, "rb") as f:
        recs = list(parse_warc_records(f.read()))
    assert len(recs) == 5  # warcinfo record skipped
    assert recs[0]["url"] == "https://host0.example/p/0"
    assert recs[0]["html"].startswith(b"<html>")
    assert b"HTTP/1.1" not in recs[0]["html"]  # envelope stripped


def test_parser_truncated_tail(tmp_path):
    p = str(tmp_path / "a.warc")
    write_synth_warc(p, 3)
    with open(p, "rb") as f:
        data = f.read()
    # chop mid-record: parser must yield the intact prefix, not raise
    recs = list(parse_warc_records(data[: len(data) - 40]))
    assert len(recs) == 2


def test_incremental_parse_matches_whole_bytes(tmp_path):
    """The rolling-buffer scanner fed 1 KB chunks must yield exactly the
    records the whole-bytes parse does (records straddle chunk edges)."""
    p = str(tmp_path / "a.warc")
    write_synth_warc(p, 12)
    with open(p, "rb") as f:
        data = f.read()
    whole = list(parse_warc_records(data))
    chunks = [data[i : i + 1024] for i in range(0, len(data), 1024)]
    assert len(chunks) > 3
    incr = list(iter_warc_records(chunks))
    assert incr == whole and len(incr) == 12


def test_gz_batches_bounded(tmp_path):
    """A multi-member .warc.gz above the byte cap must stream out in >1
    batch (the task-memory bound), with zero record loss vs the
    uncompressed parse — the decompressed file is never materialized."""
    p = str(tmp_path / "a.warc.gz")
    write_synth_warc(p, 30, compress=True)
    with open(p, "rb") as f:
        gz = f.read()
    batches = list(iter_warc_batches(gz, max_batch_bytes=8_000))
    assert len(batches) > 1
    total = [r for b in batches for r in b]
    pu = str(tmp_path / "a.warc")
    write_synth_warc(pu, 30)
    with open(pu, "rb") as f:
        expected = list(parse_warc_records(f.read()))
    assert [(u, t, h) for u, t, h in total] == [
        (r["url"], r["warc_ts"], r["html"]) for r in expected
    ]
    # every batch except possibly the last respects the cap (single
    # oversized records excepted — none here)
    for b in batches[:-1]:
        assert sum(len(h) for _, _, h in b) <= 8_000 or len(b) == 1


def test_gz_truncated_member_keeps_prefix(tmp_path):
    """A corrupt/truncated trailing gzip member ends the stream without
    raising; intact earlier members are kept."""
    p = str(tmp_path / "a.warc.gz")
    write_synth_warc(p, 6, compress=True)
    with open(p, "rb") as f:
        gz = f.read()
    recs = [r for b in iter_warc_batches(gz[:-25]) for r in b]
    assert 1 <= len(recs) < 6


def test_read_warc_to_pages_and_extract(spark, tmp_path):
    from htmlcleanup_spark.engine import clean_html
    from htmlcleanup_spark.plans.extract import run_extract
    from htmlcleanup_spark.sources.pages import make_html

    d = tmp_path / "warcs"
    d.mkdir()
    write_synth_warc(str(d / "seg-0.warc"), 8)
    write_synth_warc(str(d / "seg-1.warc.gz"), 8, compress=True)
    pages = read_warc(spark, str(d))
    assert pages.count() == 16
    row = pages.filter("url = 'https://host3.example/p/3'").first()
    assert bytes(row.html) == make_html(3, 42)
    assert row.warc_ts is not None

    out = str(tmp_path / "out")
    m = run_extract(spark, pages, output_path=out, num_partitions=2)
    assert m["docs_out"] == 8  # urls dedupe across the two identical segs
    got = {
        r["url"]: r["text"]
        for r in spark.read.parquet(out + "/data").collect()
    }
    for i in (0, 5):
        local = clean_html(make_html(i, 42))
        assert got["https://host%d.example/p/%d" % (i, i)] == local.text


def test_revisit_dedup_semantics(spark):
    from htmlcleanup_spark.sources.warc import revisit_dedup

    caps = spark.createDataFrame(
        [
            ("u1", 10, "dA", 500),
            ("u2", 20, "dA", 500),   # same payload, later -> revisit
            ("u1", 30, "dA", 500),   # recrawl, unchanged -> revisit
            ("u3", 15, "dB", 700),   # unique payload -> response
        ],
        "urlkey string, ts long, digest string, length long",
    )
    rows = {(r.urlkey, r.ts): r for r in revisit_dedup(caps).collect()}
    orig = rows[("u1", 10)]
    assert orig.warc_type == "response" and orig.saved_bytes == 0
    assert orig.refers_to_urlkey is None and orig.refers_to_ts is None
    for k in [("u2", 20), ("u1", 30)]:
        r = rows[k]
        assert r.warc_type == "revisit"
        assert (r.refers_to_urlkey, r.refers_to_ts) == ("u1", 10)
        assert r.saved_bytes == 500
    assert rows[("u3", 15)].warc_type == "response"


def test_revisit_dedup_plan_digest_keyed_no_window(spark):
    from htmlcleanup_spark.sources.warc import revisit_dedup
    import re

    caps = spark.createDataFrame(
        [("u%d" % i, i, "d%d" % (i % 3), 100) for i in range(30)],
        "urlkey string, ts long, digest string, length long",
    )
    plan = (
        revisit_dedup(caps)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "SinglePartition" not in plan
    assert re.search(r"hashpartitioning\(digest#\d+", plan)


def test_warc_captures_plain_coordinates_roundtrip(tmp_path):
    from htmlcleanup_spark.sources.warc import (
        _scan_one, iter_warc_captures, write_synth_warc)

    p = tmp_path / "seg.warc"
    write_synth_warc(str(p), 6)
    raw = p.read_bytes()
    caps = list(iter_warc_captures(raw, "seg.warc"))
    assert len(caps) == 6
    for url, ts, mime, st, dg, ln, off, fn in caps:
        assert mime == "text/html" and st == 200 and fn == "seg.warc"
        assert len(ts) == 14 and ts.startswith("20240101")
        rec, _, status = _scan_one(
            raw[off:off + ln], 0, True, frozenset((b"response",)))
        assert status == "ok" and rec["url"] == url


def test_warc_captures_gz_member_ranged_get(tmp_path):
    import hashlib
    import zlib

    from htmlcleanup_spark.sources.warc import (
        _scan_one, iter_warc_captures, write_synth_warc)

    p = tmp_path / "seg.warc.gz"
    write_synth_warc(str(p), 6, compress=True)
    raw = p.read_bytes()
    caps = list(iter_warc_captures(raw, "seg.warc.gz"))
    assert len(caps) == 6
    # the (offset, length) span must be exactly one gunzip-able member
    # whose payload digest matches — the ranged-GET contract
    for url, ts, mime, st, dg, ln, off, fn in caps:
        data = zlib.decompress(raw[off:off + ln], 31)
        rec, _, status = _scan_one(
            data, 0, True, frozenset((b"response",)))
        assert status == "ok" and rec["url"] == url
        assert hashlib.md5(rec["html"]).hexdigest() == dg
    # spans tile the file exactly (warcinfo member precedes the first)
    assert caps[0][6] > 0
    for a, b in zip(caps, caps[1:]):
        assert a[6] + a[5] == b[6]
    assert caps[-1][6] + caps[-1][5] == len(raw)


def test_warc_captures_truncated_tail_keeps_prefix(tmp_path):
    from htmlcleanup_spark.sources.warc import (
        iter_warc_captures, write_synth_warc)

    p = tmp_path / "seg.warc"
    write_synth_warc(str(p), 4)
    raw = p.read_bytes()
    assert len(list(iter_warc_captures(raw[:-300], ""))) == 3
    pg = tmp_path / "seg.warc.gz"
    write_synth_warc(str(pg), 4, compress=True)
    rawg = pg.read_bytes()
    assert len(list(iter_warc_captures(rawg[:-50], ""))) == 3
