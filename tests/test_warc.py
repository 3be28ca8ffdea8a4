"""WARC source: pure-parser unit tests + Spark ingestion to the pages
shape, ending in the extraction pipeline (byte-identical vs local engine)."""

from __future__ import annotations

import pytest

from htmlcleanup_spark.sources.warc import (
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
