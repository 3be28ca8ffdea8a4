"""Structured Streaming extract: availableNow drain over a file source."""

from __future__ import annotations

import pytest

from htmlcleanup_spark.sources.pages import make_html, synth_pages
from htmlcleanup_spark.streaming.extract_stream import run_extract_stream

pytestmark = pytest.mark.spark


def test_stream_drains_backlog_and_resumes(spark, tmp_path):
    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    synth_pages(spark, 30, num_partitions=2, dup_every=0).write.mode(
        "append"
    ).parquet(src)

    q = run_extract_stream(spark, src, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 30
    assert got.filter("error is not null").count() == 0

    # new files arrive; restart from checkpoint processes only the delta
    # (urls 30..49 — disjoint from the first batch)
    synth_pages(spark, 50, num_partitions=2, dup_every=0).filter(
        "cast(element_at(split(url, '/'), -1) as int) >= 30"
    ).write.mode("append").parquet(src)
    q2 = run_extract_stream(spark, src, out, ckpt)
    q2.awaitTermination(120)
    total = spark.read.parquet(out).count()
    assert total > 30  # delta processed
    # no url processed twice with identical warc_ts (exactly-once per file)
    dups = (
        spark.read.parquet(out)
        .groupBy("url", "warc_ts")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dups == 0
