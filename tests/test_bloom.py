"""Bloom-filter incremental dedup: no false negatives, sparse sketch,
bounded FP at design capacity, and the exact-join escape hatch."""
import pytest
from pyspark.sql import functions as F


def test_bloom_no_false_negatives_and_sparse(spark):
    from htmlcleanup_spark.operators.bloom import bloom_build, bloom_probe

    hist = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "digest string"
    )
    bloom = bloom_build(hist, "digest", m_bits=1 << 20, k=4)
    # sparse sketch: at most k * n words materialize
    assert bloom.count() <= 12

    probe = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (3, "definitely-new-key")],
        "doc_id long, digest string",
    )
    out = {r.doc_id: r.maybe_seen for r in bloom_probe(
        probe, bloom, "digest", "doc_id", m_bits=1 << 20, k=4
    ).collect()}
    assert out[0] and out[1] and out[2]       # every history key: seen
    assert not out[3]                          # 1M bits, 12 set: no FP


def test_bloom_fp_rate_at_capacity(spark):
    """At ~0.5 fill the FP rate must be visible but far below 1: the
    definitely-new band stays usable."""
    from htmlcleanup_spark.operators.bloom import bloom_dedup

    hist = spark.range(400).select(
        F.md5(F.col("id").cast("string")).alias("digest")
    )
    new = spark.range(1000, 1200).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("digest"),
    )
    out = bloom_dedup(new, hist, m_bits=2048, k=4)
    n_fp = out.filter("maybe_seen").count()
    assert 0 < n_fp < 100   # deterministic; ~9% of 200 expected
