"""ANN scale-path quality gates: the approximate variants must hold a
recall floor against exact brute force (everything is deterministic —
centroids/hyperplanes derive from hashes, not RNG state)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def _emb_queries(spark):
    emb = spark.read.parquet(SF + "/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return emb, qs


def _recall(exact, approx) -> float:
    hits = exact.join(approx, ["query_id", "neighbor_id"]).count()
    return hits / exact.count()


def test_ivf_recall_floor(spark):
    from htmlcleanup_spark.operators import ann

    emb, qs = _emb_queries(spark)
    exact = ann.cosine_topk(emb, qs, k=10).select("query_id", "neighbor_id")
    approx = ann.ivf_cosine_topk(
        emb, qs, k=10, n_centroids=16, nprobe=8
    )
    # uniform random vectors are IVF's worst case: recall ~= scanned
    # fraction (nprobe/C = 0.5); measured 0.72 on this corpus
    assert _recall(exact, approx.select("query_id", "neighbor_id")) >= 0.6
    # shape contract: <= k rows per query, ranks contiguous from 1
    per_q = approx.groupBy("query_id").agg(
        F.count("*").alias("n"), F.max("rank").alias("mx")
    )
    assert per_q.filter("n != mx or n > 10").count() == 0


def test_ivf_corpus_vector_lands_in_one_list(spark):
    """Each corpus vector is indexed exactly once (inverted-list property):
    no duplicate (query, neighbor) rows before top-k."""
    from htmlcleanup_spark.operators import ann

    emb, qs = _emb_queries(spark)
    approx = ann.ivf_cosine_topk(emb, qs, k=10, n_centroids=16, nprobe=16)
    # probing ALL lists == exact brute force (recall 1.0)
    exact = ann.cosine_topk(emb, qs, k=10).select("query_id", "neighbor_id")
    assert _recall(exact, approx.select("query_id", "neighbor_id")) == 1.0
