#!/usr/bin/env python
"""Capture explain('formatted') for the r06-touched queries.

Usage: python scripts/capture_plans_r06.py <repo_dir> <suffix>
Writes plans/r06/<query>_<suffix>.txt under THIS repo (cwd's plans dir).
"""
import os
import sys

repo_dir, suffix = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo_dir)

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r06")
os.makedirs(OUT, exist_ok=True)

QUERIES = [
    "minhash_signatures", "lsh_candidate_pairs", "ngram_jaccard_pairs",
    "dedup_exact", "repetition_signals", "trigram_backoff",
    "bigram_perplexity", "dsir_weights", "quality_signals",
    "training_corpus_v2", "training_corpus_v3", "training_corpus_v4",
    "training_corpus_v5", "quality_survivors", "lsh_recall",
    "line_dedup", "host_boilerplate", "dedup_clusters",
    "ngram_jaccard_lsh", "paragraph_dedup", "cross_corpus_lsh",
    "bm25_topk", "tfidf_terms", "c4_rules", "badwords",
    "refinedweb_lines",
]

import bench  # noqa: E402  (the frozen session recipe)
import __spark_entry__ as entry  # noqa: E402

spark = bench.make_session(8)
qs = entry.queries()
for name in QUERIES:
    try:
        df = qs[name](spark, "/root/testdata/sf0.001")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
    except Exception as ex:  # noqa: BLE001
        plan = "PLAN CAPTURE FAILED: %r" % ex
    with open(os.path.join(OUT, "%s_%s.txt" % (name, suffix)), "w") as fh:
        fh.write(plan)
    print(name, "ok")
spark.stop()
