"""Bloom-filter incremental dedup: probe a new batch of documents against
a compact bit-sketch of an already-ingested corpus, without joining the
full history.

The crawl-ingest problem this solves (reference scope: HtmlCleanup is a
one-shot CLI, so re-ingest dedup is the Spark-native extension of its
per-run semantics): each incremental WARC drop must be checked against
10^12 already-extracted pages.  A digest anti-join shuffles the full
history every run; a Bloom filter is built ONCE per epoch, is orders of
magnitude smaller than the digest column, and answers "definitely new"
/ "maybe seen" with a bounded false-positive rate and zero false
negatives — so `maybe_seen = false` rows are safe to ingest directly and
only the (tiny) maybe-seen remainder needs the exact anti-join.

Representation: a DataFrame of (word_idx BIGINT, word BIGINT) where bit
``pos % 32`` of ``word_idx = pos div 32`` is set for every probe position
``pos`` of every history key.  Only words with at least one set bit
materialize, so storage is ∝ min(set bits, m/32 words) — sparse while the
filter is young, dense-bounded at capacity.  Using 32 bits per 64-bit
word keeps every mask positive (no sign games), and both the position
arithmetic (md5 → first 15 hex chars → BIGINT, mod m) and the word OR
are exactly expressible in DuckDB, so the whole filter is SQL-oracle
checkable bit for bit — false positives included.

Scale shape (10^12-key history, 10^9-key batch):
- build: one explode (k rows/key) into a map-side-combined bit_or groupBy
  on word_idx — ONE shuffle whose key (md5-derived) is uniform by
  construction; no skew possible;
- probe: explode k positions, ONE join keyed on word_idx (broadcast when
  the filter fits — m/32 words × 16 B; e.g. m = 2^33 → 4 GiB table,
  bucket-join; m ≤ 2^30 → ≤ 512 MiB, broadcastable), then one doc-keyed
  bool_and agg;
- the filter parquet round-trips (write once per epoch, read per batch),
  so incremental runs never touch history rows at all.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_probe", "bloom_dedup"]


def _positions(key_col: str, m_bits: int, k: int, salt: str):
    """Array of k probe positions in [0, m): independent md5 draws
    (salt:i:key), 60 bits each, reduced mod m — the Spark∩DuckDB portable
    hash family used across the repo (sample, ivf, minhash oracles)."""
    return F.array(*[
        F.conv(
            F.substring(
                F.md5(F.concat_ws(
                    ":", F.lit(salt), F.lit(i).cast("string"),
                    F.col(key_col),
                )),
                1, 15,
            ),
            16, 10,
        ).cast("long") % m_bits
        for i in range(k)
    ])


def bloom_build(df: DataFrame, key_col: str = "digest",
                m_bits: int = 1 << 22, k: int = 4,
                salt: str = "v1") -> DataFrame:
    """Build the (word_idx, word) Bloom table over ``df``'s key column.
    One shuffle: explode k positions per key, bit_or-combine per 32-bit
    word (partial aggregation runs map-side)."""
    return (
        df.select(
            F.explode(_positions(key_col, m_bits, k, salt)).alias("pos")
        )
        .select(
            F.expr("pos div 32").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_probe(df: DataFrame, bloom: DataFrame, key_col: str = "digest",
                id_col: str = "doc_id", m_bits: int = 1 << 22, k: int = 4,
                salt: str = "v1", broadcast: bool = True) -> DataFrame:
    """Annotate ``df`` with ``maybe_seen``: true iff ALL k probe bits for
    the key are set in ``bloom`` (classic Bloom semantics — no false
    negatives, deterministic false positives).  ``m_bits``/``k``/``salt``
    must match the build call."""
    b = F.broadcast(bloom) if broadcast else bloom
    probes = (
        df.select(id_col, key_col)
        .select(
            id_col,
            F.explode(_positions(key_col, m_bits, k, salt)).alias("pos"),
        )
        .select(
            id_col,
            F.expr("pos div 32").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"
            ).alias("mask"),
        )
    )
    seen = (
        probes.join(b, "word_idx", "left")
        .select(
            id_col,
            F.coalesce(
                (F.col("word").bitwiseAND(F.col("mask")) != 0),
                F.lit(False),
            ).alias("_bit"),
        )
        .groupBy(id_col)
        .agg(F.bool_and("_bit").alias("maybe_seen"))
    )
    return df.join(seen, id_col)


def bloom_dedup(new_df: DataFrame, history_df: DataFrame,
                key_col: str = "digest", id_col: str = "doc_id",
                m_bits: int = 1 << 22, k: int = 4,
                salt: str = "v1") -> DataFrame:
    """End-to-end incremental dedup: build the filter over the history's
    keys, probe the new batch, and return it annotated with
    ``maybe_seen``.  Callers ingest ``maybe_seen = false`` rows directly
    and route only the remainder to an exact digest anti-join — at a 1%
    FP rate that exact join touches 1% of the batch instead of the whole
    history."""
    bloom = bloom_build(
        history_df.select(key_col), key_col, m_bits, k, salt
    )
    return bloom_probe(new_df, bloom, key_col, id_col, m_bits, k, salt)
