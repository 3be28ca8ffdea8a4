"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.  All
  arithmetic is built-in column expressions (zip_with/aggregate), JVM-side.
- ``lsh_cosine_topk``: the scale path — random-hyperplane LSH buckets the
  corpus so each query scores only its bucket (probing all single-bit
  neighbors too).  Hyperplanes are a deterministic function of (seed, dim):
  no external state, reproducible across runs/executors.

Scale notes: brute force is a broadcast of Q query vectors against N corpus
rows — fine for small Q at any N (one pass, no shuffle beyond the final
top-k). LSH reduces the scored fraction to ~2^-bits per probe; at 10^12 rows
you'd also partition the corpus table by bucket so a query prunes scans.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cosine_np_udf():
    """Arrow-vectorized cosine (numpy) — the hot path.

    zip_with/aggregate lambdas are interpreted per element in Spark (no
    codegen for higher-order functions), so for wide vectors a pandas_udf
    doing one batched einsum beats the 'built-in' route by ~10-50x.
    float64 math matches a SQL oracle's double arithmetic to ~1 ulp; results
    are rounded downstream.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(q: pd.Series, v: pd.Series) -> pd.Series:
        qa = np.stack(q.to_numpy()).astype(np.float64)
        va = np.stack(v.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", qa, va)
        den = np.linalg.norm(qa, axis=1) * np.linalg.norm(va, axis=1)
        return pd.Series(num / den)

    return cos


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (norm(a) * norm(b))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_to: int = 4) -> DataFrame:
    """Exact top-k cosine neighbors for each query row.

    queries: DataFrame with (query_id, query_vec).  Returns
    (query_id, neighbor_id, cosine, rank); cosine rounded so a SQL oracle
    reproduces values despite float summation order.
    """
    joined = queries.crossJoin(
        F.broadcast(embeddings.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")
        )) if _should_broadcast(queries) else embeddings.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")
        )
    )
    cos = _cosine_np_udf()
    scored = joined.filter(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cos(F.col("query_vec"), F.col("_v")), round_to).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _should_broadcast(queries: DataFrame) -> bool:
    # Broadcasting the corpus side is only right when the *queries* side is
    # the big one; for the common few-queries case Spark broadcasts queries
    # automatically under AQE. Keep the plain cross join then.
    return False


def _hyperplanes(dim: int, bits: int, seed: int = 42):
    """Deterministic pseudo-random hyperplanes from md5(seed, bit, j)."""
    planes = []
    for b in range(bits):
        row = []
        for j in range(dim):
            h = hashlib.md5(
                ("%d:%d:%d" % (seed, b, j)).encode()
            ).digest()
            v = int.from_bytes(h[:8], "big", signed=True)
            row.append(v / float(1 << 63))  # [-1, 1)
        planes.append(row)
    return planes


def lsh_bucket_expr(vec_col: str, dim: int, bits: int = 8, seed: int = 42):
    """Column expr: the `bits`-bit random-hyperplane signature of a vector."""
    sig = None
    for b, plane in enumerate(_hyperplanes(dim, bits, seed)):
        arr = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = bit if sig is None else (sig + bit)
    return sig.cast("int")


def lsh_cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    dim: int = 64, bits: int = 8, seed: int = 42,
                    round_to: int = 4) -> DataFrame:
    """Approximate top-k: score only corpus rows in the query's LSH bucket
    or any bucket within Hamming distance 1 (multi-probe)."""
    corp = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_v"),
        lsh_bucket_expr(vec_col, dim, bits, seed).alias("bucket"),
    )
    q = queries.select(
        "query_id",
        "query_vec",
        lsh_bucket_expr("query_vec", dim, bits, seed).alias("q_bucket"),
    )
    # multi-probe: the bucket itself plus each single-bit flip
    probes = F.array(
        F.col("q_bucket"),
        *[F.col("q_bucket").bitwiseXOR(F.lit(1 << b)) for b in range(bits)]
    )
    q = q.withColumn("bucket", F.explode(probes))
    cos = _cosine_np_udf()
    scored = (
        q.join(corp, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cos(F.col("query_vec"), F.col("_v")), round_to)
            .alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             dim: int = 64, bits: int = 8,
                             seed: int = 42) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH blocking."""
    withb = embeddings.select(
        F.col(id_col), F.col(vec_col),
        lsh_bucket_expr(vec_col, dim, bits, seed).alias("bucket"),
    )
    a = withb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket"
    )
    b = withb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket"
    )
    cos = _cosine_np_udf()
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cos(F.col("va"), F.col("vb")), 4).alias("cosine"),
        )
        .distinct()
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF-flat: coarse quantizer -> inverted lists -> probe top lists
# ---------------------------------------------------------------------------

def ivf_centroids(embeddings: DataFrame, n_centroids: int = 16,
                  id_col: str = "vec_id", vec_col: str = "embedding"):
    """Deterministic coarse quantizer: the n_centroids corpus vectors with
    the smallest xxhash64(id) — a seedless uniform sample, reproducible
    across runs and executors.  Returns a unit-normalized numpy [C, dim].

    At 10^12 rows you'd train this with MLlib KMeans (kmeans||) on a
    sample instead; everything downstream is unchanged — the quantizer is
    just a [C, dim] matrix.
    """
    import numpy as np

    rows = (
        embeddings.select(
            F.col(vec_col).alias("_v"),
            F.xxhash64(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h")
        .limit(n_centroids)
        .collect()
    )
    c = np.stack([np.asarray(r["_v"], dtype=np.float64) for r in rows])
    return c / (np.linalg.norm(c, axis=1, keepdims=True) + 1e-12)


def _assign_udf(centroids, nprobe: int):
    """pandas_udf: top-``nprobe`` nearest centroid ids (by cosine) for each
    vector.  The [C, dim] matrix rides inside the serialized UDF closure —
    one copy per executor (for large C use an explicit broadcast)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def assign(v: pd.Series) -> pd.Series:
        va = np.stack(v.to_numpy()).astype(np.float64)
        va = va / (np.linalg.norm(va, axis=1, keepdims=True) + 1e-12)
        sims = va @ centroids.T
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype("int32")
        return pd.Series(list(top))

    return assign


def ivf_cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                    n_centroids: int = 16, nprobe: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    round_to: int = 4) -> DataFrame:
    """Approximate top-k via IVF-flat: each corpus vector lands in exactly
    one inverted list (nearest centroid); a query scores only the vectors
    in its ``nprobe`` nearest lists.

    Scanned fraction ~ nprobe / n_centroids.  At corpus scale, write the
    embedding table partitioned by ``list_id`` so the probe join prunes
    file scans instead of filtering rows.
    """
    cents = ivf_centroids(embeddings, n_centroids, id_col, vec_col)
    corp = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"),
        F.element_at(_assign_udf(cents, 1)(F.col(vec_col)), 1)
        .alias("list_id"),
    )
    q = queries.withColumn(
        "list_id", F.explode(_assign_udf(cents, nprobe)(F.col("query_vec")))
    )
    cos = _cosine_np_udf()
    scored = (
        q.join(corp, "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cos(F.col("query_vec"), F.col("_v")), round_to)
            .alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
