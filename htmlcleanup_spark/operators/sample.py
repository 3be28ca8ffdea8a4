"""Deterministic corpus sampling (training-data mixing layer).

Data-mixing recipes ("2 parts web, 1 part code, 0.5 parts forums...") need
per-stratum sampling that is (a) reproducible run-to-run and machine-to-
machine, (b) a pure FILTER — no shuffle, no RNG state, no sort — so it
composes with any upstream plan at 10^12 rows, and (c) auditable in SQL.

The trick: a row's inclusion is decided by comparing a fixed-width prefix of
md5(salt || id) against a per-stratum hex threshold.  md5 output is uniform,
the comparison is plain ASCII string ordering (identical in every engine),
and the threshold for rate r is the first 8 hex digits of r * 16^8 — no
float parsing, no engine-specific RNG, bit-identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PREFIX_NIBBLES = 8  # 32 bits of hash -> rate resolution ~2.3e-10


def rate_threshold_hex(rate: float) -> str:
    """First-8-hex-digit threshold for Bernoulli rate ``rate`` in [0, 1]."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1], got %r" % rate)
    return "%08x" % min(int(rate * 16 ** _PREFIX_NIBBLES),
                        16 ** _PREFIX_NIBBLES - 1)


def sample_key(id_col: str, salt: str) -> Column:
    """The uniform selector: first 8 hex chars of md5(salt || ':' || id)."""
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))),
        1,
        _PREFIX_NIBBLES,
    )

def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strat_col: str = "lang", id_col: str = "doc_id",
                      salt: str = "v1",
                      default_rate: float = 0.0) -> DataFrame:
    """Keep each row with its stratum's Bernoulli rate, deterministically.

    ``rates`` maps stratum value -> keep probability; strata absent from the
    map get ``default_rate``.  Changing ``salt`` redraws the sample;
    keeping it fixes the sample across runs/retries (critical for resumable
    jobs: a retried partition must select the SAME rows).

    Pure column filter — Catalyst pushes it into the scan, no shuffle, no
    per-partition RNG seeding to get wrong.  Stratum rates compile to a
    CASE over threshold literals; the SQL oracle generates the same CASE
    from the same dict.
    """
    thresh = F.lit(rate_threshold_hex(default_rate))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strat_col) == value, F.lit(rate_threshold_hex(rate))
        ).otherwise(thresh)
    return df.filter(sample_key(id_col, salt) < thresh)


def domain_caps(df: DataFrame, host_col: str = "host", cap: int = 5,
                order_col: str = "n_chars",
                id_col: str = "doc_id") -> DataFrame:
    """Per-domain document cap (the RefinedWeb / MassiveText practice):
    keep at most ``cap`` documents per host, preferring high ``order_col``
    (quality score, length, ...), ties broken by ``id_col`` ascending so
    the selection is total-ordered and reproducible.

    ONE shuffle on the host key; the per-host window never materializes
    more than a partition's rows, and the rank filter drops losers before
    anything downstream.  Host skew (the giant-domain problem: a single
    host with 10^8 pages) is bounded by the window itself — row_number
    short-circuits nothing, so for pathological hosts pre-filter with an
    approximate per-host count and a cheap hash-sample before ranking;
    at test scale the plain window is exact and oracle-checkable.

    Returns the input columns plus ``host_rank`` (1-based within host).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(host_col).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= cap)
    )


def token_budget_sample(df: DataFrame, budget_tokens: int,
                        priority_col: str = "n_chars",
                        id_col: str = "doc_id",
                        token_col: str | None = None,
                        text_col: str = "text",
                        stratum_col: str | None = None) -> DataFrame:
    """Select documents to fill a token budget: order by (priority DESC,
    id ASC) and keep the prefix whose RUNNING token total stays within
    ``budget_tokens`` (the data-mixing step "give me the best N-billion
    tokens of this source").

    The cut is prefix-inclusive: a doc is kept iff the running sum UP TO
    AND INCLUDING it is <= budget, so the selection is a deterministic
    function of the total order — retry-stable and engine-independent.

    ``stratum_col`` is the corpus-scale path: the budget applies PER
    STRATUM (each source gets ``budget_tokens`` of its own) and the
    window partitions by the stratum, so the shuffle is stratum-keyed
    and no single task ever sorts the whole corpus.  Without it the
    window is one global total order — validation scale only (fine to
    ~10^8 docs); at corpus scale either stratify or pre-cut with a
    priority threshold from approxQuantile and budget only the boundary
    stratum — the operator composes unchanged.

    Returns the input plus ``n_tokens`` and ``cum_tokens``.
    """
    from pyspark.sql.window import Window

    n_tok = (
        F.col(token_col)
        if token_col is not None
        else F.size(F.split(F.col(text_col), " "))
    )
    base_w = (
        Window.partitionBy(stratum_col)
        if stratum_col is not None
        else Window
    )
    w = base_w.orderBy(
        F.col(priority_col).desc(), F.col(id_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
    )


def pack_sequences(df: DataFrame, seq_len: int = 2048,
                   text_col: str = "text", id_col: str = "doc_id",
                   shard_col: str | None = None) -> DataFrame:
    """GPT-style training-sequence packing: concatenate documents in
    (shard, id) order and cut the token stream into fixed ``seq_len``
    windows.  Returns per document (shard, id, n_tokens, seq_id,
    offset): the sequence its FIRST token lands in and the offset
    within it — exactly what a loader needs to materialize packed
    examples (a document spanning a boundary continues into seq_id+1,
    the concatenate-then-chunk semantics of GPT/Pile training).

    All integer arithmetic over one running-sum window.  With
    ``shard_col`` (the corpus-scale path) packing is per shard — the
    window partitions by shard, so the shuffle is shard-keyed and
    shards pack in parallel, trading a per-shard partial final
    sequence for a scale-free plan; without it the window is a global
    total order (validation scale only, like token_budget_sample)."""
    from pyspark.sql.window import Window

    toks = F.size(F.split(F.col(text_col), " "))
    if shard_col is not None:
        w = Window.partitionBy(shard_col).orderBy(F.col(id_col).asc())
        cols = [shard_col, id_col]
    else:
        w = Window.orderBy(F.col(id_col).asc())
        cols = [id_col]
    base = df.select(*cols, toks.alias("n_tokens"))
    cum_prev = F.coalesce(
        F.sum("n_tokens").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return base.select(
        *cols, "n_tokens",
        cum_prev.alias("_cum"),
    ).select(
        *cols, "n_tokens",
        F.expr("_cum div %d" % seq_len).alias("seq_id"),
        (F.col("_cum") % seq_len).alias("offset"),
    )


def mixture_sample(df: DataFrame, weights: dict[str, float],
                   source_col: str = "source", id_col: str = "doc_id",
                   salt: str = "mix",
                   bucket_nibbles: int = 2) -> DataFrame:
    """Deterministic corpus mixing: select per-source subsets whose
    sizes realize the target ``weights`` EXACTLY (to floor rounding),
    at the largest total the pool supports:

        T = min over s of floor(n_s / w_s);   take_s = floor(w_s * T)

    A weights-listed source with ZERO pool rows yields T = 0 and an
    empty result (the promised proportions are unrealizable), never a
    silently re-proportioned sample.

    Within a source the selection is the md5-smallest documents — the
    repo's seedless uniform sample, so re-runs and the SQL twin pick
    identical rows.

    Scale: a mixture has FEW sources (3-10), so a rank window keyed by
    source alone is a giant-partition scale-killer at 10^12 rows (and
    AQE cannot split WINDOW partitions — its skew handling covers
    joins/rebalance only).  Instead the global per-source rank is
    assembled from a two-level bucketed rank, exactly:

      bucket   = first ``bucket_nibbles`` hex chars of the md5 key
                 (lexicographic on the key, so every key in bucket b
                 sorts before every key in bucket b+1);
      local    = row_number within (source, bucket) — 16^nibbles-way
                 split of each source's window partition;
      offset   = rows in the source's smaller buckets (a per-source
                 running sum over the TINY (source, bucket) count
                 table, broadcast back);
      rank     = offset + local  — identical to the single-window rank.

    Big-data shuffles are all keyed (source, bucket): the count groupBy
    (map-combined, 16^nibbles rows per source out) and the rank window.
    Raise ``bucket_nibbles`` to 4 (65536 buckets) at corpus scale so a
    dominant source's window partitions stay ~n_s/65536 rows."""
    from pyspark.sql.window import Window

    srcs = sorted(weights)
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(s, float(weights[s])) for s in srcs], "_src string, _w double"
    )
    key = F.md5(
        F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
    )
    pool = (
        df.filter(F.col(source_col).isin(srcs))
        .withColumn("_mx_key", key)
        .withColumn("_mx_bkt", F.substring("_mx_key", 1, bucket_nibbles))
    )
    # tiny side tables: per-(source, bucket) counts -> per-source offsets
    # and totals; a weights-listed source absent from the pool keeps a
    # 0 count via the LEFT join from the weights table.
    bcounts = pool.groupBy(source_col, "_mx_bkt").agg(
        F.count("*").alias("_bn")
    )
    w_off = (
        Window.partitionBy(source_col)
        .orderBy(F.col("_mx_bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bcounts.select(
        source_col, "_mx_bkt",
        F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_mx_off"),
    )
    counts = bcounts.groupBy(source_col).agg(F.sum("_bn").alias("_n"))
    # T = min_s floor(n_s / w_s) over ALL weighted sources (1-row agg)
    t_expr = (
        wdf.join(counts, wdf["_src"] == counts[source_col], "left")
        .select(
            F.floor(
                F.coalesce(F.col("_n"), F.lit(0)).cast("double")
                / F.col("_w")
            ).cast("long").alias("_cap")
        )
        .agg(F.min("_cap").alias("_t"))
    )
    rk_local = Window.partitionBy(source_col, "_mx_bkt").orderBy(
        F.col("_mx_key").asc(), F.col(id_col).asc()
    )
    take = F.coalesce(
        *[
            F.when(F.col(source_col) == s,
                   F.floor(F.lit(weights[s]) * F.col("_t")).cast("long"))
            for s in srcs
        ]
    )
    return (
        pool.withColumn("_rk_local", F.row_number().over(rk_local))
        .join(F.broadcast(offsets), [source_col, "_mx_bkt"])
        .crossJoin(F.broadcast(t_expr))
        .filter(F.col("_mx_off") + F.col("_rk_local") <= take)
        .select(id_col, source_col)
    )


def holdout_split(df: DataFrame, fractions: dict[str, float],
                  group_col: str = "host",
                  salt: str = "split") -> DataFrame:
    """Leakage-safe train/valid/test assignment: the split key is the
    md5 of the GROUP (host/domain), not the document, so every page of
    a host lands in the SAME split.  Splitting at document granularity
    leaks near-duplicates (boilerplate twins, template pages, mirrored
    articles cluster within hosts) from train into the eval split and
    inflates held-out metrics — the standard fix is group-level
    assignment (cf. GroupKFold / FineWeb's host-level holdout).

    ``fractions`` maps split name -> probability mass in the given
    order; they must sum to ~1.  Assignment compares the first 8 hex
    chars of md5(salt ':' group) against CUMULATIVE thresholds (the
    same fixed-width-prefix trick as :func:`stratified_sample`), so it
    is seedless, retry-stable and bit-identical in any SQL engine.

    Scale: a pure projection — zero shuffle, no per-group state, works
    unchanged at 10^12 rows; downstream split filters push down to the
    scan.  Returns the input plus a ``split`` column.
    """
    names = list(fractions)
    if not names:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1, got %r" % total)
    key = F.substring(
        F.md5(F.concat_ws(":", F.lit(salt),
                          F.col(group_col).cast("string"))),
        1, _PREFIX_NIBBLES,
    )
    expr = F.lit(names[-1])  # last split absorbs rounding tail
    cum = 0.0
    bands = []
    for name in names[:-1]:
        cum += fractions[name]
        bands.append((name, rate_threshold_hex(min(cum, 1.0))))
    for name, thresh in reversed(bands):
        expr = F.when(key < F.lit(thresh), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def unimax_sample(df: DataFrame, total_budget: int,
                  epoch_cap: float = 1.0, lang_col: str = "lang",
                  id_col: str = "doc_id", salt: str = "unimax",
                  bucket_nibbles: int = 2,
                  max_groups: int = 100_000) -> DataFrame:
    """UniMax language sampling (Chung et al., ICLR 2023): fill a total
    document budget as UNIFORMLY across languages as the per-language
    epoch cap allows.  Languages ascending by size each receive

        take_l = min( floor(epoch_cap * n_l),  U // L_remaining )

    where U is the budget still unallocated — small languages take
    their cap, the freed budget water-fills up to the large ones.  All
    arithmetic is integer (floor product, integer division), so the
    SQL twin (a recursive CTE walking the same ascending order)
    reproduces the allocation bit-for-bit.

    The allocation runs DRIVER-SIDE over the per-language count table —
    bounded by the number of languages (``max_groups`` guards against
    mis-keying on a high-cardinality column), never by corpus size.
    Selection within a language is the md5-smallest ``take_l`` docs via
    the same two-level bucketed rank as :func:`mixture_sample` (window
    partitions keyed (lang, bucket), never a whole language in one
    task); raise ``bucket_nibbles`` to 4 at corpus scale.

    Returns (id, lang) of the selected documents.
    """
    import math

    from pyspark.sql.window import Window

    counts = [
        (r[0], r[1])
        for r in df.groupBy(lang_col).agg(F.count("*").alias("n"))
        .collect()
    ]
    if len(counts) > max_groups:
        raise ValueError(
            "unimax_sample: %d groups exceeds max_groups=%d — is %r "
            "really a language column?" % (len(counts), max_groups,
                                           lang_col))
    counts.sort(key=lambda t: (t[1], t[0]))  # (n ASC, lang ASC)
    remaining = int(total_budget)
    allocs: dict[str, int] = {}
    for i, (lang, n) in enumerate(counts):
        left = len(counts) - i
        take = min(int(math.floor(epoch_cap * n)), remaining // left)
        allocs[lang] = take
        remaining -= take
    kept = sorted(l for l, t in allocs.items() if t > 0)
    if not kept:
        return df.select(F.col(id_col), F.col(lang_col)).limit(0)

    key = F.md5(
        F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
    )
    pool = (
        df.filter(F.col(lang_col).isin(kept))
        .select(id_col, lang_col)
        .withColumn("_ux_key", key)
        .withColumn("_ux_bkt", F.substring("_ux_key", 1, bucket_nibbles))
    )
    bcounts = pool.groupBy(lang_col, "_ux_bkt").agg(
        F.count("*").alias("_bn")
    )
    w_off = (
        Window.partitionBy(lang_col)
        .orderBy(F.col("_ux_bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bcounts.select(
        lang_col, "_ux_bkt",
        F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_ux_off"),
    )
    rk_local = Window.partitionBy(lang_col, "_ux_bkt").orderBy(
        F.col("_ux_key").asc(), F.col(id_col).asc()
    )
    take = F.coalesce(
        *[
            F.when(F.col(lang_col) == l, F.lit(allocs[l]))
            for l in kept
        ]
    ).cast("long")
    return (
        pool.withColumn("_rk_local", F.row_number().over(rk_local))
        .join(F.broadcast(offsets), [lang_col, "_ux_bkt"])
        .filter(F.col("_ux_off") + F.col("_rk_local") <= take)
        .select(id_col, lang_col)
    )
