"""Distributed global rank / quantile bucketing — ORDER BY the whole corpus
without ever forming a single-partition window.

A training-data pipeline constantly needs "rank every document by quality
and act on the quantiles" (keep the top decile, mix buckets at fixed
ratios, curriculum-order the corpus). The naive Spark formulation —
``row_number() OVER (ORDER BY score)`` — has an empty PARTITION BY, so
Spark warns and collapses the corpus into ONE task. This module computes
the identical ranking with the same two-phase shape as
:mod:`operators.sharding` (which prefix-sums token budgets), but keyed by
*value range* instead of hash:

1. segment by fixed-width bins of the (bounded) order value — for scores in
   a known [lo, hi] this needs NO sampling pass and is fully deterministic
   (RangePartitioner would sample non-reproducibly);
2. per-segment counts → driver prefix sum (O(n_bins) rows);
3. within-segment ``row_number`` (ordered by value, then the tie-break key)
   + broadcast segment offset = the exact global rank 1..N.

``ntile`` falls out arithmetically: ``ntile(k) = floor((rank-1)·k/N) + 1``
(the standard identity), so quantile bucketing costs nothing beyond the
rank. Cost: one partial-agg shuffle (n_bins rows out) + one window
shuffle/sort of corpus/n_bins segments. Skew bound: a segment holds only
rows whose value falls in its bin — a single pathological value (all-equal
scores) degrades to one hot segment, the honest limit of value-range
partitioning (raise n_bins or pre-jitter the tie-break key upstream).
NULL order values are rejected fail-loud: a NULL has no well-defined rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_col: str,
    key_col: str,
    *,
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 1024,
    rank_col: str = "rank",
) -> tuple[DataFrame, int]:
    """Exact global row number 1..N by ``(order_col, key_col)`` ascending
    (``key_col`` must be unique — it makes the order total, so the result
    is deterministic).

    ``[lo, hi]`` must bound ``order_col`` (values at/above ``hi`` clamp into
    the last bin — correct, just less balanced). Returns ``(df+rank, N)``;
    N comes free from the phase-1 prefix sum (no extra count job).
    """
    if n_bins < 2:
        raise ValueError("n_bins must be ≥ 2")
    if not hi > lo:
        raise ValueError("hi must exceed lo")
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(order_col) - F.lit(lo)) / F.lit(width)).cast("int")
    # greatest/least IGNORE nulls (they return the largest non-null), so a
    # NULL score must be kept NULL explicitly to reach the fail-loud check
    seg = F.when(
        raw.isNull(), F.lit(None).cast("int")
    ).otherwise(F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)))
    tagged = df.withColumn("_seg", seg)
    counts = {
        r["_seg"]: r["c"]
        for r in tagged.groupBy("_seg").agg(F.count("*").alias("c")).collect()
    }
    if None in counts:
        raise ValueError(f"NULL {order_col!r} values have no rank — filter first")
    offsets, running = [], 0
    for s in range(n_bins):
        offsets.append((s, running))
        running += int(counts.get(s, 0))
    off = F.broadcast(
        df.sparkSession.createDataFrame(offsets, "_seg int, _off long")
    )
    w = Window.partitionBy("_seg").orderBy(F.col(order_col), F.col(key_col))
    ranked = (
        tagged.join(off, "_seg")
        .withColumn(rank_col, (F.row_number().over(w) + F.col("_off")).cast("long"))
        .drop("_seg", "_off")
    )
    return ranked, running


def ntile_buckets(
    df: DataFrame,
    order_col: str,
    key_col: str,
    k: int,
    *,
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 1024,
    bucket_col: str = "bucket",
) -> DataFrame:
    """SQL ``ntile(k) OVER (ORDER BY order_col, key_col)`` at corpus scale:
    exact global rank (above) + ntile's front-loaded bucket arithmetic
    (the first ``N mod k`` buckets hold ``ceil(N/k)`` rows, the rest
    ``floor(N/k)``) — bit-identical to the single-partition window,
    without the single partition."""
    if k < 1:
        raise ValueError("k must be ≥ 1")
    ranked, n = global_rank(
        df, order_col, key_col, lo=lo, hi=hi, n_bins=n_bins, rank_col="_rank"
    )
    big = n % k
    size_big = n // k + (1 if big else 0)
    size_small = max(n // k, 1)  # guard: k > N puts every row in branch one
    cut = big * size_big
    r0 = F.col("_rank") - 1
    bucket = (
        F.when(r0 < cut, F.floor(r0 / F.lit(max(size_big, 1))) + 1)
        .otherwise(F.lit(big) + F.floor((r0 - cut) / F.lit(size_small)) + 1)
        .cast("int")
    )
    return ranked.withColumn(bucket_col, bucket).drop("_rank")
