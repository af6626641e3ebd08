"""Token-budget corpus sharding — the export stage of a training-data
pipeline: pack documents into fixed-token-budget shards in a deterministic
global order, without a single-partition global window.

The reference ships its corpus to one SQLite/staging file per run
(``boxing/load/to_staging_mirror_db.py``); at 100 TB the analogous operation
is "write the corpus as N ~equal-token shards with a stable manifest", which
is what a trainer's data loader consumes. The naive Spark formulation —
``sum(tokens) OVER (ORDER BY ord)`` — collapses the whole corpus into one
task; this module computes the identical running total with the classic
two-phase distributed prefix sum:

1. a deterministic order key (md5 of the document key) whose first byte also
   yields ``n_buckets`` *ordered, balanced* segments of the global order —
   no RangePartitioner sampling, fully reproducible;
2. per-segment token sums, prefix-summed driver-side (O(n_buckets) rows);
3. a within-segment window cumsum + the broadcast segment offset.

Cost: one partial-agg shuffle (256 rows out) + one window shuffle/sort of
corpus/256-row segments — both spill-safe, no driver row loops. The input is
scanned twice (once per phase); persist upstream if it is expensive to
recompute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["assign_shards", "write_shards", "shard_manifest"]


def _order_key(key: Column) -> Column:
    return F.md5(key.cast("string"))


def assign_shards(
    df: DataFrame,
    tokens_per_shard: int,
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    n_buckets: int = 256,
    with_positions: bool = False,
) -> DataFrame:
    """Add ``shard_id``: documents packed into ``tokens_per_shard`` budgets.

    Documents are laid out in md5(key) order (a deterministic corpus
    shuffle — neighbors in the source ordering land in different shards,
    which is what a pre-shuffled training corpus wants), then
    ``shard_id = floor(running_total_before_doc / tokens_per_shard)``.
    Documents never split: a shard overflows its budget by at most one
    document. Deterministic for a given input set — independent of input
    partitioning, cluster size, or execution order.

    ``n_buckets`` is the prefix-sum fan-out (first byte of the md5 → 256
    ordered segments); raise it (two bytes → 65536) only if corpus/256
    exceeds a comfortable per-task sort.
    """
    if tokens_per_shard <= 0:
        raise ValueError("tokens_per_shard must be positive")
    if n_buckets == 256:
        seg = F.conv(F.substring(_order_key(F.col(key_col)), 1, 2), 16, 10).cast("int")
    elif n_buckets == 65536:
        seg = F.conv(F.substring(_order_key(F.col(key_col)), 1, 4), 16, 10).cast("int")
    else:
        raise ValueError("n_buckets must be 256 or 65536 (md5 prefix bytes)")
    tagged = df.withColumn("_ord", _order_key(F.col(key_col))).withColumn("_seg", seg)
    # phase 1: per-segment totals → driver prefix sum (n_buckets rows)
    sums = {
        r["_seg"]: r["t"]
        for r in tagged.groupBy("_seg").agg(F.sum(token_col).alias("t")).collect()
    }
    offsets, running = [], 0
    for s in range(n_buckets):
        offsets.append((s, running))
        running += int(sums.get(s, 0) or 0)
    off_df = F.broadcast(
        tagged.sparkSession.createDataFrame(offsets, "_seg int, _seg_offset long")
    )
    # phase 2: within-segment cumsum + broadcast offset
    w = (
        Window.partitionBy("_seg")
        .orderBy("_ord", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w) + F.col("_seg_offset")
    start = cum - F.col(token_col)  # running total BEFORE this document
    out = tagged.join(off_df, "_seg").withColumn(
        "shard_id", F.floor(start / F.lit(tokens_per_shard)).cast("int")
    )
    if with_positions:
        # sample packing: where inside its shard's token budget this
        # document starts — the loader's concat-and-chunk offset. A shard's
        # LAST document may overflow the budget (documents never split), so
        # pack_start + n_tokens can exceed tokens_per_shard by design.
        out = out.withColumn(
            "pack_start",
            (start - F.col("shard_id").cast("long") * tokens_per_shard).cast("long"),
        )
    return out.drop("_ord", "_seg", "_seg_offset")


def write_shards(
    df: DataFrame,
    path: str,
    tokens_per_shard: int,
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
) -> None:
    """Materialize the corpus as ``shard_id=N/`` parquet directories.

    Rows arrive at the writer clustered by segment and shard boundaries
    follow segment order, so each task writes a handful of shard
    directories — no extra repartition needed.
    """
    assign_shards(
        df, tokens_per_shard, token_col=token_col, key_col=key_col
    ).write.partitionBy("shard_id").mode("overwrite").parquet(path)


def shard_manifest(sharded: DataFrame, token_col: str = "n_tokens") -> DataFrame:
    """Per-shard manifest (docs, token total) — the loader's index."""
    return sharded.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(token_col)).alias("tokens"),
    )
