"""The CDC ingest pipeline: change-stream tail → decode → LWW → MERGE.

Structured-Streaming-native replacement for the reference's imperative
pipeline loop (``boxing/run_pipeline.py:42-51`` load →
``boxing/load/to_staging_mirror_db.py:379-395``): one declarative lineage per
microbatch —

    readStream(change log)                       # checkpointed offsets
      → decode (vectorized pandas UDFs: html→text, lang fill)
      → repartition by key                       # co-locate for the merge join
      → LakeTable.merge (LWW dedup + keyed upsert + tombstone deletes)
      → lineage row per bucket                   # offset range, counts, bytes

Exactly-once: the streaming checkpoint makes batch ids stable across retries,
and ``LakeTable.merge`` skips batch ids already in the snapshot ledger, so a
re-delivered microbatch is a no-op — replay from any checkpoint converges to
the same table state (proved by tests/test_replay.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_spark.extract.html import html_to_text
from data_pipelines_spark.lake import LakeTable, MergeStats

LINEAGE_SCHEMA = (
    "batch_id long, bucket int, rows long, tombstones long, "
    "offset_min long, offset_max long, rows_in long, rows_upserted long, "
    "rows_deleted long, bytes_written long, commit_version long, files_written int"
)


@dataclass
class PipelineConfig:
    table_root: str
    key: str = "url"
    seq_cols: tuple[str, ...] = ("warc_ts", "offset")
    n_buckets: int = 16
    decode: bool = True
    merge_partitions: int | None = None  # repartition width ahead of the merge


class CdcPipeline:
    """Drives change batches into a :class:`LakeTable` with lineage."""

    def __init__(self, spark: SparkSession, cfg: PipelineConfig):
        self.spark = spark
        self.cfg = cfg
        self.table = LakeTable.create(
            spark,
            cfg.table_root,
            key=cfg.key,
            seq_cols=cfg.seq_cols,
            n_buckets=cfg.n_buckets,
        )
        self._lineage_dir = os.path.join(cfg.table_root, "_lineage")

    # ------------------------------------------------------------- transform

    def decode(self, batch: DataFrame) -> DataFrame:
        """Vectorized decode: extracted ``text`` (byte-identical invariant) and
        ``lang`` backfill from the page itself when the stream omits it.

        All pandas/Arrow — no per-row Python (input_hint invariant). Deletes
        (null html) pass through with null text.
        """
        out = batch.withColumn("text", html_to_text(F.col("html")))
        out = out.withColumn(
            "lang",
            F.coalesce(
                F.col("lang"),
                F.regexp_extract(F.col("html").cast("string"), 'lang="([a-z]{2})"', 1),
            ),
        )
        return out

    # ----------------------------------------------------------------- merge

    def process_batch(self, batch: DataFrame, batch_id: int) -> MergeStats:
        """foreachBatch body: decode → pre-partition by key → merge → lineage."""
        if self.cfg.decode:
            batch = self.decode(batch)
        width = self.cfg.merge_partitions or int(
            self.spark.conf.get("spark.sql.shuffle.partitions")
        )
        batch = batch.repartition(width, F.col(self.cfg.key))
        stats = self.table.merge(batch, batch_id=batch_id)
        if not stats.skipped_duplicate_batch:
            # the merge's pre-aggregation already recorded the offset span
            self._write_lineage(stats, stats.seq_min, stats.seq_max)
        return stats

    def _write_lineage(self, s: MergeStats, lo, hi) -> None:
        rows = [
            (
                s.batch_id,
                b,
                p["rows"],
                p["tombstones"],
                lo,
                hi,
                s.rows_in,
                s.rows_upserted,
                s.rows_deleted,
                s.bytes_written,
                s.committed_version,
                s.files_written,
            )
            for b, p in (s.per_bucket.items() or {-1: {"rows": 0, "tombstones": 0}}.items())
        ] or [(s.batch_id, -1, 0, 0, lo, hi, 0, 0, 0, 0, s.committed_version, 0)]
        (
            self.spark.createDataFrame(rows, LINEAGE_SCHEMA)
            .coalesce(1)
            .write.mode("append")
            .parquet(self._lineage_dir)
        )

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(self._lineage_dir)

    # ------------------------------------------------------------- streaming

    def run_stream(
        self,
        source_dir: str,
        checkpoint_dir: str,
        source_schema,
        max_files_per_trigger: int = 1,
    ):
        """Tail the change-log directory as a file-source stream.

        ``availableNow`` trigger: drains everything currently in the log in
        ``maxFilesPerTrigger``-sized microbatches then stops — deterministic
        for tests; a production deployment would use a processing-time
        trigger (or a Kafka source) with the identical foreachBatch body.
        """
        stream = (
            self.spark.readStream.schema(source_schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir)
        )
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def run_batches(self, changes: DataFrame, n_batches: int, start_batch_id: int = 0):
        """Batch-mode replay: slice the log into offset ranges and merge each.

        Used by the equivalence tests to prove batch slicing is irrelevant to
        the final state (same result for any n_batches).
        """
        lo_hi = changes.agg(F.min("offset"), F.max("offset")).collect()[0]
        lo, hi = lo_hi[0], lo_hi[1]
        if lo is None:
            return []
        step = max(1, (hi - lo + 1) // n_batches)
        out = []
        for i in range(n_batches):
            a = lo + i * step
            b = hi + 1 if i == n_batches - 1 else lo + (i + 1) * step
            sl = changes.where((F.col("offset") >= a) & (F.col("offset") < b))
            out.append(self.process_batch(sl, batch_id=start_batch_id + i))
        return out
