"""streaming_lww_filter: the applyInPandasWithState change-only operator.

Proves (1) exact convergence — the emitted stream's per-key winner equals
the full-stream LWW oracle; (2) real reduction — duplicates/stale events are
absorbed; (3) the state store survives a query restart (checkpoint recovery)
with late segments arriving after the restart; (4) composition with the CDC
pipeline's MERGE sink.
"""

import os

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.gen.changegen import change_stream, write_change_log
from data_pipelines_spark.operators.lww import lww_latest
from data_pipelines_spark.streaming.stateful import streaming_lww_filter


def _drain(spark, schema, log_dir, out_dir, ckpt_dir):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(log_dir)
    )
    q = (
        streaming_lww_filter(stream, watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None


def test_streaming_lww_filter_converges_and_reduces(spark, tmp_root):
    changes = change_stream(spark, n_events=2000, n_keys=150, seed=11)
    log = os.path.join(tmp_root, "log")
    write_change_log(changes, log, n_segments=3)
    out = os.path.join(tmp_root, "out")
    _drain(spark, changes.schema, log, out, os.path.join(tmp_root, "ckpt"))

    emitted = spark.read.parquet(out)
    assert emitted.count() < changes.count()  # dups/stale absorbed
    a = lww_latest(emitted, "url", ("warc_ts", "offset")).select("url", "offset")
    b = lww_latest(changes, "url", ("warc_ts", "offset")).select("url", "offset")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_state_survives_restart_with_late_segments(spark, tmp_root):
    """First drain sees half the log; more segments land; a second drain from
    the same checkpoint must continue from recovered state — stale events in
    the late segments stay suppressed, new winners still emitted."""
    changes = change_stream(spark, n_events=2000, n_keys=150, seed=13).persist()
    first = changes.where(F.col("offset") < 1000)
    late = changes.where(F.col("offset") >= 1000)
    log = os.path.join(tmp_root, "log")
    out = os.path.join(tmp_root, "out")
    ckpt = os.path.join(tmp_root, "ckpt")

    write_change_log(first, log, n_segments=2)
    _drain(spark, changes.schema, log, out, ckpt)
    # append two more segments (new parquet files in the same dir)
    late.repartitionByRange(2, "offset").sortWithinPartitions("offset").write.mode(
        "append"
    ).parquet(log)
    _drain(spark, changes.schema, log, out, ckpt)

    emitted = spark.read.parquet(out)
    a = lww_latest(emitted, "url", ("warc_ts", "offset")).select("url", "offset")
    b = lww_latest(changes, "url", ("warc_ts", "offset")).select("url", "offset")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    changes.unpersist()


def test_stateful_filter_composes_with_merge(spark, tmp_root):
    """stateful_filter=True upstream of foreachBatch MERGE: final table state
    equals the batch-replay oracle (deletes removed)."""
    from data_pipelines_spark.gen.changegen import expected_final_state
    from data_pipelines_spark.streaming.pipeline import CdcPipeline, PipelineConfig

    changes = change_stream(spark, n_events=1500, n_keys=120, seed=17)
    log = os.path.join(tmp_root, "log")
    write_change_log(changes, log, n_segments=3)
    pipe = CdcPipeline(
        spark,
        PipelineConfig(table_root=os.path.join(tmp_root, "t"), n_buckets=4, decode=False),
    )
    q = pipe.run_stream(
        log, os.path.join(tmp_root, "ckpt"), changes.schema, stateful_filter=True
    )
    q.awaitTermination(300)
    assert q.exception() is None
    got = pipe.table.read().select("url", "offset")
    want = expected_final_state(changes).select("url", "offset")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
