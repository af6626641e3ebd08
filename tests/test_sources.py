"""Source-scan helpers (SURVEY §2.1 S1/S4/S7)."""

import datetime as dt
import os

from pyspark.sql import functions as F

from data_pipelines_spark.sources import due_work_scan, read_page_files, read_url_queue


def test_read_url_queue_header_case_null_and_dedup(spark, tmp_root):
    p = os.path.join(tmp_root, "q.csv")
    with open(p, "w") as f:
        f.write("URL,rank\nhttps://a/1,1\n,2\nhttps://a/1,3\nhttps://b/2,4\n")
    urls = sorted(r.url for r in read_url_queue(spark, p).collect())
    assert urls == ["https://a/1", "https://b/2"]


def test_read_page_files_binary(spark, tmp_root):
    d = os.path.join(tmp_root, "pages")
    os.makedirs(d)
    with open(os.path.join(d, "en_box-pro_7.html"), "wb") as f:
        f.write(b"<html><body>seven</body></html>")
    with open(os.path.join(d, "ignore.txt"), "wb") as f:
        f.write(b"not html")
    rows = read_page_files(spark, d).collect()
    assert len(rows) == 1
    assert rows[0].html == b"<html><body>seven</body></html>"
    assert rows[0].path.endswith("en_box-pro_7.html") and rows[0].length == 31


def test_due_work_scan_nulls_first_then_stalest(spark):
    state = spark.createDataFrame(
        [
            ("u1", dt.datetime(2025, 1, 10)),
            ("u2", None),
            ("u3", dt.datetime(2025, 1, 1)),
            ("u4", dt.datetime(2025, 2, 1)),  # fresh → excluded
        ],
        "url string, last_checked_at timestamp",
    )
    got = [r.url for r in due_work_scan(state, dt.datetime(2025, 1, 15), limit=10).collect()]
    assert got == ["u2", "u3", "u1"]


def test_json_change_stream_matches_parquet(spark, tmp_root):
    """S2/S4 wire-format parity: the same change log delivered as JSON-lines
    segments (base64 page bodies, the reference's Zyte wire shape) ingests
    to the byte-identical final state as the native parquet binlog."""
    import os

    from pyspark.sql import functions as F

    from data_pipelines_spark.gen.changegen import change_stream, write_change_log
    from data_pipelines_spark.streaming.pipeline import CdcPipeline, PipelineConfig

    changes = change_stream(spark, n_events=800, n_keys=120, seed=21).persist()
    pq_dir = os.path.join(tmp_root, "log_pq")
    js_dir = os.path.join(tmp_root, "log_js")
    write_change_log(changes, pq_dir, n_segments=2)
    (
        changes.repartitionByRange(2, "offset")
        .sortWithinPartitions("offset")
        .withColumn("html", F.base64(F.col("html")))
        .write.mode("overwrite")
        .json(js_dir)
    )
    schema = spark.read.parquet(pq_dir).schema
    states = {}
    for name, fmt, d in [("pq", "parquet", pq_dir), ("js", "json", js_dir)]:
        pipe = CdcPipeline(
            spark, PipelineConfig(os.path.join(tmp_root, f"t_{name}"), n_buckets=4)
        )
        q = pipe.run_stream(d, os.path.join(tmp_root, f"ck_{name}"), schema, fmt=fmt)
        q.awaitTermination()
        states[name] = {
            r.url: (r.offset, r.h)
            for r in pipe.table.read()
            .select("url", "offset", F.sha2("html", 256).alias("h"))
            .collect()
        }
    assert states["pq"] == states["js"] and len(states["pq"]) > 0
    changes.unpersist()


def test_csv_change_stream_with_evolved_schema(spark, tmp_root):
    """CSV wire format carries complex columns (the evolved meta map) as
    JSON text and round-trips them — the CSV source can't hold maps
    natively, so this pins the from_json decode path."""
    import os

    from pyspark.sql import functions as F

    from data_pipelines_spark.gen.changegen import change_stream
    from data_pipelines_spark.streaming.pipeline import CdcPipeline, PipelineConfig

    changes = change_stream(
        spark, n_events=400, n_keys=60, seed=33, evolve_at=0.5
    ).persist()
    schema = changes.schema
    csv_dir = os.path.join(tmp_root, "log_csv")
    (
        changes.repartitionByRange(2, "offset")
        .sortWithinPartitions("offset")
        .withColumn("html", F.base64(F.col("html")))
        .withColumn("meta", F.to_json(F.col("meta")))
        .write.mode("overwrite")
        .option("header", True)
        .csv(csv_dir)
    )
    pipe = CdcPipeline(
        spark, PipelineConfig(os.path.join(tmp_root, "t_csv"), n_buckets=4)
    )
    q = pipe.run_stream(
        csv_dir, os.path.join(tmp_root, "ck_csv"), schema, fmt="csv"
    )
    q.awaitTermination()
    out = pipe.table.read()
    assert out.count() > 0
    # evolved map column survives the CSV wire round trip
    evolved = out.where(F.col("meta").isNotNull()).select("meta").first()
    assert evolved is not None and "crawler" in evolved.meta
    changes.unpersist()
