"""WARC codec: round-trip, gzip framing, determinism, atomic part files."""

import datetime as dt
import glob
import gzip
import os

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.warc import (
    _parse_stream,
    _serialize,
    read_warc,
    warc_record_bytes,
    write_warc,
)


def _pages(spark, n=20):
    rows = [
        (
            f"https://example.com/p/{i}",
            dt.datetime(2024, 1, 1 + i % 5, i % 24),
            f"<html lang=\"en\"><body>page {i} é</body></html>".encode(),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")


@pytest.mark.parametrize("compress", [False, True])
def test_round_trip(spark, tmp_root, compress):
    out = os.path.join(tmp_root, "warc_gz" if compress else "warc")
    pages = _pages(spark).repartition(3)
    manifest = write_warc(pages, out, compress=compress).collect()
    assert sum(m.records for m in manifest) == 20
    assert len(glob.glob(os.path.join(out, "part-*.warc*"))) == len(manifest)
    assert not glob.glob(os.path.join(out, "*.inprogress*"))

    back = read_warc(spark, out)
    a = {(r.url, r.warc_ts, bytes(r.payload)) for r in back.collect()}
    b = {(r.url, r.warc_ts, bytes(r.html)) for r in _pages(spark).collect()}
    assert a == b
    assert back.select("warc_type").distinct().collect()[0][0] == "resource"


def test_serialization_is_deterministic_and_parseable():
    rec = _serialize("https://a.com/x", "2024-01-01T00:00:00Z", b"<html>hi</html>")
    assert rec == _serialize("https://a.com/x", "2024-01-01T00:00:00Z", b"<html>hi</html>")
    [(rid, rtype, url, date, payload)] = list(_parse_stream(rec))
    assert rtype == "resource" and url == "https://a.com/x"
    assert payload == b"<html>hi</html>"
    assert rid.startswith("<urn:uuid:") and rid.endswith(">")
    # two records back to back parse as two
    assert len(list(_parse_stream(rec + rec))) == 2


def test_parse_rejects_garbage_and_truncation():
    rec = _serialize("https://a.com", "2024-01-01T00:00:00Z", b"xyz")
    with pytest.raises(ValueError):
        list(_parse_stream(b"HTTP/1.1 200 OK\r\n\r\n"))
    with pytest.raises(ValueError):
        list(_parse_stream(rec[:-8]))  # payload cut short


def test_warc_record_bytes_column(spark):
    df = _pages(spark, 5).select(
        warc_record_bytes(F.col("url"), F.col("warc_ts"), F.col("html")).alias("rec")
    )
    recs = [bytes(r.rec) for r in df.collect()]
    assert len(recs) == 5
    parsed = [u for r in recs for _, _, u, _, _ in _parse_stream(r)]
    assert sorted(parsed) == sorted(f"https://example.com/p/{i}" for i in range(5))


def test_gzip_members_are_deterministic(spark, tmp_root):
    out1 = os.path.join(tmp_root, "w1")
    out2 = os.path.join(tmp_root, "w2")
    pages = _pages(spark).coalesce(1)
    write_warc(pages, out1, compress=True).collect()
    write_warc(pages, out2, compress=True).collect()
    [f1] = glob.glob(os.path.join(out1, "*.warc.gz"))
    [f2] = glob.glob(os.path.join(out2, "*.warc.gz"))
    b1, b2 = open(f1, "rb").read(), open(f2, "rb").read()
    assert b1 == b2  # mtime=0: byte-identical archives across runs
    assert gzip.decompress(b1)  # valid multi-member stream


def test_warc_bootstrap_into_pipeline(spark, tmp_root):
    """Common-Crawl bootstrap: archive set -> warc_as_changes -> CDC merge.
    A re-crawl of the same URL with a later warc_ts wins LWW."""
    from data_pipelines_spark.streaming.pipeline import CdcPipeline, PipelineConfig
    from data_pipelines_spark.warc import warc_as_changes

    out = os.path.join(tmp_root, "dump")
    pages = _pages(spark, 12)
    recrawl = pages.where(F.col("url") == "https://example.com/p/3").select(
        "url",
        (F.col("warc_ts") + F.expr("INTERVAL 10 DAYS")).alias("warc_ts"),
        F.lit(b"<html>recrawled</html>").alias("html"),
    )
    write_warc(pages.unionByName(recrawl), out, compress=True).collect()

    changes = warc_as_changes(read_warc(spark, out))
    pipe = CdcPipeline(
        spark,
        PipelineConfig(table_root=os.path.join(tmp_root, "t"), n_buckets=4),
    )
    pipe.process_batch(changes, batch_id=0)
    state = {r.url: bytes(r.html) for r in pipe.table.read().collect()}
    assert len(state) == 12
    assert state["https://example.com/p/3"] == b"<html>recrawled</html>"
