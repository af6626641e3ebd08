"""read_keys: bucket-pruned point lookups (the serving path).

The serving question — "current row for url X" — must not scan the table.
read_keys computes each key's bucket under the requested version's own
layout, prunes the snapshot scan to those bucket directories, and lets
Catalyst push the ``key IN (...)`` predicate through the LWW aggregate into
the parquet scan. These tests pin the semantics (equals a filtered full
read, across deletes/updates/time-travel/rebucket) AND the plan shape
(inputFiles restricted to the keys' bucket dirs; In-filter pushed to the
scan).
"""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipelines_spark.functions.hashing import bucket_id
from data_pipelines_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("offset", T.LongType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("lang", T.StringType()),
    ]
)


def ts(day: int) -> dt.datetime:
    return dt.datetime(2025, 1, day)


@pytest.fixture()
def table(spark, tmp_root):
    return LakeTable.create(
        spark, os.path.join(tmp_root, "pl"), key="url", n_buckets=8, overwrite=True
    )


def _merge(spark, table, rows, batch_id):
    return table.merge(spark.createDataFrame(rows, SCHEMA), batch_id=batch_id)


def _seed(spark, table, n=40):
    rows = [
        ("I", f"u{i:03d}", ts(1 + i % 5), i, f"<p{i}>".encode(), "en")
        for i in range(n)
    ]
    _merge(spark, table, rows, 1)
    # updates + a delete in a second batch so LWW resolution is exercised
    _merge(
        spark,
        table,
        [
            ("U", "u003", ts(10), 100, b"<p3v2>", "de"),
            ("D", "u007", ts(10), 101, None, None),
            ("I", "u900", ts(10), 102, b"<new>", "fr"),
        ],
        2,
    )


def _buckets_of(spark, keys, n):
    df = spark.createDataFrame([(k,) for k in keys], "url string")
    return {r[0] for r in df.select(bucket_id(F.col("url"), n).alias("b")).collect()}


def test_read_keys_equals_filtered_read(spark, table):
    _seed(spark, table)
    keys = ["u003", "u007", "u010", "u900", "absent"]
    got = {r.url: (bytes(r.html), r.lang) for r in table.read_keys(keys).collect()}
    want = {
        r.url: (bytes(r.html), r.lang)
        for r in table.read().where(F.col("url").isin(keys)).collect()
    }
    assert got == want
    assert "u007" not in got  # deleted key resolves to nothing
    assert "absent" not in got
    assert got["u003"] == (b"<p3v2>", "de")  # LWW winner, not the stale row
    assert got["u900"] == (b"<new>", "fr")


def test_read_keys_tombstones_and_columns(spark, table):
    _seed(spark, table)
    with_tomb = table.read_keys(["u007"], include_tombstones=True).collect()
    assert len(with_tomb) == 1 and with_tomb[0].url == "u007"
    pruned = table.read_keys(["u010"], columns=["lang"])
    assert set(pruned.columns) == {"url", "warc_ts", "offset", "lang"}
    assert pruned.collect()[0].lang == "en"


def test_read_keys_empty_and_dedup(spark, table):
    _seed(spark, table)
    assert table.read_keys([]).count() == 0
    assert table.read_keys([]).columns == table.read().columns
    assert table.read_keys(["u010", "u010", "u010"]).count() == 1


def test_read_keys_scans_only_target_buckets(spark, table):
    _seed(spark, table)
    keys = ["u003", "u010"]
    want_buckets = _buckets_of(spark, keys, table.n_buckets)
    df = table.read_keys(keys)
    files = df.inputFiles()
    assert files, "expected a non-empty pruned scan"
    seen_buckets = set()
    for f in files:
        part = [p for p in f.split("/") if p.startswith("_bucket=")]
        assert part, f"data file outside bucket layout: {f}"
        seen_buckets.add(int(part[-1].split("=")[1]))
    assert seen_buckets <= want_buckets
    # the key predicate reaches the parquet scan (row-group pruning)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(url" in plan, plan[:2000]


def test_read_keys_time_travel_across_rebucket(spark, table):
    _seed(spark, table)
    v_before = table.current_version()
    table.rebucket(3)
    # new layout serves current state
    got = {r.url: bytes(r.html) for r in table.read_keys(["u003", "u900"]).collect()}
    assert got == {"u003": b"<p3v2>", "u900": b"<new>"}
    # old version answers under its OWN (pre-rebucket) layout
    old = {
        r.url: bytes(r.html)
        for r in table.read_keys(["u003", "u900"], version=v_before).collect()
    }
    assert old == {"u003": b"<p3v2>", "u900": b"<new>"}
    # and a later write is invisible to the old version
    _merge(spark, table, [("U", "u003", ts(20), 200, b"<p3v3>", "de")], 3)
    assert (
        bytes(table.read_keys(["u003"], version=v_before).collect()[0].html)
        == b"<p3v2>"
    )
    assert bytes(table.read_keys(["u003"]).collect()[0].html) == b"<p3v3>"
