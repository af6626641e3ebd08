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


# --------------------------- key-sorted layout: zone-map file pruning ----


def _base_files(table, bucket=None):
    snap = table._snapshot()
    out = []
    for b, fes in table._resolve_files(snap).items():
        if bucket is not None and int(b) != bucket:
            continue
        out += [fe for fe in fes if fe.get("kind", "base") == "base"]
    return out


def test_key_sorted_compact_prunes_files(spark, tmp_root):
    """compact(sort_by_key=True, target_file_rows=N) gives each base file a
    non-overlapping key range; read_keys then opens ~one file per key
    instead of the bucket's whole base, and results are unchanged."""
    table = LakeTable.create(
        spark, os.path.join(tmp_root, "plk"), key="url", n_buckets=2,
        overwrite=True,
    )
    rows = [
        ("I", f"u{i:03d}", ts(1 + i % 5), i, f"<p{i}>".encode(), "en")
        for i in range(80)
    ]
    _merge(spark, table, rows, 1)
    table.compact(batch_id="ck", sort_by_key=True, target_file_rows=8)
    files = _base_files(table)
    assert len(files) >= 8, "target_file_rows must split each bucket's base"
    assert all(
        fe.get("key_min") is not None and fe.get("key_max") is not None
        for fe in files
    ), "key-sorted rewrite must stamp key zone maps"
    # distinct ranges: files within a bucket must not overlap
    by_b: dict = {}
    snap = table._snapshot()
    for b, fes in table._resolve_files(snap).items():
        spans = sorted((fe["key_min"], fe["key_max"]) for fe in fes)
        for (_, hi1), (lo2, _) in zip(spans, spans[1:]):
            assert hi1 <= lo2, f"overlapping key ranges in bucket {b}: {spans}"
    # the lookup equals the filtered read AND touches few files
    keys = ["u003", "u042"]
    got = {r.url: bytes(r.html) for r in table.read_keys(keys).collect()}
    assert got == {"u003": b"<p3>", "u042": b"<p42>"}
    touched = table.read_keys(keys).inputFiles()
    assert 0 < len(touched) <= len(keys), (
        f"zone maps should prune to ~one file per key, got {len(touched)} "
        f"of {len(files)}"
    )


def test_key_pruning_sound_with_later_deltas(spark, tmp_root):
    """Un-sorted delta files written after a key-sorted compaction carry
    footer-derived key bounds; lookups see the newest value (no false
    skip), including for keys absent from the sorted base."""
    table = LakeTable.create(
        spark, os.path.join(tmp_root, "pld"), key="url", n_buckets=2,
        overwrite=True,
    )
    _merge(
        spark, table,
        [("I", f"u{i:03d}", ts(1), i, f"<p{i}>".encode(), "en") for i in range(40)],
        1,
    )
    table.compact(batch_id="ck", sort_by_key=True, target_file_rows=8)
    _merge(
        spark, table,
        [
            ("U", "u005", ts(10), 100, b"<v2>", "de"),
            ("I", "zzz-new", ts(10), 101, b"<z>", "fr"),
            ("D", "u011", ts(10), 102, None, None),
        ],
        2,
    )
    got = {
        r.url: bytes(r.html)
        for r in table.read_keys(["u005", "zzz-new", "u011", "u020"]).collect()
    }
    assert got == {"u005": b"<v2>", "zzz-new": b"<z>", "u020": b"<p20>"}
    # delta files got key bounds from their parquet footers (no extra job)
    snap = table._snapshot()
    deltas = [
        fe
        for fes in table._resolve_files(snap).values()
        for fe in fes
        if fe.get("kind") == "delta"
    ]
    assert deltas and all(fe.get("key_max") is not None for fe in deltas)


def test_key_bounds_truncation_long_keys(spark, tmp_root):
    """Keys longer than the stored bound length: bounds are truncated
    Iceberg-style (lower = prefix, upper = prefix with last codepoint
    incremented) and lookups still find every key — no false skips."""
    from data_pipelines_spark.lake.table import _KEY_BOUND_LEN, _key_bounds_py

    # unit: the helper's bounds bracket the originals
    lo, hi = _key_bounds_py("a" * 100, "b" * 100)
    assert lo == "a" * _KEY_BOUND_LEN and lo <= "a" * 100
    assert hi == "b" * (_KEY_BOUND_LEN - 1) + "c" and hi >= "b" * 100
    assert _key_bounds_py(7, 9) == (7, 9)  # non-strings pass through
    # un-incrementable prefix keeps only the lower bound
    lo2, hi2 = _key_bounds_py("x", chr(0x10FFFF) * (_KEY_BOUND_LEN + 1))
    assert lo2 == "x" and hi2 is None

    table = LakeTable.create(
        spark, os.path.join(tmp_root, "plt"), key="url", n_buckets=1,
        overwrite=True,
    )
    prefix = "https://example.com/very/long/path/segment/that/keeps/going/"
    assert len(prefix) >= _KEY_BOUND_LEN - 4
    rows = [
        ("I", f"{prefix}{i:04d}", ts(1), i, b"<x>", "en") for i in range(40)
    ]
    _merge(spark, table, rows, 1)
    table.compact(batch_id="ck", sort_by_key=True, target_file_rows=8)
    for fe in _base_files(table):
        assert len(fe["key_min"]) <= _KEY_BOUND_LEN
        assert fe["key_max"] is None or len(fe["key_max"]) <= _KEY_BOUND_LEN
    want = {f"{prefix}0007", f"{prefix}0033"}
    got = {r.url for r in table.read_keys(sorted(want)).collect()}
    assert got == want


def test_sort_by_key_and_seq_mutually_exclusive(spark, tmp_root):
    table = LakeTable.create(
        spark, os.path.join(tmp_root, "plx"), key="url", n_buckets=2,
        overwrite=True,
    )
    _merge(spark, table, [("I", "u1", ts(1), 1, b"<x>", "en")], 1)
    with pytest.raises(ValueError, match="mutually exclusive"):
        table.compact(batch_id="bad", sort_by_seq=True, sort_by_key=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        table.rebucket(4, sort_by_seq=True, sort_by_key=True)


# ------------------------------- key Bloom filters: delta-file pruning ---


def test_key_bloom_helpers_deterministic_no_false_negatives():
    from data_pipelines_spark.lake.table import (
        _key_bloom_build,
        _key_bloom_may_contain,
    )

    keys = [f"https://example.com/u/{i * 7919 % 100003}" for i in range(4096)]
    b64, m, k = _key_bloom_build(set(keys))
    assert (b64, m, k) == _key_bloom_build(set(keys)), "must be replay-stable"
    assert all(_key_bloom_may_contain(b64, m, k, [x]) for x in keys)
    absent = [f"https://example.com/v/{i}" for i in range(5000)]
    fp = sum(_key_bloom_may_contain(b64, m, k, [x]) for x in absent)
    assert fp < 250, f"false-positive rate way off: {fp}/5000"
    # ANY-semantics over a multi-key query
    assert _key_bloom_may_contain(b64, m, k, [absent[0], keys[0]])
    # empty filter never matches
    b0, m0, k0 = _key_bloom_build([])
    assert not _key_bloom_may_contain(b0, m0, k0, ["x"])


def test_key_bloom_prunes_unsorted_deltas(spark, tmp_root):
    """An un-sorted delta file's key RANGE spans most of the key space, so
    the zone map alone cannot prune it — the per-file bloom skips it for
    lookups of keys the delta does not carry, and never skips it for keys
    it does (no false negatives; LWW still sees the newest value)."""
    table = LakeTable.create(
        spark, os.path.join(tmp_root, "plb"), key="url", n_buckets=1,
        overwrite=True,
    )
    table.key_bloom_rows = 8192  # the serving profile (opt-in)
    rows = [
        ("I", f"u{i:03d}", ts(1), i, f"<p{i}>".encode(), "en")
        for i in range(80)
    ]
    _merge(spark, table, rows, 1)
    table.compact(batch_id="ck", sort_by_key=True, target_file_rows=8)
    # one small delta whose key range (u010..u070) straddles most files
    _merge(
        spark, table,
        [
            ("U", "u010", ts(9), 900, b"<v2>", "de"),
            ("U", "u070", ts(9), 901, b"<v2>", "de"),
        ],
        2,
    )
    snap = table._snapshot()
    deltas = [
        fe
        for fes in table._resolve_files(snap).values()
        for fe in fes
        if fe.get("kind") == "delta"
    ]
    assert deltas and all("kbf" in fe for fe in deltas), (
        "small delta files must carry a key bloom"
    )
    delta_paths = {
        os.path.normpath(os.path.join(table.root, fe["path"])) for fe in deltas
    }
    # u040 is inside the delta's key range but NOT in the delta → the bloom
    # (not the zone map) must prune the delta file from the scan
    df = table.read_keys(["u040"])
    touched = {
        os.path.normpath(p.removeprefix("file:")) for p in df.inputFiles()
    }
    assert not touched & delta_paths, "bloom failed to prune the delta file"
    assert {r.url: bytes(r.html) for r in df.collect()} == {"u040": b"<p40>"}
    # a key the delta DOES carry: delta is read, newest value wins
    df2 = table.read_keys(["u010"])
    touched2 = {
        os.path.normpath(p.removeprefix("file:")) for p in df2.inputFiles()
    }
    assert touched2 & delta_paths, "bloom must not skip a file carrying the key"
    assert {r.url: bytes(r.html) for r in df2.collect()} == {"u010": b"<v2>"}


def test_key_bloom_opt_out_and_row_cap(spark, tmp_root):
    """key_bloom_rows=None disables blooms; files above the cap skip the
    bloom build (zone maps still stamped) — lookups stay correct."""
    table = LakeTable.create(
        spark, os.path.join(tmp_root, "plc"), key="url", n_buckets=1,
        overwrite=True,
    )
    table.key_bloom_rows = None
    _merge(
        spark, table,
        [("I", f"u{i}", ts(1), i, b"<x>", "en") for i in range(10)],
        1,
    )
    snap = table._snapshot()
    fes = [fe for fes in table._resolve_files(snap).values() for fe in fes]
    assert fes and all("kbf" not in fe for fe in fes)
    table.key_bloom_rows = 4  # below the next batch's 10 rows
    _merge(
        spark, table,
        [("U", f"u{i}", ts(2), 100 + i, b"<y>", "en") for i in range(10)],
        2,
    )
    snap = table._snapshot()
    new = [
        fe
        for fes in table._resolve_files(snap).values()
        for fe in fes
        if "kbf" in fe
    ]
    assert not new, "files above key_bloom_rows must not build blooms"
    assert bytes(table.read_keys(["u3"]).collect()[0].html) == b"<y>"


def test_key_bloom_sound_with_seq_bump_files(spark, tmp_root):
    """change_filter bump deltas (op='B': key+seq+hash, no payload) compose
    with bloom pruning: a lookup of the bumped key reads the bump file and
    resolves to the bumped sequence (the hash-matched payload row is for the
    SAME key, so per-key pruning can never split them apart); a lookup of an
    unrelated key prunes the bump file entirely."""
    from data_pipelines_spark.streaming.pipeline import CdcPipeline, PipelineConfig

    pipe = CdcPipeline(
        spark,
        PipelineConfig(
            table_root=os.path.join(tmp_root, "plbb"), n_buckets=1,
            change_filter=True, key_bloom_rows=1024,
        ),
    )
    schema = (
        "offset long, op string, url string, warc_ts timestamp, "
        "html binary, lang string"
    )
    u1, u2 = "https://a.example.com/1", "https://b.example.com/2"
    html = b"<html>stable</html>"
    pipe.process_batch(
        spark.createDataFrame(
            [(3, "U", u1, ts(1), html, "en"), (4, "U", u2, ts(1), b"<o>", "en")],
            schema,
        ),
        0,
    )
    # identical re-scrape of u1 only -> reduced to a seq-bump delta file
    pipe.process_batch(
        spark.createDataFrame([(9, "U", u1, ts(2), html, "en")], schema), 1
    )
    t = pipe.table
    snap = t._snapshot()
    bump_fes = [
        fe
        for fes in t._resolve_files(snap).values()
        for fe in fes
        if fe.get("bumps")
    ]
    assert bump_fes and all("kbf" in fe for fe in bump_fes), (
        "bump delta files must carry blooms too"
    )
    bump_paths = {
        os.path.normpath(os.path.join(t.root, fe["path"])) for fe in bump_fes
    }
    # bumped key: bump file read, resolution lands on the bumped sequence
    df1 = t.read_keys([u1])
    touched1 = {
        os.path.normpath(p.removeprefix("file:")) for p in df1.inputFiles()
    }
    assert touched1 & bump_paths
    r = df1.collect()[0]
    assert r.offset == 9 and bytes(r.html) == html
    # unrelated key: the bump file is bloom-pruned from the scan
    df2 = t.read_keys([u2])
    touched2 = {
        os.path.normpath(p.removeprefix("file:")) for p in df2.inputFiles()
    }
    assert not touched2 & bump_paths, "bloom should prune the bump delta"
    assert bytes(df2.collect()[0].html) == b"<o>"
