"""Validation suite (M5) + publish stage (K5/K6/K8) + multimodal plumbing."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.extract.multimodal import (
    extract_media_features,
    frame_sample_plan,
    real_decode,
    resize_plan,
    synth_media,
)
from data_pipelines_spark.lake import LakeTable
from data_pipelines_spark.lake.publish import PublishError, publish_snapshot
from data_pipelines_spark.operators.validation import (
    array_scalar_consistency,
    derived_total,
    dimension_membership,
    duplicate_keys,
    in_range,
    no_future_dates,
    not_null,
    run_suite,
    suite_passed,
)


@pytest.fixture(scope="module")
def boxers(spark):
    rows = [
        # id, slug, division, height, debut, wins, losses, draws, total, bouts(results)
        (1, "a-b", "heavy", 180, dt.datetime(2020, 1, 1), 2, 1, 0, 3, ["W", "W", "L"]),
        (2, "c-d", "light", 170, dt.datetime(2021, 1, 1), 1, 0, 0, 1, ["W"]),
        (2, "c-d2", "light", 171, dt.datetime(2021, 1, 1), 1, 0, 0, 1, ["W"]),  # dup id
        (3, None, "mystery", 400, dt.datetime(2099, 1, 1), 5, 0, 0, 4, ["W", "W"]),  # bad row
    ]
    return spark.createDataFrame(
        rows,
        "id long, slug string, division string, height int, debut timestamp, "
        "wins int, losses int, draws int, total int, bouts array<string>",
    )


@pytest.fixture(scope="module")
def divisions(spark):
    return spark.createDataFrame(
        [("heavy", "heavyweight"), ("light", "lightweight")], "name string, slug string"
    )


def test_suite_finds_each_defect(spark, boxers, divisions):
    checks = [
        duplicate_keys(["id"]),
        not_null("slug"),
        in_range("height", 120, 250),
        no_future_dates("debut"),
        dimension_membership(divisions, "division", ["name", "slug"]),
        array_scalar_consistency("bouts", lambda b: b == "W", "wins"),
        derived_total("total", ["wins", "losses", "draws"]),
    ]
    results = {r.name: r for r in run_suite(boxers, checks)}
    assert not suite_passed(results.values())
    assert results["duplicate_id"].offending_rows == 1      # id=2 twice
    assert results["null_slug"].offending_rows == 1         # id=3
    assert results["range_height"].offending_rows == 1      # 400
    assert results["future_debut"].offending_rows == 1      # 2099
    assert results["membership_division"].offending_rows == 1  # 'mystery'
    assert results["consistency_bouts_wins"].offending_rows == 1  # 5 wins vs 2 W
    assert results["derived_total"].offending_rows == 1     # 4 != 5+0+0
    assert results["duplicate_id"].sample[0]["id"] == 2


def test_suite_passes_on_clean_data(spark, boxers, divisions):
    clean = boxers.where(F.col("id") == 1)
    checks = [duplicate_keys(["id"]), not_null("slug"), in_range("height", 120, 250)]
    assert suite_passed(run_suite(clean, checks))


def test_publish_roundtrip_and_gate(spark, tmp_root, boxers):
    import datetime as dt

    table = LakeTable.create(
        spark, os.path.join(tmp_root, "t"), key="url",
        seq_cols=("warc_ts", "offset"), n_buckets=4,
    )
    batch = spark.createDataFrame(
        [
            ("I", "a", dt.datetime(2025, 1, 1), 1, b"\x01\x02", True),
            ("I", "b", dt.datetime(2025, 1, 1), 2, b"\x03", False),
        ],
        "op string, url string, warc_ts timestamp, offset long, blob binary, flag boolean",
    )
    table.merge(batch, batch_id=1)
    out_root = os.path.join(tmp_root, "pub")
    manifest = publish_snapshot(spark, table, out_root)
    assert manifest["match"] and manifest["rows_published"] == 2
    pub = spark.read.parquet(os.path.join(manifest["path"], "data"))
    got = {r.url: (r.blob, r.flag) for r in pub.collect()}
    assert got["a"] == ("0102", 1)  # binary→hex, bool→int sanitization
    with open(os.path.join(out_root, "LATEST")) as f:
        assert f.read() == manifest["path"]

    # failed validation gates the publish (run_pipeline.py:144-151 analog)
    bad = run_suite(table.read().withColumn("x", F.lit(None).cast("string")), [not_null("x")])
    with pytest.raises(PublishError):
        publish_snapshot(spark, table, out_root, validation=bad)


def test_media_features_plumbing(spark):
    media = synth_media(spark, n=64)
    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == 64
    assert all(len(r.feature) == 64 for r in rows)
    # deterministic: same payload → same feature
    again = {r.media_id: r.feature for r in extract_media_features(media).collect()}
    assert all(again[r.media_id] == r.feature for r in rows)


def test_media_plans_jvm_side(spark):
    media = synth_media(spark, n=64)
    fs = frame_sample_plan(media, every_ms=5000)
    assert fs.where(F.col("frame_ts_ms") % 5000 != 0).count() == 0
    rs = resize_plan(media, max_side=512)
    assert rs.where((F.col("target_w") > 512) & (F.col("target_h") > 512)).count() == 0


def test_real_decode_is_explicit_stub():
    """Compressed formats still fail loud — that boundary needs PIL/ffmpeg."""
    with pytest.raises(NotImplementedError):
        real_decode(b"\x00", "image/png")


def test_bmp_roundtrip_exact():
    """encode_bmp → decode_bmp is lossless, including non-multiple-of-4 row
    widths (the BMP 4-byte row-padding case)."""
    import numpy as np

    from data_pipelines_spark.extract.multimodal import decode_bmp, encode_bmp

    for w, h in [(4, 3), (5, 2), (7, 5), (1, 1)]:
        rng = np.random.RandomState(w * 100 + h)
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        gw, gh, got = decode_bmp(encode_bmp(px))
        assert (gw, gh) == (w, h)
        assert (got == px).all()


def test_bmp_top_down_rows():
    """Negative header height = top-down row order; decoder must honor it."""
    import struct

    import numpy as np

    from data_pipelines_spark.extract.multimodal import decode_bmp, encode_bmp

    px = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    payload = bytearray(encode_bmp(px))
    # flip height sign and reverse the row blocks → same logical image
    (h,) = struct.unpack_from("<i", payload, 22)
    struct.pack_into("<i", payload, 22, -h)
    row = 4 * 3  # w*3, already 4-byte aligned
    body = payload[54:]
    payload[54:] = body[row:] + body[:row]
    _, _, got = decode_bmp(bytes(payload))
    assert (got == px).all()


def test_wav_roundtrip_and_dispatch():
    import numpy as np

    from data_pipelines_spark.extract.multimodal import decode_wav, encode_wav

    s = (np.arange(200, dtype=np.int64) * 37 % 2048 - 1024).astype(np.int16)
    rate, got = decode_wav(encode_wav(s, 8000))
    assert rate == 8000 and (got == s).all()
    # dispatch through the codec boundary
    r2, g2 = real_decode(encode_wav(s, 16000), "audio/x-wav")
    assert r2 == 16000 and (g2 == s).all()


def test_media_decode_stats_end_to_end(spark):
    """Generate → decode → stats inside Spark (mapInPandas), checked against
    a driver-side replay of the pixel/sample formula."""
    from data_pipelines_spark.extract.multimodal import (
        media_decode_stats,
        synth_decodable_media,
    )

    ids = spark.range(20).selectExpr("id AS doc_id")
    got = {r.media_id: r for r in media_decode_stats(synth_decodable_media(ids)).collect()}
    assert len(got) == 20
    for mid in range(20):
        r = got[mid]
        if mid % 2 == 0:
            w, h = 4 + mid % 13, 3 + mid % 7
            assert (r.kind, r.width, r.height, r.n_samples) == ("image", w, h, w * h)
            want0 = sum((mid * 31 + y * w + x * 3) % 256 for y in range(h) for x in range(w))
            assert r.sum0 == want0
        else:
            n = 50 + mid % 40
            assert (r.kind, r.sample_rate, r.n_samples) == ("audio", 8000, n)
            assert r.sum0 == sum(abs((mid * 7 + i * 13) % 2048 - 1024) for i in range(n))


def test_staging_validation_suite(spark):
    """§3.3 parity: the composed staging suite flags exactly the planted
    defects (bout/proWins inconsistency) and passes the healthy checks."""
    from data_pipelines_spark.extract.html import build_staging_records
    from data_pipelines_spark.operators.validation import (
        run_suite,
        staging_validation_suite,
    )
    from data_pipelines_spark.sources import seed_divisions
    from tests.test_extract_full_surface import BOUTS_RICH, FULL_PROFILE

    pro = FULL_PROFILE.replace(
        "</body></html>",
        BOUTS_RICH.split("<html><body>")[1].split("</body></html>")[0]
        + "</body></html>",
    )
    pages = spark.createDataFrame(
        [("https://boxrec.com/en/box-pro/777", pro.encode())],
        "url string, html binary",
    )
    staging = build_staging_records(pages)
    results = {
        r.name: r for r in run_suite(staging, staging_validation_suite(seed_divisions(spark)))
    }
    # planted defect: 1 'W' in bouts vs proWins=30 → A6 flags it
    assert not results["consistency_bouts_proWins"].passed
    # everything else about this record is healthy
    for name in (
        "duplicate_boxrecId", "duplicate_slug", "null_boxrecId", "null_name",
        "derived_proTotalBouts", "range_height", "membership_proDivision",
        "future_proDebutDate",
    ):
        assert results[name].passed, name
