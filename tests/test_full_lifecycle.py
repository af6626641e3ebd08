"""The reference's `run_pipeline full` lifecycle (§3.3) end to end:
extract pages → staging records → data-quality suite → validation-gated
atomic snapshot publish with count reconciliation — all engine layers
composed (K1/K5/K6, A4-A7, J4, F13, P-chain upstream)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.extract.html import build_staging_records
from data_pipelines_spark.gen.pagegen import profile_page
from data_pipelines_spark.lake.publish import PublishError, publish_snapshot
from data_pipelines_spark.lake.table import LakeTable
from data_pipelines_spark.operators.validation import (
    run_suite,
    staging_validation_suite,
    suite_passed,
)
from data_pipelines_spark.sources import seed_divisions


@pytest.fixture(scope="module")
def staging(spark):
    i = F.col("id")
    pages = spark.range(40).select(
        F.concat(F.lit("https://boxrec.com/en/box-pro/"), i.cast("string")).alias("url"),
        profile_page(i).cast("binary").alias("html"),
    )
    return build_staging_records(pages)


def test_full_lifecycle_gated_publish(spark, tmp_root, staging):
    # validate (A6 excluded: the synthetic profile pages carry no bout
    # tables, so the W-count-vs-proWins check is vacuously inconsistent)
    checks = [
        c for c in staging_validation_suite(seed_divisions(spark))
        if c[0] != "consistency_bouts_proWins"
    ]
    results = run_suite(staging, checks)
    assert suite_passed(results), [r.name for r in results if not r.passed]

    # load staging into a lake table (K1) and publish (K5/K6)
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "staging_table"),
        key="boxrecId", seq_cols=("scrapedAt",), n_buckets=4,
    )
    batch = staging.select(
        F.lit("U").alias("op"), "*",
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("scrapedAt"),
    )
    t.merge(batch, batch_id=0)
    assert t.read().count() == 40

    out_root = os.path.join(tmp_root, "published")
    manifest = publish_snapshot(spark, t, out_root, fmt="parquet", validation=results)
    assert manifest["match"] and manifest["rows_published"] == 40
    latest = open(os.path.join(out_root, "LATEST")).read()
    back = spark.read.parquet(os.path.join(latest, "data"))
    assert back.count() == 40 and "slug" in back.columns
    # nested bouts survive the round trip (empty arrays here)
    assert "bouts" in back.columns


def test_full_lifecycle_aborts_on_failed_gate(spark, tmp_root, staging):
    """§3.3 abort-on-first-failure: a failing check blocks the publish."""
    broken = staging.withColumn("boxrecId", F.lit(None).cast("string"))
    results = run_suite(broken, [
        c for c in staging_validation_suite(seed_divisions(spark))
        if c[0] == "null_boxrecId"
    ])
    assert not suite_passed(results)
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "t2"),
        key="slug", seq_cols=("scrapedAt",), n_buckets=2,
    )
    t.merge(
        staging.select(
            F.lit("U").alias("op"), "*",
            F.lit("2026-01-01 00:00:00").cast("timestamp").alias("scrapedAt"),
        ),
        batch_id=0,
    )
    with pytest.raises(PublishError):
        publish_snapshot(
            spark, t, os.path.join(tmp_root, "blocked"), validation=results
        )
    assert not os.path.exists(os.path.join(tmp_root, "blocked", "LATEST"))
