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


#: the reference INSERT's full column list (to_staging_mirror_db.py:125-139)
#: + hasAmateurRecord (kept in pro_data, :229/:234) — 45 columns
STAGING_COLUMNS = [
    "boxrecId", "boxrecUrl", "boxrecWikiUrl", "slug", "name",
    "birthName", "nicknames", "avatarImage", "residence", "birthPlace",
    "dateOfBirth", "gender", "nationality", "height", "reach", "stance",
    "bio", "promoters", "trainers", "managers", "gym",
    "proDebutDate", "proDivision", "proWins", "proWinsByKnockout",
    "proLosses", "proLossesByKnockout", "proDraws", "proStatus",
    "proTotalBouts", "proTotalRounds",
    "amateurDebutDate", "amateurDivision", "amateurWins",
    "amateurWinsByKnockout", "amateurLosses", "amateurLossesByKnockout",
    "amateurDraws", "amateurStatus", "amateurTotalBouts",
    "amateurTotalRounds", "hasAmateurRecord", "bouts",
    "createdAt", "updatedAt",
]


@pytest.fixture(scope="module")
def staging(spark):
    i = F.col("id")
    wiki = F.concat(
        F.lit('<a href="/wiki/index.php?title=Human:'),
        i.cast("string"), F.lit('">wiki</a>'),
    )
    pages = spark.range(40).select(
        F.concat(F.lit("https://boxrec.com/en/box-pro/"), i.cast("string")).alias("url"),
        F.concat(profile_page(i), wiki).cast("binary").alias("html"),
    )
    bio = spark.range(40).where(i % 3 == 0).select(
        i.cast("string").alias("boxrec_id"),
        F.concat(F.lit("Bio "), i.cast("string")).alias("bio"),
    )
    return build_staging_records(pages, bio=bio, as_of="2026-01-01 00:00:00")


def test_staging_has_full_45_column_shape(staging):
    """Column-for-column parity with the reference INSERT, same order."""
    assert staging.columns == STAGING_COLUMNS
    rows = {r.boxrecId: r for r in staging.collect()}
    assert rows["3"].bio == "Bio 3" and rows["1"].bio is None
    assert rows["2"].boxrecUrl == "https://boxrec.com/en/box-pro/2"
    assert rows["2"].boxrecWikiUrl == "https://boxrec.com/wiki/index.php?title=Human:2"
    assert str(rows["0"].createdAt) == "2026-01-01 00:00:00"
    assert rows["0"].createdAt == rows["0"].updatedAt


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
