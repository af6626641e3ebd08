"""Distributed global rank / ntile: bit-parity with the single-partition
window it replaces."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipelines_spark.operators.ranking import global_rank, ntile_buckets


@pytest.fixture()
def scored(spark):
    # clustered + boundary + clamp-above values, unique keys
    rows = [(i, ((i * 37) % 100) / 100.0) for i in range(200)]
    rows += [(200, 0.0), (201, 1.0), (202, 1.0)]  # exact bounds, dup scores
    return spark.createDataFrame(rows, "doc_id long, score double").repartition(8)


def test_global_rank_matches_single_partition_window(spark, scored):
    ranked, n = global_rank(scored, "score", "doc_id", n_bins=16)
    assert n == 203
    w = Window.orderBy(F.col("score"), F.col("doc_id"))
    expect = {
        (r.doc_id, r.r)
        for r in scored.withColumn("r", F.row_number().over(w)).collect()
    }
    got = {(r.doc_id, r["rank"]) for r in ranked.collect()}
    assert got == expect


def test_ntile_matches_builtin(spark, scored):
    for k in (3, 7, 10):
        got = {
            (r.doc_id, r.bucket)
            for r in ntile_buckets(scored, "score", "doc_id", k, n_bins=16).collect()
        }
        w = Window.orderBy(F.col("score"), F.col("doc_id"))
        expect = {
            (r.doc_id, r.b)
            for r in scored.withColumn("b", F.ntile(k).over(w)).collect()
        }
        assert got == expect, f"k={k}"


def test_all_equal_scores_degenerate_but_correct(spark):
    df = spark.createDataFrame(
        [(i, 0.5) for i in range(50)], "doc_id long, score double"
    ).repartition(4)
    ranked, n = global_rank(df, "score", "doc_id", n_bins=8)
    assert n == 50
    assert [r.doc_id for r in ranked.orderBy("rank").collect()] == list(range(50))


def test_null_scores_fail_loud(spark):
    df = spark.createDataFrame(
        [(1, 0.5), (2, None)], "doc_id long, score double"
    )
    with pytest.raises(ValueError, match="NULL"):
        global_rank(df, "score", "doc_id")


def test_bounds_validation(spark, scored):
    with pytest.raises(ValueError):
        global_rank(scored, "score", "doc_id", lo=1.0, hi=1.0)
    with pytest.raises(ValueError):
        ntile_buckets(scored, "score", "doc_id", 0)
