"""Physical-plan audits: the optimizations SURVEY.md §4 promises must be
visible in the executed plan, not just intended.

Each test asserts a structural property of the plan string:

- parquet scans carry PushedFilters + pruned ReadSchema (Catalyst pushdown);
- dimension joins broadcast (no shuffle of the big side);
- the CDC merge path has exactly ONE exchange (the bucket repartition serves
  the LWW groupBy and the bucketed write);
- the hot path contains no row-at-a-time Python eval (pandas/Arrow only).
"""

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as em

    return em


def test_q1_filter_pushed_and_columns_pruned(spark, entrymod):
    df = entrymod.q1_pricing_summary(spark, SF_DIR)
    plan = _formatted(df)
    pushed = plan.split("PushedFilters: ")[1].splitlines()[0]
    assert "l_shipdate" in pushed, pushed
    # ReadSchema must include only the 6 needed columns, not the full table
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_shipdate" in read_schema
    for unused in ("l_orderkey", "l_partkey", "l_comment"):
        assert unused not in read_schema, f"{unused} not pruned: {read_schema}"


def test_j4_dimension_join_broadcasts(spark, entrymod):
    plan = _plan(entrymod.j4_dim_membership(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_j5_side_input_broadcasts(spark, entrymod):
    plan = _plan(entrymod.j5_broadcast_side_input(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_merge_dedup_single_exchange(spark):
    """The ingest hot path: exactly one shuffle from raw batch to written
    layout — the bucket repartition satisfies the groupBy distribution."""
    from data_pipelines_spark.functions.hashing import bucket_id
    from data_pipelines_spark.gen.changegen import change_stream

    changes = change_stream(spark, n_events=1000, n_keys=100, seed=42)
    cols = [c for c in changes.columns]
    seq = F.struct(F.col("warc_ts"), F.col("offset"))
    deduped = (
        changes.withColumn("_bucket", bucket_id(F.col("url"), 16))
        .repartition(16, F.col("_bucket"))
        .groupBy("_bucket", "url")
        .agg(F.max_by(F.struct(*[c for c in cols if c != "url"]), seq).alias("_w"))
        .select("_bucket", "url", "_w.*")
    )
    plan = _plan(deduped)
    assert plan.count("Exchange") == 1, plan


def test_overwrite_dedup_single_exchange(spark, tmp_root):
    """INSERT OVERWRITE commits through the same single-exchange dedup as
    merge (lake/table.py:1170-1180): bucket repartition satisfies the
    groupBy(bucket, key) distribution, so a full-table reload is still one
    shuffle end-to-end. Pinned on the table's own construction."""
    import datetime as dt

    from pyspark.sql import types as T

    from data_pipelines_spark.functions.hashing import bucket_id
    from data_pipelines_spark.lake import LakeTable

    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("offset", T.LongType()),
        ]
    )
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "ow_plan"), key="url", n_buckets=8,
        overwrite=True,
    )
    batch = spark.createDataFrame(
        [("I", f"k{i}", dt.datetime(2025, 1, 1), i) for i in range(64)], schema
    )
    seq = F.struct(F.col("warc_ts"), F.col("offset"))
    payload = F.struct(*[c for c in batch.columns if c != "url"])
    deduped = (
        batch.withColumn("_bucket", bucket_id(F.col("url"), t.n_buckets))
        .repartition(t.n_buckets, F.col("_bucket"))
        .groupBy("_bucket", "url")
        .agg(F.max_by(payload, seq).alias("_w"))
        .select("_bucket", "url", "_w.*")
    )
    assert _plan(deduped).count("Exchange") == 1
    # and the committed result is the replace semantics, exactly once
    t.merge(batch, batch_id=0)
    out = t.overwrite(batch.where(F.col("offset") < 8), batch_id="ow")
    assert not out.skipped_duplicate_batch
    assert t.read().count() == 8


def test_lww_window_single_exchange(spark):
    from data_pipelines_spark.operators.lww import lww_latest

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    plan = _plan(lww_latest(ev, "user_id", ("ts", "event_id")))
    assert plan.count("Exchange") == 1, plan


def test_no_row_python_udf_on_ingest_path(spark):
    """input_hint invariant: decode is Arrow-vectorized (ArrowEvalPython /
    pandas), never row-at-a-time (BatchEvalPython)."""
    from data_pipelines_spark.extract.html import html_to_text
    from data_pipelines_spark.gen.changegen import change_stream

    df = change_stream(spark, n_events=100, n_keys=10, seed=42).withColumn(
        "text", html_to_text(F.col("html"))
    )
    plan = _plan(df)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_p2_columns_pruned_to_used(spark, entrymod):
    # the reason-chain's whole-row predicate can't push, but the scan must
    # still prune columns to the 3 used ones (not read `text`/`source`)
    plan = _formatted(entrymod.p2_quarantine(spark, SF_DIR))
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "text" not in read_schema, read_schema
    assert "doc_id" in read_schema and "n_chars" in read_schema


def test_whole_stage_codegen_on_agg(spark, entrymod):
    df = entrymod.a2_group_count(spark, SF_DIR)
    df.collect()  # AQE finalizes stages on execution
    plan = _plan(df)
    assert "*(" in plan or "WholeStageCodegen" in plan, plan


def test_x1_extraction_single_arrow_udf(spark, entrymod):
    """Parse-once-extract-many: the 36-field wide struct is ONE
    ArrowEvalPython node, never per-field Python UDFs."""
    plan = _plan(entrymod.x1_extract_profile(spark, SF_DIR))
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "BatchEvalPython" not in plan


def test_x3_harvest_anti_join_broadcasts(spark, entrymod):
    """The seen-set anti-join broadcasts (the work queue is the small side)."""
    plan = _plan(entrymod.x3_url_harvest(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "BatchEvalPython" not in plan


def test_x4_validators_pure_jvm(spark, entrymod):
    """P2-P7 chain is Column expressions only — no Python at all."""
    plan = _plan(entrymod.x4_page_quarantine(spark, SF_DIR))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_embedding_lsh_no_self_join_of_corpus(spark, entrymod):
    """Sign-LSH-blocked near-dup groups then expands: no SortMergeJoin of
    the corpus against itself, no Python."""
    plan = _plan(entrymod.dedup_embedding_lsh(spark, SF_DIR))
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_x6_staging_bio_join_broadcasts_one_udf_pass_per_branch(spark, entrymod):
    """45-column staging: the bio CSV side-input joins broadcast (never a
    shuffle of the staging side), and each page branch (pro / amateur) runs
    its two extractors in ONE fused ArrowEvalPython node — two branches,
    two nodes, no row Python."""
    plan = _plan(entrymod.x6_staging_records(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("ArrowEvalPython") == 2, plan
    assert "BatchEvalPython" not in plan


def test_m2_decode_input_pruned_no_row_python(spark, entrymod):
    """Real-decode path: mapInPandas only (Arrow batches), no row-at-a-time
    Python, and the generated-media branch never re-scans extra document
    columns (only doc_id reaches the generator)."""
    plan = _formatted(entrymod.m2_media_decode(spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert read_schema == "struct<doc_id:bigint>", read_schema


def test_batch_lsh_probe_array_is_mask_sized(spark, entrymod):
    """The probe expansion must be the C(n_planes, ≤multiprobe) mask array,
    never a sequence over the full 2^n_planes bucket space (the plan would
    carry `sequence(0, 255)` at the default 8 planes)."""
    plan = _plan(entrymod.sim_batch_lsh_topk(spark, SF_DIR))
    assert "sequence(" not in plan, plan
    assert "BroadcastHashJoin" in plan  # query side broadcast
    assert "BatchEvalPython" not in plan


def test_domain_blocklist_list_path_is_pure_filter(spark, entrymod):
    """Config-sized blocklists compile to an arrays_overlap Column filter:
    no joins, no exchanges — the filter can push below anything."""
    plan = _plan(entrymod.domain_blocklist(spark, SF_DIR))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_domain_blocklist_join_path_broadcasts(spark, entrymod):
    """DataFrame blocklists (UT1-sized) must broadcast both the suffix
    semi-join and the id anti-join back — the corpus never shuffles."""
    plan = _plan(entrymod.domain_blocklist_join(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_dup_span_plan_hashes_only_and_no_python(spark):
    """Substring dedup: only 64-bit gram hashes ride the count exchange
    (never gram text — the aggregate's input projects pos/gh), everything
    stays JVM-side (no Python eval nodes), and the interval merge is the
    window operator, not an iterative join."""
    from data_pipelines_spark.operators.dedup import dup_span_intervals

    docs = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta epsilon zeta end{i}") for i in range(20)],
        "doc_id long, text string",
    )
    plan = _plan(dup_span_intervals(docs, n=5, min_count=2))
    assert "EvalPython" not in plan            # pure Column expressions
    assert "Window" in plan                    # gaps-and-islands merge
    assert "CartesianProduct" not in plan
    # the frequent-gram aggregate groups by the xxhash64, not the string
    assert "xxhash64" in plan


def test_frontier_schedule_two_exchanges_no_python(spark, entrymod):
    """The fetch plan is exactly two window shuffles (domain, then worker)
    — no joins, no Python eval, everything codegen."""
    plan = _plan(entrymod.frontier_schedule(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_robots_filter_broadcasts_frontier_never_shuffles(spark, entrymod):
    plan = _plan(entrymod.robots_frontier_filter(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "EvalPython" not in plan  # the robots parse is a JVM fold


def test_quality_ntile_no_single_partition_window(spark, entrymod):
    """The global ntile must run as per-segment windows — an empty
    PARTITION BY (windowspecdefinition starting with the order column)
    would collapse the corpus into one task."""
    plan = _plan(entrymod.quality_ntile(spark, SF_DIR))
    assert "windowspecdefinition(_seg" in plan, plan
    # and the offsets join broadcasts (n_bins rows)
    assert "BroadcastHashJoin" in plan


def test_mixture_sample_is_pure_filter(spark, entrymod):
    """The rate card compiles to a scan+filter — no joins, no exchanges,
    nothing that wouldn't push below downstream operators."""
    plan = _plan(entrymod.mixture_sample(spark, SF_DIR))
    assert "Exchange" not in plan and "Join" not in plan
    assert "EvalPython" not in plan


def test_read_keys_point_lookup_pruned(spark, tmp_root):
    """read_keys (the serving path) must prune the scan to the keys' bucket
    directories and push the key IN-list through the LWW aggregate into the
    parquet scan — O(|keys|) buckets touched at any table size."""
    import datetime as dt

    from pyspark.sql import types as T

    from data_pipelines_spark.lake import LakeTable

    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("offset", T.LongType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "pk"), key="url", n_buckets=8,
        overwrite=True,
    )
    rows = [
        ("I", f"k{i}", dt.datetime(2025, 1, 1 + i % 20), i, "en")
        for i in range(64)
    ]
    t.merge(spark.createDataFrame(rows, schema), batch_id=1)
    df = t.read_keys(["k3", "k17"])
    plan = _formatted(df)
    # the IN predicate reaches the scan (row-group pruning at the footer)
    pushed = plan.split("PushedFilters: ")[1].splitlines()[0]
    assert "In(url" in pushed, pushed
    # only the probed keys' bucket dirs are in the scan's file listing:
    # every scanned location must be one of the expected bucket partitions
    from data_pipelines_spark.lake.table import bucket_id

    want = {
        r[0]
        for r in spark.createDataFrame([("k3",), ("k17",)], "url string")
        .select(bucket_id(F.col("url"), 8).alias("b"))
        .collect()
    }
    exec_plan = _plan(df)
    import re

    scanned = set(re.findall(r"_bucket=(\d+)", exec_plan))
    assert scanned, "no bucket partitions visible in the scan"
    assert scanned <= {str(b) for b in want}, (scanned, want)


def test_predicate_dml_matched_scan_column_pruned(spark, tmp_root):
    """delete_where(predicate_columns=[...]) matches against a read() pruned
    to key + seq + the named columns — the parquet scan must read ONLY those
    column chunks (a 100 TB purge predicate on `lang` must not drag `html`
    through the LWW resolve)."""
    import datetime as dt

    from pyspark.sql import types as T

    from data_pipelines_spark.lake import LakeTable

    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("offset", T.LongType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "dml"), key="url", n_buckets=4,
        overwrite=True,
    )
    rows = [
        ("I", f"k{i}", dt.datetime(2025, 1, 1), i, b"<x>", "tt", "en")
        for i in range(32)
    ]
    t.merge(spark.createDataFrame(rows, schema), batch_id=1)
    plan = _formatted(t.read(columns=["lang"]).where(F.col("lang") == "de"))
    for rs in plan.split("ReadSchema: ")[1:]:
        line = rs.splitlines()[0]
        assert "html" not in line and "text" not in line, line
        assert "lang" in line, line
