"""Near-dup dedup ON the CDC ingest path (PipelineConfig.near_dup_threshold):
the persistent MinHash index rides along with the table, drops documents
whose extracted text near-duplicates previously ingested content, never
self-blocks a re-scrape of the same key, and stays exactly-once under
batch re-delivery.
"""

import datetime as dt
import os

from pyspark.sql import functions as F

from data_pipelines_spark.streaming.pipeline import CdcPipeline, PipelineConfig

T1 = "the quick brown fox jumps over the lazy dog again and again today"
T2 = "completely different content about stock markets bonds and yields"
T3 = "final unique doc mentioning astronomy telescopes and galaxies at night"

SCHEMA = "url string, warc_ts timestamp, offset long, op string, html binary, lang string"


def _html(text: str) -> bytes:
    return f'<html lang="en"><body><p>{text}</p></body></html>'.encode()


def _ts(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, i)


def _batch(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(o), o, op, _html(t) if t else None, "en") for u, o, op, t in rows],
        SCHEMA,
    )


def test_near_dup_ingest_drops_cross_and_within_batch(spark, tmp_root):
    pipe = CdcPipeline(
        spark,
        PipelineConfig(
            os.path.join(tmp_root, "t"), n_buckets=8, near_dup_threshold=0.8
        ),
    )
    b0 = _batch(spark, [("a.com/x", 0, "I", T1), ("b.com/y", 1, "I", T2)])
    pipe.process_batch(b0, 0)
    assert {r.url for r in pipe.table.read().collect()} == {"a.com/x", "b.com/y"}

    b1 = _batch(
        spark,
        [
            # near-dup of seen a.com/x → dropped before the merge
            ("c.com/z", 2, "I", T1 + " extra"),
            # unique insert → lands
            ("d.com/w", 3, "I", T3),
            # delete passes through the filter untouched
            ("b.com/y", 4, "D", None),
        ],
    )
    pipe.process_batch(b1, 1)
    state = {r.url: r.text for r in pipe.table.read().collect()}
    assert set(state) == {"a.com/x", "d.com/w"}
    log = {(r.id, r.seen_id) for r in pipe.near_dup.dup_log().collect()}
    assert log == {("c.com/z", "a.com/x")}


def test_same_key_rescrape_is_never_self_blocked(spark, tmp_root):
    pipe = CdcPipeline(
        spark,
        PipelineConfig(
            os.path.join(tmp_root, "t"), n_buckets=8, near_dup_threshold=0.8
        ),
    )
    pipe.process_batch(_batch(spark, [("a.com/x", 0, "I", T1)]), 0)
    # re-scrape of the SAME url with near-identical text: LWW update applies
    pipe.process_batch(_batch(spark, [("a.com/x", 1, "U", T1 + " more")]), 1)
    rows = pipe.table.read().collect()
    assert len(rows) == 1 and "more" in rows[0].text and rows[0].offset == 1


def test_near_dup_ingest_exactly_once(spark, tmp_root):
    pipe = CdcPipeline(
        spark,
        PipelineConfig(
            os.path.join(tmp_root, "t"), n_buckets=8, near_dup_threshold=0.8
        ),
    )
    pipe.process_batch(_batch(spark, [("a.com/x", 0, "I", T1)]), 0)
    b1 = _batch(spark, [("c.com/z", 1, "I", T1 + " extra"), ("d.com/w", 2, "I", T2)])
    pipe.process_batch(b1, 1)
    bands = pipe.near_dup.seen_bands().count()
    state = {(r.url, r.offset) for r in pipe.table.read().collect()}
    # re-delivery: index replays its recorded kept set, merge skips by ledger
    stats = pipe.process_batch(b1, 1)
    assert stats.skipped_duplicate_batch
    assert pipe.near_dup.seen_bands().count() == bands
    assert {(r.url, r.offset) for r in pipe.table.read().collect()} == state


def test_near_dup_with_decode_false_signs_text_column(spark, tmp_root):
    pipe = CdcPipeline(
        spark,
        PipelineConfig(
            os.path.join(tmp_root, "t"),
            n_buckets=8,
            decode=False,
            near_dup_threshold=0.8,
        ),
    )
    df = spark.createDataFrame(
        [
            ("a", _ts(0), 0, "I", b"x", T1, "en"),
            ("b", _ts(1), 1, "I", b"y", T1 + " extra", "en"),
            ("c", _ts(2), 2, "I", b"z", T2, "en"),
        ],
        "url string, warc_ts timestamp, offset long, op string, html binary, "
        "text string, lang string",
    )
    pipe.process_batch(df, 0)
    assert {r.url for r in pipe.table.read().collect()} == {"a", "c"}


def test_pipeline_delete_where_retracts_index_content(spark, tmp_root):
    """Predicate DML through the pipeline composes with the index: a purge
    via pipe.delete_where commits as an ordinary CDC batch, so the dead
    content leaves the seen set (near_dup_retract) and a later near-dup of
    purged content is KEPT, while near-dups of live content still drop."""
    pipe = CdcPipeline(
        spark,
        PipelineConfig(
            os.path.join(tmp_root, "t"), n_buckets=8,
            near_dup_threshold=0.8, near_dup_retract=True,
        ),
    )
    pipe.process_batch(
        _batch(spark, [("a.com/x", 0, "I", T1), ("b.com/y", 1, "I", T2)]), 0
    )
    pipe.delete_where(
        F.col("url").startswith("a.com"),
        batch_id=1,
        seq={"warc_ts": _ts(10), "offset": 10},
    )
    assert {r.url for r in pipe.table.read().collect()} == {"b.com/y"}
    # near-dup of the PURGED content lands (dead content no longer suppresses)
    pipe.process_batch(_batch(spark, [("c.com/z", 20, "I", T1 + " extra")]), 2)
    assert {r.url for r in pipe.table.read().collect()} == {"b.com/y", "c.com/z"}
    # near-dup of LIVE content still drops
    pipe.process_batch(_batch(spark, [("d.com/w", 30, "I", T2 + " more")]), 3)
    assert {r.url for r in pipe.table.read().collect()} == {"b.com/y", "c.com/z"}


def test_pipeline_update_where_retracts_and_reingests(spark, tmp_root):
    """update_where through the pipeline is retract-then-reingest in ONE
    batch: the matched key's OLD content leaves the seen set, the rewritten
    content joins it at a later epoch — near-dups of the old text land,
    near-dups of the new text drop."""
    pipe = CdcPipeline(
        spark,
        PipelineConfig(
            os.path.join(tmp_root, "t"), n_buckets=8,
            near_dup_threshold=0.8, near_dup_retract=True,
        ),
    )
    pipe.process_batch(_batch(spark, [("a.com/x", 0, "I", T1)]), 0)
    pipe.update_where(
        F.col("url") == "a.com/x",
        {"html": _html(T3)},
        batch_id=1,
        seq={"warc_ts": _ts(10), "offset": 10},
    )
    got = {r.url: r.text for r in pipe.table.read().collect()}
    assert set(got) == {"a.com/x"} and "astronomy" in got["a.com/x"]
    # old content (T1) was retracted → its near-dup lands
    pipe.process_batch(_batch(spark, [("b.com/y", 20, "I", T1 + " extra")]), 2)
    # new content (T3) is in the seen set → its near-dup drops
    pipe.process_batch(_batch(spark, [("c.com/z", 30, "I", T3 + " more")]), 3)
    assert {r.url for r in pipe.table.read().collect()} == {"a.com/x", "b.com/y"}
