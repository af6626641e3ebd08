"""Incremental near-dup dedup index (operators/incremental.py): seen-set
semantics, exactly-once batch commits, and equivalence with the global
a<b near-dup rule."""

import os

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.operators.incremental import MinHashIndex


BASE = "the quick brown fox jumps over the lazy dog again and again today"
ROWS = [
    (0, BASE),
    (1, "totally different content about stock markets and bonds and yields"),
    (2, BASE + " extra"),          # within-batch near-dup of 0
    (10, BASE),                    # cross-batch dup of seen 0
    (11, "another unique document about cooking pasta with garlic and olive oil"),
    (20, BASE + " extra"),         # dup of seen 0/2 — and of DROPPED 10
    (21, "final unique doc mentioning astronomy telescopes and galaxies at night"),
]


def _batches(df):
    for b in range(3):
        yield b, df.where((F.col("doc_id") >= b * 10) & (F.col("doc_id") < b * 10 + 10))


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_seen_set_semantics(spark, docs, tmp_root):
    idx = MinHashIndex(spark, os.path.join(tmp_root, "idx"), threshold=0.8, n_parts=8)
    kept = {}
    for b, batch in _batches(docs):
        kept[b] = sorted(r.doc_id for r in idx.process_batch(batch, b).collect())
    assert kept == {0: [0, 1], 1: [11], 2: [21]}
    log = {(r.id, r.seen_id) for r in idx.dup_log().collect()}
    # dropped docs still join the seen set: 20 matches the DROPPED 10
    assert (20, 10) in log
    assert (2, 0) in log and (10, 0) in log


def test_replay_is_idempotent(spark, docs, tmp_root):
    idx = MinHashIndex(spark, os.path.join(tmp_root, "idx"), threshold=0.8, n_parts=8)
    for b, batch in _batches(docs):
        idx.process_batch(batch, b)
    bands_before = idx.seen_bands().count()
    replay = idx.process_batch(
        docs.where((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)), 1
    )
    assert sorted(r.doc_id for r in replay.collect()) == [11]
    assert idx.seen_bands().count() == bands_before
    assert idx.committed_batches() == ["0", "1", "2"]


def test_uncommitted_partitions_are_invisible(spark, docs, tmp_root):
    idx = MinHashIndex(spark, os.path.join(tmp_root, "idx"), threshold=0.8, n_parts=8)
    idx.process_batch(next(_batches(docs))[1], 0)
    before = idx.seen_bands().count()
    # simulate a crash-retried batch: partition files on disk, no marker
    orphan = spark.createDataFrame([(999, 0, 123, "99", 3)],
                                   "id long, band int, bucket long, batch_id string, bpart long")
    orphan.write.mode("append").partitionBy("batch_id", "bpart").parquet(
        os.path.join(tmp_root, "idx", "bands")
    )
    assert idx.seen_bands().count() == before
    assert 999 not in {r.id for r in idx.seen_bands().collect()}


def test_zero_dup_and_empty_batches(spark, docs, tmp_root):
    """A batch with no duplicates (or no rows at all) writes zero parquet
    files under dups/ (dynamic partition overwrite emits nothing) — the
    read-back and later store probes must survive on the marker-recorded
    schemas instead of footer inference."""
    idx = MinHashIndex(spark, os.path.join(tmp_root, "idx"), threshold=0.8, n_parts=8)
    clean = docs.where(F.col("doc_id").isin(1, 11, 21))  # mutually unique docs
    assert sorted(r.doc_id for r in idx.process_batch(clean, 0).collect()) == [1, 11, 21]
    assert idx.dup_log().count() == 0
    empty = docs.where(F.lit(False))
    assert idx.process_batch(empty, 1).count() == 0
    # the store still probes correctly after a no-dup and an empty commit
    assert idx.process_batch(
        spark.createDataFrame(
            [(100, ROWS[1][1]), (101, "fresh unique text about sailing boats on lakes")],
            "doc_id long, text string",
        ),
        2,
    ).count() == 1  # 100 duplicates seen doc 1; 101 survives
    assert {(r.id, r.seen_id) for r in idx.dup_log().collect()} == {(100, 1)}
    assert idx.committed_batches() == ["0", "1", "2"]


def test_compact_preserves_store_and_replay(spark, docs, tmp_root):
    """compact() folds the per-batch bands/shingles partitions into one
    consolidated batch (the streaming small-files fix) without changing
    probe results, and absorbed batches still replay their kept set."""
    idx = MinHashIndex(spark, os.path.join(tmp_root, "idx"), threshold=0.8, n_parts=8)
    for b, batch in _batches(docs):
        idx.process_batch(batch, b)
    bands_before = idx.seen_bands().count()
    sh_before = idx.seen_shingles().count()
    res = idx.compact()
    assert res["compacted"] and idx.committed_batches() == [res["batch_id"]]
    assert idx.seen_bands().count() == bands_before
    assert idx.seen_shingles().count() == sh_before
    # replay of an absorbed batch: recognized as committed, same kept set
    replay = idx.process_batch(
        docs.where((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)), 1
    )
    assert sorted(r.doc_id for r in replay.collect()) == [11]
    # a NEW batch still probes the consolidated store
    nb = spark.createDataFrame([(30, BASE), (31, "a wholly new sentence here")],
                               "doc_id long, text string")
    kept = sorted(r.doc_id for r in idx.process_batch(nb, 3).collect())
    assert kept == [31]  # 30 duplicates seen doc 0
    # idempotent: compacting again (now 2 live batches) keeps working
    res2 = idx.compact()
    assert res2["compacted"] and idx.seen_bands().count() > 0
    assert idx.is_committed(0) and idx.is_committed(3)


def test_matches_global_rule_regardless_of_batching(spark, tmp_root):
    """Incremental over id-ordered batches == the global non-recursive rule:
    doc d survives iff no doc with a smaller id has Jaccard ≥ threshold."""
    import random

    from data_pipelines_spark.operators.dedup import minhash_lsh_dedup_pairs

    rng = random.Random(7)
    vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    texts = []
    for i in range(60):
        if i % 5 == 0 and i > 0:
            # perturbed copy of an earlier doc → a genuine near-dup
            texts.append(texts[rng.randrange(len(texts))] + " " + rng.choice(vocab))
        else:
            texts.append(" ".join(rng.choice(vocab) for _ in range(40)))
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")

    idx = MinHashIndex(spark, os.path.join(tmp_root, "idx"), threshold=0.9, n_parts=8)
    kept = set()
    for b in range(3):
        batch = df.where((F.col("doc_id") >= b * 20) & (F.col("doc_id") < b * 20 + 20))
        kept |= {r.doc_id for r in idx.process_batch(batch, b).collect()}

    pairs = minhash_lsh_dedup_pairs(df, threshold=0.9)
    dropped = {r.b for r in pairs.collect()}  # a < b → b loses
    assert kept == set(range(60)) - dropped


def test_probe_scan_prunes_store_partitions(spark, docs, tmp_root):
    """The store probe must be partition-pruned to the batch's own bpart set
    (bpart = pmod(bucket, n_parts)): the filter reaches the parquet scan as
    a PartitionFilter, the matching partitions hold strictly fewer files
    than the store, and the pruned probe still catches cross-batch dups."""
    import glob

    idx = MinHashIndex(spark, os.path.join(tmp_root, "idx"), threshold=0.8, n_parts=64)
    for b, batch in _batches(docs):
        idx.process_batch(batch, b)

    # the bparts one doc's buckets land in — strictly fewer than the store's
    all_parts = {
        int(os.path.basename(d).split("=")[1])
        for d in glob.glob(os.path.join(tmp_root, "idx", "bands", "batch_id=*", "bpart=*"))
    }
    sub = sorted(all_parts)[: max(1, len(all_parts) // 3)]
    assert len(sub) < len(all_parts)

    pruned = idx.seen_bands(sub)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = plan[plan.index("PartitionFilters:"):].split("]")[0]
    assert "bpart" in pf, pf

    def files_in(parts):
        return [
            f
            for p in parts
            for f in glob.glob(
                os.path.join(
                    tmp_root, "idx", "bands", "batch_id=*", f"bpart={p}", "*.parquet"
                )
            )
        ]

    assert 0 < len(files_in(sub)) < len(files_in(all_parts))

    # end-to-end: with the pruning live, a cross-batch dup is still caught
    dup = spark.createDataFrame([(30, BASE)], "doc_id long, text string")
    assert idx.process_batch(dup, 3).count() == 0
    assert (30, 0) in {(r.id, r.seen_id) for r in idx.dup_log().collect()}


# ---------------------------------------------------------------------------
# EmbeddingIndex — the same seen-set/ledger discipline over sign-LSH buckets
# ---------------------------------------------------------------------------

VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.0, 1.0, 0.0, 0.0]),
    (2, [0.99, 0.1, 0.0, 0.0]),     # within-batch near-dup of 0
    (10, [1.0, 0.01, 0.0, 0.0]),    # cross-batch dup of seen 0
    (11, [0.0, 0.0, 1.0, 0.0]),
    (20, [0.98, 0.12, 0.0, 0.01]),  # dup of 0/2 — and of DROPPED 10
    (21, [0.0, 0.0, 0.0, 1.0]),
]


@pytest.fixture()
def vecs(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<double>")


def _vbatches(df):
    for b in range(3):
        yield b, df.where((F.col("vec_id") >= b * 10) & (F.col("vec_id") < b * 10 + 10))


def test_embedding_index_seen_set_semantics(spark, vecs, tmp_root):
    from data_pipelines_spark.operators.incremental import EmbeddingIndex

    idx = EmbeddingIndex(spark, os.path.join(tmp_root, "eidx"), threshold=0.9, n_parts=8)
    kept = {}
    for b, batch in _vbatches(vecs):
        kept[b] = sorted(r.vec_id for r in idx.process_batch(batch, b).collect())
    assert kept == {0: [0, 1], 1: [11], 2: [21]}
    log = {(r.id, r.seen_id) for r in idx.dup_log().collect()}
    # dropped vectors still join the seen set: 20 matches the DROPPED 10
    assert (20, 10) in log and (2, 0) in log and (10, 0) in log


def test_embedding_index_matches_batch_operator(spark, tmp_root):
    """Cumulative dup log over id-ordered batches == embedding_near_dup_lsh
    on the union (same planes, exact verify) — with a mid-stream compaction
    and an idempotent replay of an absorbed batch."""
    from data_pipelines_spark.operators.dedup import embedding_near_dup_lsh
    from data_pipelines_spark.operators.incremental import EmbeddingIndex

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    hi = e.agg(F.max("vec_id")).collect()[0][0] + 1
    step = (hi + 2) // 3
    idx = EmbeddingIndex(spark, os.path.join(tmp_root, "eidx"), threshold=0.3)
    for b in range(3):
        idx.process_batch(
            e.where((F.col("vec_id") >= b * step) & (F.col("vec_id") < (b + 1) * step)), b
        )
        if b == 1:
            assert idx.compact()["compacted"]
    inc = {(r.seen_id, r.id, round(r.cosine, 6)) for r in idx.dup_log().collect()}
    full = {
        (r.a, r.b, round(r.cosine, 6))
        for r in embedding_near_dup_lsh(e, threshold=0.3, n_planes=8).collect()
    }
    assert inc == full and len(inc) > 0
    # replay of a batch absorbed by the compaction: state unchanged
    before = idx.seen_vectors().count()
    idx.process_batch(e.where(F.col("vec_id") < step), 0)
    assert idx.seen_vectors().count() == before
    assert idx.dup_log().count() == len(inc)


def test_embedding_probe_scan_prunes_store_partitions(spark, vecs, tmp_root):
    from data_pipelines_spark.operators.incremental import EmbeddingIndex

    idx = EmbeddingIndex(spark, os.path.join(tmp_root, "eidx"), threshold=0.9, n_parts=8)
    for b, batch in _vbatches(vecs):
        idx.process_batch(batch, b)
    pruned = idx.seen_vectors([0, 1])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = plan[plan.index("PartitionFilters:"):].split("]")[0]
    assert "bpart" in pf, pf


def test_embedding_index_topk_matches_lsh_topk(spark, tmp_root):
    """The index's query path (probe buckets → pruned store scan → exact
    cosine) must equal similarity.lsh_topk over the seen corpus — same
    planes, no re-signing."""
    from data_pipelines_spark.operators.incremental import EmbeddingIndex
    from data_pipelines_spark.operators.similarity import lsh_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    hi = e.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = len(e.select("embedding").first()[0])
    idx = EmbeddingIndex(
        spark, os.path.join(tmp_root, "eidx"), threshold=0.3, dim=dim
    )
    step = (hi + 1) // 2
    for b in range(2):
        idx.process_batch(
            e.where((F.col("vec_id") >= b * step) & (F.col("vec_id") < (b + 1) * step)), b
        )
    idx.compact()
    q = e.where(F.col("vec_id") == 1).select("embedding").collect()[0][0]
    out = idx.topk(q, k=10, multiprobe=2)
    got = [(r.id, round(r.cosine, 6)) for r in out.collect()]
    want = [
        (r.vec_id, round(r.cosine, 6))
        for r in lsh_topk(e, q, k=10, n_planes=8, multiprobe=2).collect()
    ]
    assert got == want and len(got) == 10
    # plan pin: top-k straight off ONE pruned scan — the bucket filter is
    # PUSHED to parquet and ranking is TakeOrderedAndProject (no sort+limit
    # of the full store, no join, no Python)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "In(bucket" in plan, plan[plan.index("PushedFilters"):][:200]
    # empty-store query path
    idx2 = EmbeddingIndex(spark, os.path.join(tmp_root, "eidx2"), dim=dim)
    assert idx2.topk(q, k=5).count() == 0


def test_expire_replay_retention(spark, docs, tmp_root):
    """Replay-record retention: absorbed batches' kept/dups partitions can
    be expired once the source's re-delivery watermark passes them — the
    dup log drops their rows, new batches keep flowing, a straggler
    re-delivery below the watermark fails LOUD (never an empty kept set),
    and live/unabsorbed batches are not eligible."""
    idx = MinHashIndex(spark, os.path.join(tmp_root, "idx"), threshold=0.8, n_parts=8)
    for b, batch in _batches(docs):
        idx.process_batch(batch, b)
    with pytest.raises(ValueError, match="absorbed"):
        idx.expire_replay(["1"])  # still live: compaction hasn't absorbed it
    assert idx.compact()["compacted"]
    dups_before = idx.dup_log().count()
    out = idx.expire_replay(["0", "1"])
    assert set(out["expired"]) == {"0", "1"}
    # batch 1 had no dups; batch 0's (2, 0) pair is gone, batch 2's survive
    log = {(r.id, r.seen_id) for r in idx.dup_log().collect()}
    assert (2, 0) not in log and (20, 10) in log
    assert idx.dup_log().count() < dups_before
    # straggler re-delivery below the watermark: loud, not silent-empty
    with pytest.raises(ValueError, match="expired"):
        idx.process_batch(docs.where(F.col("doc_id") < 10), 0)
    # unexpired absorbed batches still replay; new batches still dedup
    assert sorted(
        r.doc_id for r in idx.process_batch(
            docs.where((F.col("doc_id") >= 20) & (F.col("doc_id") < 30)), 2
        ).collect()
    ) == [21]
    new = spark.createDataFrame([(30, BASE)], "doc_id long, text string")
    assert idx.process_batch(new, 3).count() == 0  # dup of seen 0 via store
    assert idx.is_committed("0")  # ledger memory survives expiry


def test_probe_is_query_only(spark, docs, tmp_root):
    """probe(): matches candidates against the seen set with exact Jaccard,
    commits NOTHING (state byte-identical), and does not pair query docs
    against each other."""
    idx = MinHashIndex(spark, os.path.join(tmp_root, "idx"), threshold=0.8, n_parts=8)
    idx.process_batch(docs.where(F.col("doc_id") < 10), 0)
    bands_before = idx.seen_bands().count()
    queries = spark.createDataFrame(
        [(50, BASE), (51, BASE + " extra"), (52, "entirely unrelated words about sailing boats")],
        "doc_id long, text string",
    )
    got = {(r.id, r.seen_id) for r in idx.probe(queries).collect()}
    # 50 and 51 match seen 0 and 2; 52 matches nothing; the near-identical
    # query pair (50, 51) is NOT reported — probe has no within-query side
    assert {(50, 0), (51, 2)} <= got
    assert all(q in (50, 51) and s < 10 for q, s in got)
    assert idx.seen_bands().count() == bands_before  # nothing committed
    assert idx.committed_batches() == ["0"]
    # empty store: clean empty frame
    idx2 = MinHashIndex(spark, os.path.join(tmp_root, "idx2"), n_parts=8)
    assert idx2.probe(queries).count() == 0


def test_embedding_index_batch_topk_matches_operator(spark, tmp_root):
    """batch_topk: every query answered from the store in one job equals
    similarity.batch_lsh_topk over the seen corpus (same planes)."""
    from data_pipelines_spark.operators.incremental import EmbeddingIndex
    from data_pipelines_spark.operators.similarity import batch_lsh_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dim = len(e.select("embedding").first()[0])
    idx = EmbeddingIndex(spark, os.path.join(tmp_root, "eidx"), threshold=0.3, dim=dim)
    idx.process_batch(e, 0)
    queries = e.where(F.col("vec_id") % 100 == 1).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    got = {
        (r.q_id, r.id, round(r.cosine, 6), r.rank)
        for r in idx.batch_topk(queries, k=5, multiprobe=1).collect()
    }
    want = {
        (r.q_id, r.vec_id, round(r.cosine, 6), r.rank)
        for r in batch_lsh_topk(e, queries, k=5, n_planes=8, multiprobe=1).collect()
    }
    assert got == want and len(got) > 0
    # empty store
    idx2 = EmbeddingIndex(spark, os.path.join(tmp_root, "eidx2"), dim=dim)
    assert idx2.batch_topk(queries, k=3).count() == 0


def test_embedding_index_degenerate_bucket_capped(spark, tmp_root):
    """EmbeddingIndex under a degenerate batch (4k identical vectors, one
    bucket): within-batch candidates are the id-sorted chain (linear, no
    O(|bucket|²) expand, no whole-bucket aggregated row), the seen-set rule
    still drops everything but the first id (dropped docs remain seen —
    non-recursive), and a follow-up batch into the same hot bucket is
    bounded by the pre-join store-side cap yet still fully dropped."""
    from data_pipelines_spark.operators.incremental import EmbeddingIndex

    n = 4000
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    idx = EmbeddingIndex(
        spark, os.path.join(tmp_root, "eidx"),
        threshold=0.95, max_bucket=50, max_probe=7, n_parts=4,
    )
    kept = idx.process_batch(vecs, 0)
    assert [r.vec_id for r in kept.collect()] == [0]
    assert idx.dup_log().count() == n - 1  # one chain predecessor per newcomer

    m = 100
    vecs2 = spark.range(n, n + m).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    kept2 = idx.process_batch(vecs2, 1)
    assert kept2.count() == 0
    batch2 = idx.dup_log().where(F.col("batch_id") == "1")
    # per newcomer: ≤ max_probe verified dups survive the caps
    assert 0 < batch2.count() <= m * 7


def test_minhash_index_retraction(spark, docs, tmp_root):
    """CDC deletes retract old content from the seen set: a near-dup of a
    retracted doc is KEPT, later batches still dedup against live content
    (incl. the newly kept doc), raw store rows are hidden at read time and
    purged physically by compact(), and retraction is idempotent."""
    idx = MinHashIndex(spark, os.path.join(tmp_root, "idx"), threshold=0.8, n_parts=8)
    b0 = docs.where(F.col("doc_id") < 10)
    assert sorted(r.doc_id for r in idx.process_batch(b0, 0).collect()) == [0, 1]
    # delete the two BASE-content docs (0 kept, 2 dropped-but-seen)
    idx.retract([0, 2], "r0")
    # 10 (BASE) now has NO live seen partner → kept; 11 unique → kept
    b1 = docs.where((F.col("doc_id") >= 10) & (F.col("doc_id") < 20))
    assert sorted(r.doc_id for r in idx.process_batch(b1, 1).collect()) == [10, 11]
    # the re-ingested content is seen again: 20 (BASE+extra) drops vs 10
    b2 = docs.where(F.col("doc_id") >= 20)
    assert sorted(r.doc_id for r in idx.process_batch(b2, 2).collect()) == [21]
    assert (20, 10) in {(r.id, r.seen_id) for r in idx.dup_log().collect()}
    # hidden at read time…
    live_ids = {r.id for r in idx.seen_bands().select("id").distinct().collect()}
    assert live_ids == {1, 10, 11, 20, 21}
    raw = spark.read.parquet(os.path.join(tmp_root, "idx", "bands"))
    assert {r.id for r in raw.select("id").distinct().collect()} == {
        0, 1, 2, 10, 11, 20, 21,
    }
    # …purged physically by compaction (retraction records retired with it)
    assert idx.compact()["compacted"]
    raw = spark.read.parquet(os.path.join(tmp_root, "idx", "bands"))
    assert {r.id for r in raw.select("id").distinct().collect()} == live_ids
    assert idx._live_retractions() is None
    assert {r.id for r in idx.seen_bands().select("id").distinct().collect()} == live_ids
    # idempotent re-delivery of the retraction batch
    assert idx.retract([0, 2], "r0") == {"batch_id": "r0", "replayed": True}


def test_embedding_index_retraction_and_serving(spark, vecs, tmp_root):
    """Same retraction contract on the vector store: a retracted vector's
    near-dups are kept, and topk never serves retracted ids."""
    from data_pipelines_spark.operators.incremental import EmbeddingIndex

    idx = EmbeddingIndex(spark, os.path.join(tmp_root, "eidx"), threshold=0.9, n_parts=8)
    b0 = vecs.where(F.col("vec_id") < 10)
    assert sorted(r.vec_id for r in idx.process_batch(b0, 0).collect()) == [0, 1]
    idx.retract([0, 2], "r0")
    # 10 ≈ 0: with 0 and 2 retracted it is kept
    b1 = vecs.where((F.col("vec_id") >= 10) & (F.col("vec_id") < 20))
    assert sorted(r.vec_id for r in idx.process_batch(b1, 1).collect()) == [10, 11]
    # ANN serving hides retracted ids
    got = {r.id for r in idx.topk([1.0, 0.0, 0.0, 0.0], k=5, multiprobe=2).collect()}
    assert 0 not in got and 2 not in got and 10 in got
    # physical purge + store-size assertion across the vacuum analog
    pre = idx.seen_vectors().count()
    idx.compact()
    raw = spark.read.parquet(os.path.join(tmp_root, "eidx", "vectors"))
    assert raw.count() == pre == idx.seen_vectors().count()


def test_retract_then_reingest_same_id(spark, tmp_root):
    """Epoch ordering: retract-then-reingest leaves the NEW version live —
    the index tracks the lake table's rewrite instead of keeping dead
    content forever."""
    idx = MinHashIndex(spark, os.path.join(tmp_root, "idx"), threshold=0.8, n_parts=8)
    old = spark.createDataFrame(
        [(5, BASE), (6, "unrelated words about gardening tulips in spring soil")],
        "doc_id long, text string",
    )
    idx.process_batch(old, 0)
    idx.retract([5], "r1")
    new = spark.createDataFrame(
        [(5, "rewritten page content entirely about sailing boats on lakes")],
        "doc_id long, text string",
    )
    idx.process_batch(new, 1)
    # the rewritten content (epoch after the retraction) is live and seen
    live = {r.id for r in idx.seen_shingles().select("id").distinct().collect()}
    assert live == {5, 6}
    probe = spark.createDataFrame(
        [(100, "rewritten page content entirely about sailing boats on lakes")],
        "doc_id long, text string",
    )
    hits = idx.probe(probe)
    assert {r.seen_id for r in hits.collect()} == {5}
    # but a probe matching the OLD (retracted) content finds nothing
    old_probe = spark.createDataFrame([(101, BASE)], "doc_id long, text string")
    assert idx.probe(old_probe).count() == 0


def test_pipeline_near_dup_retract_end_to_end(spark, tmp_root):
    """near_dup_retract=True on the CDC pipeline: a delete batch retracts
    the dead page's content from the index, so a later near-dup of it is
    KEPT in the table; near-dups of live content still drop; all-insert
    batches write EMPTY retractions that cost no hide-set join."""
    import datetime as dt

    from data_pipelines_spark.streaming.pipeline import CdcPipeline, PipelineConfig

    def ch(rows):
        return spark.createDataFrame(
            [
                (u, dt.datetime(2024, 1, d), off, op,
                 t.encode() if t else None, t, "en")
                for u, d, off, op, t in rows
            ],
            "url string, warc_ts timestamp, offset long, op string, "
            "html binary, text string, lang string",
        )

    pipe = CdcPipeline(
        spark,
        PipelineConfig(
            os.path.join(tmp_root, "t"),
            n_buckets=4,
            decode=False,
            near_dup_threshold=0.8,
            near_dup_retract=True,
        ),
    )
    uniq = "completely unrelated article about mountain hiking trails and gear"
    pipe.process_batch(ch([("a", 1, 1, "I", BASE), ("b", 1, 2, "I", uniq)]), 0)
    # all-'I' batch → empty retraction partition → skipped driver-side
    assert pipe.near_dup._live_retractions() is None
    pipe.process_batch(ch([("a", 2, 10, "D", None)]), 1)
    assert pipe.near_dup._live_retractions() is not None
    # c ≈ a(BASE): with a retracted it is kept
    pipe.process_batch(ch([("c", 3, 20, "I", BASE + " extra")]), 2)
    live = {r.url for r in pipe.table.read().select("url").collect()}
    assert live == {"b", "c"}
    # rewrite ('U') retracts the OLD content: a re-scrape of b with new text
    # stops suppressing near-dups of b's old text — e(≈ old b) is kept,
    # while f(≈ c, still live) drops
    pipe.process_batch(
        ch([("b", 4, 30, "U", "fully rewritten body on sailing boats regatta")]), 3
    )
    pipe.process_batch(
        ch([("e", 5, 40, "I", uniq + " extra"),
            ("f", 5, 41, "I", BASE + " extra words")]),
        4,
    )
    live = {r.url for r in pipe.table.read().select("url").collect()}
    assert live == {"b", "c", "e"}
    assert ("f", "c") in {
        (r.id, r.seen_id) for r in pipe.near_dup.dup_log().collect()
    }
