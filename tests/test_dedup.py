"""Dedup family: exactness of verified LSH pairs vs brute force, SimHash
blocking completeness, exact-dedup determinism."""

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.operators.dedup import (
    exact_dedup,
    exact_dup_groups,
    minhash_lsh_dedup_pairs,
    ngram_jaccard_pairs,
    shingle_jaccard,
    simhash_near_dup_pairs,
    word_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventy archived pages "
    "describe boxing records weather markets and news in great detail every day"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(40):
        rows.append((i, BASE + f" unique tail {i}", "blk"))
    # exact duplicates of doc 0 (whitespace-normalized)
    rows.append((100, BASE + " unique tail 0", "blk"))
    rows.append((101, "  " + BASE + "  unique   tail 0 ", "blk"))
    # near duplicate of doc 1 (one word changed)
    rows.append((102, (BASE + " unique tail 1").replace("quick", "rapid"), "blk"))
    # unrelated
    rows.append((103, "completely different tiny text", "blk"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_dedup_collapses_normalized_duplicates(spark, docs):
    groups = exact_dup_groups(docs).collect()
    assert len(groups) == 1 and sorted(groups[0].ids) == [0, 100, 101]
    kept = {r.doc_id for r in exact_dedup(docs).select("doc_id").collect()}
    assert 0 in kept and 100 not in kept and 101 not in kept
    assert len(kept) == docs.count() - 2


def test_minhash_verified_pairs_match_bruteforce(spark, docs):
    """Every verified LSH pair must equal brute-force all-pairs at the same
    threshold (LSH bounds recall, verification removes false positives; at
    0.9 with 16 bands × 4 rows the miss probability is ~1e-7)."""
    brute = {
        (r.a, r.b): round(r.jaccard, 6)
        for r in ngram_jaccard_pairs(docs, threshold=0.9, shingle_n=3, block_col=None).collect()
    }
    lsh = {
        (r.a, r.b): round(r.jaccard, 6)
        for r in minhash_lsh_dedup_pairs(docs, threshold=0.9, shingle_n=3).collect()
    }
    assert lsh == brute
    assert (0, 100) in lsh and (0, 101) in lsh and (100, 101) in lsh


def test_minhash_no_false_positives_below_threshold(spark, docs):
    pairs = minhash_lsh_dedup_pairs(docs, threshold=0.99).collect()
    for p in pairs:
        assert p.jaccard >= 0.99


def test_simhash_finds_exact_and_near_dups(spark, docs):
    pairs = {(r.a, r.b) for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()}
    assert (0, 100) in pairs and (0, 101) in pairs  # identical → hamming 0


def test_simhash_blocking_complete_within_guarantee(spark, docs):
    """Pigeonhole guarantee: every pair within Hamming ≤ 3 of the 64-bit
    signature shares ≥1 of the 4 16-bit chunks — chunk blocking must find
    exactly the brute-force pair set at that radius."""
    from data_pipelines_spark.operators.dedup import simhash

    sh = simhash(docs).select(F.col("doc_id").alias("id"), "simhash")
    a, b = sh.alias("a"), sh.alias("b")
    brute = {
        (r.a, r.b)
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a"),
            F.col("b.id").alias("b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("h"),
        )
        .where(F.col("h") <= 3)
        .collect()
    }
    blocked = {(r.a, r.b) for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()}
    assert blocked == brute


def test_shingle_jaccard_bounds(spark):
    df = spark.createDataFrame(
        [("a b c d e", "a b c d e"), ("a b c d e", "v w x y z")], "l string, r string"
    )
    vals = [r.j for r in df.select(shingle_jaccard(df, "l", "r", 2).alias("j")).collect()]
    assert vals[0] == 1.0 and vals[1] == 0.0


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([("one two",)], "t string")
    got = df.select(word_shingles(F.col("t"), 3).alias("s")).collect()[0].s
    assert got == ["one two"]


def test_simhash_md5_variant_matches_bruteforce(spark, docs):
    """The oracle-able md5 60-bit variant keeps the pigeonhole exactness:
    chunk blocking (4×15 bits) finds exactly the brute-force pair set."""
    from data_pipelines_spark.operators.dedup import simhash

    sh = simhash(docs, hash_fn="md5").select(F.col("doc_id").alias("id"), "simhash")
    assert all(r.simhash >= 0 for r in sh.collect())  # 60-bit → never negative
    a, b = sh.alias("a"), sh.alias("b")
    brute = {
        (r.a, r.b)
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a"),
            F.col("b.id").alias("b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("h"),
        )
        .where(F.col("h") <= 3)
        .collect()
    }
    blocked = {
        (r.a, r.b)
        for r in simhash_near_dup_pairs(docs, max_hamming=3, hash_fn="md5").collect()
    }
    assert blocked == brute and (0, 100) in blocked


def test_fingerprint_md5_matches_duckdb(spark):
    """The md5 fingerprint sketch is byte-identical to a DuckDB SQL rebuild
    (the property the correctness oracle relies on)."""
    import duckdb

    from data_pipelines_spark.extract.textqa import fingerprint_hex

    rows = [(1, "the quick brown fox jumps over the lazy dog"), (2, "tiny"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", fingerprint_hex(F.col("text"), hash_fn="md5").alias("fp")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(
        con.sql(
            """
        WITH g AS (
          SELECT doc_id, list_transform(
                   generate_series(1, greatest(len(nt) - 7, 1)),
                   i -> nt[i:i+7]) AS grams
          FROM (SELECT doc_id,
                       lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS nt
                FROM t)
        ), h AS (
          SELECT doc_id, list_sort(list_distinct(list_transform(
                   grams, s -> ('0x' || substr(md5(s), 1, 15))::UBIGINT::BIGINT))) AS hs
          FROM g
        )
        SELECT doc_id, sha256(array_to_string(
                 list_transform(hs[1:16], x -> CAST(x AS VARCHAR)), ',')) AS fp
        FROM h
        """
        ).fetchall()
    )
    assert got == want


def test_embedding_lsh_blocking_no_false_positives(spark):
    """Sign-LSH-blocked embedding near-dup: every emitted pair is exact-
    verified (no false positives), and equals the exact pair set restricted
    to bucket-sharing pairs — with enough planes the hot pairs collide."""
    from data_pipelines_spark.operators.dedup import (
        cosine_similarity,
        embedding_near_dup_lsh,
    )
    from data_pipelines_spark.operators.similarity import (
        _hyperplanes,
        random_hyperplane_bucket,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {
        (r.a, r.b): r.cosine
        for r in embedding_near_dup_lsh(e, threshold=0.3).collect()
    }
    # exact all-pairs with bucket annotation
    dim = len(e.select("embedding").first()[0])
    planes = _hyperplanes(dim, 8, 42)
    v = F.col("embedding").cast("array<double>")
    bk = e.select(
        F.col("vec_id").alias("id"), v.alias("v"),
        random_hyperplane_bucket(v, planes).alias("bkt"),
    )
    a, b = bk.alias("a"), bk.alias("b")
    exact = {
        (r.a, r.b): (r.cos, r.same_bucket)
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a"), F.col("b.id").alias("b"),
            cosine_similarity(F.col("a.v"), F.col("b.v")).alias("cos"),
            (F.col("a.bkt") == F.col("b.bkt")).alias("same_bucket"),
        )
        .where(F.col("cos") >= 0.3)
        .collect()
    }
    want = {p: c for p, (c, same) in exact.items() if same}
    assert set(got) == set(want)          # exactly the bucket-sharing pairs
    for p, c in got.items():
        assert abs(c - want[p]) < 1e-9    # exact verify, no false positives


def test_near_dup_clusters_and_canonical(spark):
    """Connected components over a hand-built pair graph (two clusters +
    a chain) and the corpus-level keep-canonical anti-join."""
    from data_pipelines_spark.operators.dedup import (
        dedup_keep_canonical,
        near_dup_clusters,
    )

    # cluster {1,2,3} (chain 1-2, 2-3), cluster {7,9}; 5 untouched
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 9)], "a long, b long")
    got = {
        r.id: r.cluster for r in near_dup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}

    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 5, 7, 9)], "doc_id long, text string"
    )
    kept = sorted(
        r.doc_id for r in dedup_keep_canonical(corpus, pairs).collect()
    )
    assert kept == [1, 5, 7]  # canonical per cluster + untouched docs


def test_near_dup_clusters_long_chain_converges_logarithmically(spark):
    """A chain far longer than max_iter converges — pointer jumping gives
    O(log diameter) rounds, so a 300-link chain (diameter 300) finishes in
    ≤ 12 rounds. The plain-propagation algorithm this replaced would need
    300 rounds and silently return wrong labels (VERDICT r2 #1: the
    max_bucket fallback in minhash_lsh_candidates manufactures exactly
    such chains from boilerplate buckets)."""
    from data_pipelines_spark.operators.dedup import near_dup_clusters

    n = 300
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a long, b long"
    )
    got = {r.id: r.cluster for r in near_dup_clusters(pairs, max_iter=12).collect()}
    assert len(got) == n + 1
    assert set(got.values()) == {0}  # one cluster, canonical = min id


def test_line_dedup_removes_cross_doc_boilerplate(spark):
    """CCNet/RefinedWeb-style line dedup: lines trimmed-equal across ≥2 docs
    vanish, per-doc line order is preserved, all-boilerplate docs stay as
    rows with empty text."""
    from data_pipelines_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "BANNER\nalpha one\nshared section\nomega one\nFOOTER"),
            (2, "BANNER\nalpha two\n  shared section  \nFOOTER"),  # trim-match
            (3, "BANNER\nFOOTER"),  # nothing unique survives
            (4, "solo line only"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text for r in line_dedup(docs, min_docs=2).collect()}
    assert got[1] == "alpha one\nomega one"  # order kept, boilerplate gone
    assert got[2] == "alpha two"
    assert got[3] == ""                       # row kept, text emptied
    assert got[4] == "solo line only"


def test_pii_redaction_goldens(spark):
    from pyspark.sql import functions as F2

    from data_pipelines_spark.functions.redact import redact_pii

    cases = [
        ("mail me at jo.doe+x@sub.example.co.uk now",
         "mail me at <EMAIL> now"),
        ("server 192.168.001.1 rebooted", "server <IP> rebooted"),
        ("call +44 (0) 7911 123-456 today", "call <PHONE> today"),
        ("year 2024 and id 7 stay", "year 2024 and id 7 stay"),
        ("a@b.io or 10.0.0.1 or 555-010-9999",
         "<EMAIL> or <IP> or <PHONE>"),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "raw string")
    got = [r.o for r in df.select(redact_pii(F2.col("raw")).alias("o")).collect()]
    assert got == [want for _, want in cases]


def test_near_dup_clusters_fails_loud_on_non_convergence(spark):
    """If labels still change at max_iter the operator raises instead of
    returning half-propagated labels (silent under-dedup at scale)."""
    import pytest

    from data_pipelines_spark.operators.dedup import near_dup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "a long, b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_clusters(pairs, max_iter=2)


def test_dup_span_intervals_merges_overlaps(spark):
    """Substring dedup (Lee et al. 2022 pass): 5-grams occurring >=2x
    corpus-wide mark spans; overlapping/adjacent gram hits merge into one
    [start, end) interval; within-doc repetition counts toward min_count."""
    from data_pipelines_spark.operators.dedup import dup_span_intervals

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta unique1 one two"),
            (2, "prefix2 alpha beta gamma delta epsilon zeta tail2 x"),
            (3, "totally distinct text with no repeats at all here"),
            (4, "alpha beta gamma delta epsilon zeta alpha beta gamma delta epsilon zeta"),
            (5, "short"),  # fewer than n tokens: no grams, no rows
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in dup_span_intervals(docs, n=5, min_count=2).collect()
    }
    # doc1 dup grams at pos 0 and 1 merge to [0, 6) — the shared 6-token
    # passage; doc2 shifted by its one-token prefix; doc4 is the passage
    # twice, so every gram is duplicated and the whole doc is covered
    assert got == {(1, 0, 6), (2, 1, 7), (4, 0, 12)}


def test_remove_dup_spans_keeps_unique_remainder(spark):
    from data_pipelines_spark.operators.dedup import remove_dup_spans

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta unique1 one two"),
            (2, "prefix2 alpha beta gamma delta epsilon zeta tail2 x"),
            (3, "totally distinct text with no repeats at all here"),
            (4, "alpha beta gamma delta epsilon zeta alpha beta gamma delta epsilon zeta"),
            (5, "short"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text for r in remove_dup_spans(docs, n=5, min_count=2).collect()}
    assert got[1] == "unique1 one two"
    assert got[2] == "prefix2 tail2 x"
    assert got[3] == "totally distinct text with no repeats at all here"
    assert got[4] == ""      # row kept, all tokens were duplicated passage
    assert got[5] == "short"
    assert len(got) == 5     # row count stable


def test_embedding_lsh_degenerate_bucket_chain_capped(spark):
    """A degenerate sign-LSH bucket (5k identical vectors → ONE bucket) must
    not expand O(m²) pairs or aggregate the whole bucket into a single row:
    above max_bucket the expansion is the id-sorted adjacent chain — linear
    pair count, every member still connected through verified cosine-1.0
    links (VERDICT r4 "What's wrong #1")."""
    from data_pipelines_spark.operators.dedup import embedding_near_dup_lsh

    n = 5000
    e = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0), F.lit(3.0)).alias("embedding"),
    )
    rows = embedding_near_dup_lsh(e, threshold=0.95, max_bucket=100).collect()
    assert len(rows) == n - 1  # chain, not C(n, 2) ≈ 12.5M
    assert {(r.a, r.b) for r in rows} == {(i, i + 1) for i in range(n - 1)}
    assert all(abs(r.cosine - 1.0) < 1e-9 for r in rows)


def test_embedding_lsh_cap_inactive_below_max_bucket(spark):
    """With every bucket under max_bucket the capped operator is exactly the
    all-pairs expansion — the default cap cannot change results on corpora
    without degenerate buckets."""
    from data_pipelines_spark.operators.dedup import embedding_near_dup_lsh

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    capped = {
        (r.a, r.b): round(r.cosine, 9)
        for r in embedding_near_dup_lsh(e, threshold=0.3).collect()
    }
    uncapped = {
        (r.a, r.b): round(r.cosine, 9)
        for r in embedding_near_dup_lsh(e, threshold=0.3, max_bucket=10**9).collect()
    }
    assert capped == uncapped and len(capped) > 0
