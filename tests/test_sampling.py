"""Corpus-shaping operators: domain capping, deterministic sampling,
benchmark decontamination (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.operators.sampling import (
    cap_per_group,
    contamination_flags,
    decontaminate,
    hash_sample,
)


def test_cap_per_group_keeps_lowest_keys(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 7 else "b") for i in range(10)], "doc_id long, g string"
    )
    got = sorted(
        (r.g, r.doc_id) for r in cap_per_group(df, "g", 3, "doc_id").collect()
    )
    assert got == [("a", 0), ("a", 1), ("a", 2), ("b", 7), ("b", 8), ("b", 9)]


def test_hash_sample_deterministic_and_rate(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    s1 = {r.doc_id for r in hash_sample(df, "doc_id", 13).collect()}
    s2 = {r.doc_id for r in hash_sample(df, "doc_id", 13).collect()}
    assert s1 == s2                      # replay-identical
    assert 0.08 < len(s1) / 2000 < 0.18  # ~13%
    # widening the rate is a superset — stable assignment, not a reshuffle
    s_wide = {r.doc_id for r in hash_sample(df, "doc_id", 40).collect()}
    assert s1 <= s_wide


def test_contamination_flags_and_decontaminate(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated content about markets today"),
            (3, "quick brown fox jumps over something else entirely here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "we saw the quick brown fox jumps over the fence")],
        "doc_id long, text string",
    )
    flags = {
        r.doc_id: (r.n_hits, r.contaminated)
        for r in contamination_flags(corpus, bench, n=5).collect()
    }
    assert flags[1][1] and flags[1][0] >= 1   # shares 'the quick brown fox jumps'
    assert flags[3][1]                        # shares 'quick brown fox jumps over'
    assert flags[2] == (0, False)
    kept = sorted(r.doc_id for r in decontaminate(corpus, bench, n=5).collect())
    assert kept == [2]


# ------------------------------------------------------------- domain filter


def _url_df(spark):
    rows = [
        (1, "https://www.example.com/a"),          # exact-domain block
        (2, "https://cdn.a.b.example.com/x?q=1"),  # deep subdomain block
        (3, "https://example.org/a"),              # different TLD — kept
        (4, "https://notexample.com/a"),           # suffix is label-wise, not string
        (5, "HTTPS://WWW.EXAMPLE.COM:8443/b"),     # case + port
        (6, "not a url at all"),                   # unparseable host — never matches
        (7, "https://blocked.net/"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_filter_domains_list_path(spark):
    from data_pipelines_spark.operators.sampling import filter_domains

    df = _url_df(spark)
    kept = sorted(
        r.doc_id for r in filter_domains(df, ["example.com", "blocked.net"]).collect()
    )
    assert kept == [3, 4, 6]
    allow = sorted(
        r.doc_id
        for r in filter_domains(df, ["example.com"], keep=True).collect()
    )
    assert allow == [1, 2, 5]


def test_filter_domains_dataframe_path_matches_list(spark):
    from data_pipelines_spark.operators.sampling import filter_domains

    df = _url_df(spark)
    bl = spark.createDataFrame(
        [("EXAMPLE.COM",), ("blocked.net",)], "domain string"
    )
    got = sorted(
        r.doc_id for r in filter_domains(df, bl, id_col="doc_id").collect()
    )
    assert got == [3, 4, 6]
    allow = sorted(
        r.doc_id
        for r in filter_domains(df, bl, id_col="doc_id", keep=True).collect()
    )
    assert allow == [1, 2, 5, 7]


# ------------------------------------------------------------------- sharding


def _token_df(spark, n=400, seed=3):
    import random

    rng = random.Random(seed)
    rows = [(i, rng.randint(5, 120)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_assign_shards_matches_global_cumsum(spark):
    import hashlib

    from data_pipelines_spark.operators.sharding import assign_shards

    d = _token_df(spark)
    got = {r.doc_id: r.shard_id for r in assign_shards(d, 1000).collect()}
    loc = sorted(
        (hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id, r.n_tokens)
        for r in d.collect()
    )
    cum, exp = 0, {}
    for _o, k, t in loc:
        exp[k] = cum // 1000
        cum += t
    assert got == exp


def test_assign_shards_budget_and_determinism(spark):
    from data_pipelines_spark.operators.sharding import assign_shards, shard_manifest

    d = _token_df(spark)
    s = assign_shards(d, 1000)
    man = shard_manifest(s).orderBy("shard_id").collect()
    max_doc = max(r.n_tokens for r in d.collect())
    # never split a doc → overflow bounded by one document; non-final shards
    # are filled to at least budget - max_doc; ids contiguous from 0
    assert all(r.tokens <= 1000 + max_doc for r in man)
    assert all(r.tokens >= 1000 - max_doc for r in man[:-1])
    assert [r.shard_id for r in man] == list(range(len(man)))
    again = assign_shards(d.repartition(17), 1000)
    assert {(r.doc_id, r.shard_id) for r in s.collect()} == {
        (r.doc_id, r.shard_id) for r in again.collect()
    }


def test_write_shards_roundtrip(spark, tmp_root):
    import os

    from data_pipelines_spark.operators.sharding import write_shards

    d = _token_df(spark, n=120)
    out = os.path.join(tmp_root, "shards")
    write_shards(d, out, tokens_per_shard=1000)
    back = spark.read.parquet(out)
    assert back.count() == 120
    assert back.select("shard_id").distinct().count() > 1


def test_weighted_sample_rates_and_determinism(spark):
    from data_pipelines_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, ["wiki", "cc", "spam"][i % 3]) for i in range(3000)],
        "doc_id long, source string",
    )
    out = weighted_sample(df, "doc_id", {"wiki": 100, "cc": 20, "spam": 0})
    by = {r.source: r.c for r in out.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert by.get("wiki") == 1000            # keep-all
    assert by.get("spam") is None            # rate 0 drops the group
    assert 100 < by["cc"] < 320              # ~20% of 1000, hash-exact not binomial
    # deterministic: identical subset on rerun
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in weighted_sample(df, "doc_id", {"wiki": 100, "cc": 20, "spam": 0}).collect())
    assert a == b
    # absent group: default caps when given
    capped = weighted_sample(df, "doc_id", {"spam": 0}, default=10)
    assert capped.where(F.col("source") == "wiki").count() < 250
    with pytest.raises(ValueError):
        weighted_sample(df, "doc_id", {"cc": 101})


def test_weighted_sample_null_id_fails_loud(spark):
    """A NULL id must raise, not silently drop the row (even from a
    keep-100% group the three-valued `scr < rate` predicate filters it)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from data_pipelines_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, "wiki"), (None, "wiki")], "doc_id long, source string"
    )
    with pytest.raises((Py4JJavaError, PySparkException), match="weighted_sample"):
        weighted_sample(df, "doc_id", {"wiki": 100}).collect()


def test_pack_positions_within_budget(spark):
    from data_pipelines_spark.operators.sharding import assign_shards

    df = spark.createDataFrame(
        [(i, 7 + i % 5) for i in range(400)], "doc_id long, n_tokens long"
    )
    out = assign_shards(df, 100, with_positions=True).collect()
    # global start = shard_id*budget + pack_start must tile the corpus:
    # doc k starts exactly where doc k-1 ended, beginning at 0
    rows = sorted(out, key=lambda r: (r.shard_id, r.pack_start))
    pos = 0
    for r in rows:
        assert r.shard_id * 100 + r.pack_start == pos, r
        pos += r.n_tokens
    assert pos == sum(7 + i % 5 for i in range(400))
    # every doc STARTS inside its shard's budget (only ends may spill)
    assert all(0 <= r.pack_start < 100 for r in rows)
