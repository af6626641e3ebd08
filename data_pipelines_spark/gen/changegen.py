"""Deterministic synthetic CDC stream of Common-Crawl-style web pages.

Everything is generated distributed (``spark.range`` + JVM expressions) and
seed-stable: no Python randomness, no wall clock, no driver-side loops — the
same ``(n_events, seed)`` always produces byte-identical parquet, which the
replay/equivalence suite depends on. Schema per FIXTURES.md §2::

    offset:long, op:string(I/U/D), url:string, warc_ts:timestamp,
    html:binary, lang:string, schema_version:int

Deliberate adversarial properties (FIXTURES.md §2 requirements):

- **Zipf-ish hot keys**: key ids are drawn via a power transform so a few
  urls/domains receive a large share of events (skew for the salted dedup
  and AQE skew-join paths to chew on).
- **Out-of-order event time**: ``warc_ts`` jitters ±5 min around offset
  order, so a later offset can carry an earlier timestamp (stale update).
- **Duplicate deliveries**: a deterministic subset of events is emitted
  twice with identical ``offset`` (at-least-once source).
- **Hash-unchanged re-scrapes**: html content depends on ``(key, epoch)``
  with epoch = offset bucket, so consecutive updates to a key often carry
  identical bytes (change-filter no-ops, reference
  ``boxing/database/metadata.py:57-69``).
- **Deletes + re-inserts**: ~3% deletes; keys keep receiving events after
  a delete, exercising tombstone LWW.
- **Mid-stream schema evolution**: events past ``evolve_at`` fraction carry
  ``schema_version=2`` and an extra ``meta`` map column.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: 2025-01-01 00:00:00 UTC as epoch seconds — a numeric literal so the
#: generated warc_ts (and the pinned golden hashes) cannot shift with the
#: session time zone of a consumer that didn't use get_spark().
BASE_EPOCH = 1735689600

LANGS = ["en", "en", "en", "de", "es", "fr", "it", "pt"]  # en-heavy like the web

_LOREM = (
    "the quick brown fox jumps over the lazy dog while seventy "
    "archived pages describe boxing records weather markets and news "
)


def _h(seed: int, *cols) -> F.Column:
    """Stable 64-bit hash stream: xxhash64 of the seed and any columns."""
    return F.xxhash64(F.lit(seed), *cols)


def _u01(seed: int, *cols) -> F.Column:
    """Uniform [0,1) derived from the hash (JVM-side, deterministic)."""
    return (F.pmod(_h(seed, *cols), F.lit(1_000_000)).cast("double")) / 1_000_000.0


def change_stream(
    spark: SparkSession,
    n_events: int,
    n_keys: int | None = None,
    seed: int = 42,
    n_domains: int = 64,
    skew: float = 2.0,
    delete_frac: float = 0.03,
    dup_every: int = 47,
    rescrape_epoch: int = 8,
    evolve_at: float | None = None,
    html_repeat: int = 0,
) -> DataFrame:
    """Build the change-stream DataFrame (one row per delivered event)."""
    if n_keys is None:
        n_keys = max(4, n_events // 4)

    df = spark.range(n_events).withColumnRenamed("id", "offset")

    # --- key with power-law skew: u^skew concentrates mass near key 0
    u = _u01(seed + 1, F.col("offset"))
    key_id = F.floor(F.pow(u, F.lit(skew)) * F.lit(n_keys)).cast("long")
    domain_id = F.pmod(key_id, F.lit(n_domains))
    url = F.concat(
        F.lit("https://site-"),
        F.lpad(domain_id.cast("string"), 3, "0"),
        F.lit(".example.com/page/"),
        key_id.cast("string"),
    )

    # --- event time: offset-proportional with ±300s jitter (out-of-order)
    jitter = F.pmod(_h(seed + 2, F.col("offset")), F.lit(600)) - F.lit(300)
    warc_ts = F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("offset") + jitter)

    # --- op mix: ~delete_frac 'D', 1/8 'I', rest 'U'
    opsel = _u01(seed + 3, F.col("offset"))
    op = (
        F.when(opsel < F.lit(delete_frac), F.lit("D"))
        .when(opsel < F.lit(delete_frac + 0.125), F.lit("I"))
        .otherwise(F.lit("U"))
    )

    # --- content epoch: changes only every `rescrape_epoch` events per key,
    # so many re-scrapes deliver byte-identical html (change-filter no-ops)
    epoch = F.floor(F.col("offset") / F.lit(rescrape_epoch * max(1, n_events // n_keys)))
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        (F.pmod(_h(seed + 4, key_id), F.lit(len(LANGS))) + 1).cast("int"),
    )
    # html_repeat pads the page body toward realistic Common-Crawl sizes
    # (~122 B per repeat; 80 ≈ 10 KB pages) — decode cost then dominates,
    # like real web pages, without changing any CDC semantics.
    html = _render_html(key_id, epoch, lang, seed, extra_repeat=html_repeat)

    out = df.select(
        F.col("offset"),
        op.alias("op"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        F.when(op == "D", F.lit(None).cast("binary")).otherwise(html).alias("html"),
        F.when(op == "D", F.lit(None).cast("string")).otherwise(lang).alias("lang"),
        F.lit(1).alias("schema_version"),
    )

    if evolve_at is not None:
        cut = int(n_events * evolve_at)
        out = out.withColumn(
            "schema_version",
            F.when(F.col("offset") >= cut, F.lit(2)).otherwise(F.lit(1)),
        ).withColumn(
            "meta",
            F.when(
                F.col("offset") >= cut,
                F.create_map(
                    F.lit("crawler"),
                    F.concat(F.lit("cc-"), F.pmod(F.col("offset"), F.lit(4)).cast("string")),
                ),
            ).otherwise(F.lit(None).cast("map<string,string>")),
        )

    # --- duplicate deliveries: every `dup_every`-th event re-emitted verbatim
    dups = out.where(F.pmod(F.col("offset"), F.lit(dup_every)) == 0)
    return out.unionByName(dups)


def _render_html(
    key_id: F.Column, epoch: F.Column, lang: F.Column, seed: int, extra_repeat: int = 0
) -> F.Column:
    """Small deterministic HTML page with structure for the extractors:
    a title, a ``profileTable`` row, a ``dataTable`` bout-like row, and a
    body paragraph whose content varies with the content epoch.
    """
    name = F.concat(F.lit("Page "), key_id.cast("string"))
    filler_n = (F.pmod(_h(seed + 5, key_id, epoch), F.lit(5)) + 2 + F.lit(extra_repeat)).cast("int")
    body = F.concat(
        F.lit(_LOREM),
        F.lit("revision marker "),
        epoch.cast("string"),
        F.lit(" "),
        F.repeat(F.lit(_LOREM), filler_n),
    )
    opponent = F.concat(F.lit("Opponent-"), F.pmod(_h(seed + 6, key_id, epoch), F.lit(97)).cast("string"))
    return F.concat(
        F.lit("<html><head><title>BoxRec: "),
        name,
        F.lit("</title></head><body><h1>"),
        name,
        F.lit('</h1><table class="profileTable"><tr><td>status</td><td>active</td></tr>'),
        F.lit("<tr><td>division</td><td>heavy</td></tr></table>"),
        F.lit('<table class="dataTable"><tr><td>2024-0'),
        (F.pmod(key_id, F.lit(9)) + 1).cast("string"),
        F.lit('-15</td><td><a class="personLink" href="/box-pro/'),
        F.pmod(_h(seed + 7, key_id, epoch), F.lit(99999)).cast("string"),
        F.lit('">'),
        opponent,
        F.lit('</a></td><td class="boutResult">W</td></tr></table><p>'),
        body,
        F.lit("</p><p lang=\""),
        lang,
        F.lit("\"></p></body></html>"),
    ).cast("binary")


def write_change_log(
    df: DataFrame, out_dir: str, n_segments: int = 16
) -> list[str]:
    """Write the stream as ordered parquet 'binlog segments'.

    Range-partitioned by offset so each segment holds a contiguous offset
    span — the file-source streaming read (``maxFilesPerTrigger``) then
    delivers roughly log-ordered microbatches, like tailing a real binlog.
    """
    (
        df.repartitionByRange(n_segments, "offset")
        .sortWithinPartitions("offset")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )


def expected_final_state(changes: DataFrame, key: str = "url") -> DataFrame:
    """Batch-oracle of the CDC replay: full-stream LWW, deletes removed.

    This is the specification the streaming MERGE must converge to from any
    checkpoint/batch slicing — used by the replay/equivalence tests and the
    DuckDB oracle in ``__spark_entry__.py``.
    """
    from data_pipelines_spark.operators.lww import lww_latest

    winners = lww_latest(changes, key, ("warc_ts", "offset"))
    return winners.where(F.col("op") != "D").drop("op")
