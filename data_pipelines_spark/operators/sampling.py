"""Deterministic corpus shaping for training-data pipelines.

Three operators every large-scale data-mixing stage needs, all replay-
deterministic (no RNG on data — reruns and equality oracles reproduce the
exact subset):

- :func:`cap_per_group` — domain balancing: at most N documents per group
  (domain, language, source), lowest-key rows win. One shuffle (the window
  partition); at 100 TB the cap bounds every group's output so no reducer
  can be overwhelmed by a hot domain.
- :func:`hash_sample` — fixed-rate down-sampling keyed on a Knuth
  multiplicative scramble of the id (plain integer arithmetic any engine
  reproduces — the same scramble the IVF centroid sampler uses). Pure
  filter: no shuffle, pushes below joins.
- :func:`filter_domains` — UT1-style domain blocklist/allowlist with
  subdomain-suffix matching: a Column-only filter for config-sized lists,
  a broadcast suffix join for multi-million-domain lists.
- :func:`contamination_flags` / :func:`decontaminate` — benchmark
  decontamination: flag or drop corpus documents sharing any word n-gram
  with a benchmark/test set. The benchmark side is small by construction,
  so its distinct shingle set broadcasts and the corpus NEVER shuffles —
  one broadcast semi/anti join over exploded corpus shingles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_pipelines_spark.operators.dedup import word_shingles


def cap_per_group(
    df: DataFrame, group_col: str, max_per_group: int, order_col: str
) -> DataFrame:
    """Keep at most ``max_per_group`` rows per group — deterministic: the
    lowest ``order_col`` values win (ties impossible when ``order_col`` is
    a key). The domain-quota pass of a data-mixing pipeline."""
    w = Window.partitionBy(group_col).orderBy(F.col(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_per_group)
        .drop("_rn")
    )


def hash_sample(
    df: DataFrame, id_col: str, percent: int, mod: int = 100
) -> DataFrame:
    """Keep rows where ``((id * 2654435761) mod 2^32) mod mod < percent`` —
    a deterministic ~percent/mod sample, stable across reruns and engines
    (no ``rand()``, no seed state). ``id_col`` must be integral."""
    scr = F.pmod(
        F.pmod(F.col(id_col) * F.lit(2654435761), F.lit(4294967296)), F.lit(mod)
    )
    return df.where(scr < percent)


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per-document benchmark overlap: (id, n_hits, contaminated) where
    ``n_hits`` counts the document's distinct word ``n``-grams that appear
    anywhere in the benchmark set. Test-set decontamination's measurement
    half; :func:`decontaminate` is the removal half.

    The benchmark's distinct shingle set broadcasts (test sets are small);
    the corpus side is an exploded projection joined broadcast-semi — the
    corpus never shuffles and text never leaves its partitions.
    """
    bench_sh = F.broadcast(
        benchmark.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("sh")
        ).distinct()
    )
    corpus_sh = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("sh"),
    )
    hits = (
        corpus_sh.join(bench_sh, "sh", "left_semi")
        .groupBy("id")
        .agg(F.count_distinct("sh").alias("n_hits"))
    )
    return (
        corpus.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Drop every corpus document sharing ≥1 word ``n``-gram with the
    benchmark set (broadcast anti-join against flagged ids)."""
    flagged = (
        contamination_flags(corpus, benchmark, text_col, id_col, n)
        .where(F.col("contaminated"))
        .select(id_col)
    )
    return corpus.join(flagged, id_col, "left_anti")


def url_host(url: Column) -> Column:
    """Lower-cased host of a URL (scheme://host[:port]/... → host)."""
    return F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))


def _host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host: a.b.example.com →
    [a.b.example.com, b.example.com, example.com, com] — so a blocklist
    entry matches the exact domain and every subdomain."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."),
    )


def filter_domains(
    df: DataFrame,
    blocklist,
    url_col: str = "url",
    id_col: str | None = None,
    domain_col: str = "domain",
    keep: bool = False,
) -> DataFrame:
    """Domain blocklist/allowlist filter — the UT1-style URL filtering pass
    of a web-corpus pipeline.

    A blocklist ``domain`` matches the exact host and every subdomain
    (``example.com`` blocks ``a.b.example.com``). Rows with an unparseable
    host never match. ``keep=True`` flips to allowlist semantics (keep ONLY
    matching rows).

    Two scale shapes, picked by the blocklist type:

    - a Python sequence (config-sized lists) compiles to a pure
      ``arrays_overlap`` Column filter — zero joins, zero shuffles, pushes
      below anything;
    - a DataFrame (UT1-sized lists, ~3M domains) broadcast-semi-joins the
      exploded host-suffix projection (≤ label-count entries per row), then
      semi/anti-joins the matched ``id_col`` set back. The corpus rows never
      shuffle while the matched set is broadcastable (the typical blocklist
      case — match rate is a few percent); AQE degrades to one corpus
      shuffle only when the matched set itself is huge.
    """
    host = url_host(F.col(url_col))
    sfx = _host_suffixes(host)
    if not isinstance(blocklist, DataFrame):
        domains = F.array(*[F.lit(str(d).lower()) for d in sorted(set(blocklist))])
        # coalesce: a NULL url yields a NULL overlap — "never matches", same
        # as the join path's anti-join, not a three-valued-logic row drop
        hit = F.coalesce(F.arrays_overlap(sfx, domains), F.lit(False))
        return df.where(hit if keep else ~hit)
    if id_col is None:
        raise ValueError("a DataFrame blocklist requires id_col")
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(domain_col)).alias("_bl_domain")).distinct()
    )
    matched_ids = (
        df.select(F.col(id_col), F.explode(sfx).alias("_sfx"))
        .join(bl, F.col("_sfx") == F.col("_bl_domain"), "left_semi")
        .select(id_col)
        .distinct()
    )
    return df.join(matched_ids, id_col, "left_semi" if keep else "left_anti")


def weighted_sample(
    df: DataFrame,
    id_col: str,
    rates: dict[str, int],
    group_col: str = "source",
    default: int | None = None,
    mod: int = 100,
) -> DataFrame:
    """Per-group deterministic mixture sampling — the data-mixing rate card
    ("keep 100% of wiki, 12% of common-crawl, 0% of spam-src"): rows of
    group ``g`` survive iff ``scramble(id) mod mod < rates[g]``. The same
    Knuth scramble as :func:`hash_sample`, so replays and SQL engines pick
    the identical subset; a group absent from ``rates`` keeps everything
    unless ``default`` caps it. Config-sized rate card compiles to a CASE
    chain — pure filter, no joins, no shuffles, pushes below anything.

    ``id_col`` must be integral and non-NULL (same contract as
    :func:`hash_sample`): a NULL id would make the scramble NULL and the
    keep-predicate three-valued — silently dropping the row even from a
    keep-100% group — so NULL ids fail loud at runtime instead. The long
    multiply stays in [0, 2^63) for 32-bit ids; wider ids should be
    pre-hashed (``xxhash64``) to avoid ANSI-mode overflow."""
    if not 0 < mod:
        raise ValueError("mod must be positive")
    for g, r in rates.items():
        if not 0 <= r <= mod:
            raise ValueError(f"rate for {g!r} outside [0, {mod}]")
    rate = F.lit(mod if default is None else int(default))
    for g, r in rates.items():
        rate = F.when(F.col(group_col) == g, F.lit(int(r))).otherwise(rate)
    checked_id = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit(f"weighted_sample: NULL {id_col} (integral non-NULL id required)")),
    ).otherwise(F.col(id_col))
    scr = F.pmod(
        F.pmod(checked_id * F.lit(2654435761), F.lit(4294967296)), F.lit(mod)
    )
    return df.where(scr < rate)
