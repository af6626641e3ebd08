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
- :func:`contamination_flags` / :func:`decontaminate` — benchmark
  decontamination: flag or drop corpus documents sharing any word n-gram
  with a benchmark/test set. The benchmark side is small by construction,
  so its distinct shingle set broadcasts and the corpus NEVER shuffles —
  one broadcast semi/anti join over exploded corpus shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
