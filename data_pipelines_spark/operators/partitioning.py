"""Partitioning utilities: parallelism guards and skew salting helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition only when the input has fewer partitions than cores.

    Guards UDF-heavy operators against single-file inputs (one parquet file
    → one task → one Python worker). On a real cluster with thousands of
    input splits this is a no-op — no gratuitous shuffle.

    The partition count comes from the JVM plan's own RDD
    (``queryExecution().toRdd()``) — metadata only, no job. ``df.rdd`` would
    additionally build the Python-row conversion plan (an extra
    DeserializeToObject query execution) just to read one integer.
    """
    sc = df.sparkSession.sparkContext
    want = min_partitions or sc.defaultParallelism
    try:
        n = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:  # non-classic backends: fall back to the public path
        n = df.rdd.getNumPartitions()
    if n < want:
        return df.repartition(want)
    return df


def with_salt(df: DataFrame, n_salts: int, cols: list[str] | None = None) -> DataFrame:
    """Add a deterministic ``_salt`` column spreading hot keys across
    ``n_salts`` reducers (hash of ``cols``, or of the whole row position-free
    via all columns)."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("_salt", F.pmod(F.xxhash64(*basis), F.lit(n_salts)))
