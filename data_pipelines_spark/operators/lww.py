"""Last-writer-wins dedup — the W1 operator at the heart of the CDC engine.

Reference semantics: newest HTML per URL (``boxing/database/change_detection.py:110-116``
``ORDER BY created_at DESC LIMIT 1``) and ``INSERT OR REPLACE`` whole-row LWW
(``boxing/load/to_staging_mirror_db.py:125-138``), generalized to the
``(key, seq...)`` max-sequence window BASELINE.json requires.

Two physical strategies, same semantics:

- ``lww_latest`` (default): ``max_by(struct(payload), struct(seq))`` groupBy.
  Spark plans this as a partial aggregation — hot keys are pre-combined
  map-side *before* the shuffle, so Zipf-skewed key distributions (popular
  domains) never concentrate raw rows onto one reducer. Preferred at scale.
- ``lww_latest_window``: ``row_number() over (partition by key order by seq
  desc) = 1``. Shuffles every raw row to its key's partition then sorts —
  simpler plan, used as the cross-check implementation and for cases that
  need the full winning row without column re-assembly.

``lww_latest_salted`` demonstrates the explicit two-phase salting variant for
engines without reliable partial aggregation; with Spark's hash aggregate +
AQE it exists mainly as documentation and a property-test target (all three
must agree on any input).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _seq_struct(seq_cols: Sequence[str]):
    return F.struct(*[F.col(c) for c in seq_cols])


def lww_latest(df: DataFrame, key: str | Sequence[str], seq_cols: Sequence[str]) -> DataFrame:
    """One winner per key: the row with the max ``(seq_cols)`` tuple.

    Partial-aggregating ``max_by`` formulation (skew-resistant).
    Ties broken deterministically by the full sequence tuple; callers should
    include a unique tiebreaker (e.g. log offset) as the last seq column.
    """
    keys = [key] if isinstance(key, str) else list(key)
    payload = [c for c in df.columns if c not in keys]
    out = (
        df.groupBy(*keys)
        .agg(F.max_by(F.struct(*payload), _seq_struct(seq_cols)).alias("_w"))
        .select(*keys, "_w.*")
    )
    return out.select(*df.columns)


def lww_latest_window(
    df: DataFrame, key: str | Sequence[str], seq_cols: Sequence[str]
) -> DataFrame:
    """Window-function formulation of LWW dedup (row_number == 1)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in seq_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .select(*df.columns)
    )


def lww_latest_salted(
    df: DataFrame,
    key: str | Sequence[str],
    seq_cols: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Explicit two-phase salted LWW: reduce within (key, salt), then across.

    Dedup is associative, so salting is safe: phase 1 spreads a hot key over
    ``n_salts`` reducers, phase 2 combines at most ``n_salts`` rows per key.
    """
    keys = [key] if isinstance(key, str) else list(key)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in seq_cols]), F.lit(n_salts))
    )
    phase1 = lww_latest(salted, keys + ["_salt"], seq_cols).drop("_salt")
    return lww_latest(phase1, keys, seq_cols)
