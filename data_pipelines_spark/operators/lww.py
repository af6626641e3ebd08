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


def lww_resolve_bumps(
    df: DataFrame,
    key: str,
    seq_cols: Sequence[str],
    bump_col: str = "_bump",
    deleted_col: str = "_deleted",
    hash_col: str = "content_hash",
) -> DataFrame:
    """LWW resolution aware of sequence-bump rows (op='B').

    A bump is a (key, seq, content_hash)-only delta the change filter emits
    for a hash-unchanged re-scrape: it advances the key's sequence without
    re-shipping the payload, so an out-of-order delete with a sequence
    between the stored row and the skipped re-scrape can no longer win
    (the resurrection edge the plain skip had).

    Resolution per key:

    - overall winner ``w`` = max-seq row (bumps and tombstones included);
    - if ``w`` is a bump, the key is LIVE and its payload comes from the
      newest content row whose ``content_hash`` equals the hash the bump
      observed (exact materialization of what the skipped re-scrape saw);
      if that row was compacted away, fall back to the newest content row;
      if no content row exists at all, the key resolves to a tombstone —
      all cases keep the bump's sequence so later LWW comparisons are
      correct;
    - otherwise ``w`` stands as-is (plain LWW).

    Cost: two partial-aggregated ``max_by`` groupings plus one join on
    (key, hash) for bump-winner keys only — and the whole path is engaged
    only while un-compacted bump deltas exist (compaction materializes
    bumps back into plain rows).
    """
    payload = [c for c in df.columns if c != key]
    seq = _seq_struct(seq_cols)
    is_content = (~F.col(bump_col)) & (~F.col(deleted_col))
    pay = F.struct(*payload)
    agg = df.groupBy(key).agg(
        F.max_by(pay, seq).alias("_w"),
        F.max_by(F.when(is_content, pay), F.when(is_content, seq)).alias("_cw"),
    )
    out_cols = [c for c in df.columns if c != bump_col]

    plain = agg.where(~F.col(f"_w.{bump_col}")).select(
        key, *[F.col(f"_w.{c}").alias(c) for c in payload if c != bump_col]
    )

    by_hash = (
        df.where(is_content)
        .groupBy(F.col(key).alias("_k2"), F.col(hash_col).alias("_h2"))
        .agg(F.max_by(pay, seq).alias("_ch"))
    )
    bumped = agg.where(F.col(f"_w.{bump_col}"))
    joined = bumped.join(
        by_hash,
        on=(bumped[key] == F.col("_k2"))
        & (F.col(f"_w.{hash_col}") == F.col("_h2")),
        how="left",
    )
    content = F.coalesce(F.col("_ch"), F.col("_cw"))
    resolved_cols = [F.col(key)]
    for c in payload:
        if c == bump_col:
            continue
        if c in seq_cols:
            resolved_cols.append(F.col(f"_w.{c}").alias(c))
        elif c == deleted_col:
            resolved_cols.append(content.isNull().alias(c))
        else:
            resolved_cols.append(content[c].alias(c))
    resolved = joined.select(*resolved_cols)
    return plain.unionByName(resolved).select(*out_cols)


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
