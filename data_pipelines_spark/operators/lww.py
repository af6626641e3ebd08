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

    Physical shape: ONE scan of the input. The first aggregation groups by
    (key, content_hash) — a bump therefore lands in the SAME group as the
    content rows it hash-matches, so the per-group content winner IS the
    bump's exact materialization; the second aggregation reduces the small
    per-(key, hash) winner set to one row per key. No joins, no repeated
    subtree evaluation (Spark re-executes repeated DataFrame references),
    both aggregations partial-aggregate map-side.
    """
    payload = [c for c in df.columns if c != key]
    seq = _seq_struct(seq_cols)
    is_content = (~F.col(bump_col)) & (~F.col(deleted_col))
    pay = F.struct(*payload)
    # level 1: per (key, hash-group) — deletes carry NULL hash and group
    # under the sentinel; bumps share their matched content rows' group
    grouped = df.groupBy(
        F.col(key), F.coalesce(F.col(hash_col), F.lit("\x00~")).alias("_h")
    ).agg(
        F.max_by(pay, seq).alias("_wh"),
        F.max_by(F.when(is_content, pay), F.when(is_content, seq)).alias("_chh"),
    )

    def seq_of(s):
        return F.struct(*[s[c] for c in seq_cols])

    # level 2: per key — overall winner (with its own group's content
    # winner riding along = the hash-matched materialization) + the
    # cross-group newest content row as the fallback
    per_key = grouped.groupBy(key).agg(
        F.max_by(
            F.struct(F.col("_wh").alias("w"), F.col("_chh").alias("m")),
            seq_of(F.col("_wh")),
        ).alias("_t"),
        F.max_by(
            F.col("_chh"),
            F.when(F.col("_chh").isNotNull(), seq_of(F.col("_chh"))),
        ).alias("_cw"),
    )
    w = F.col("_t.w")
    content = F.coalesce(F.col("_t.m"), F.col("_cw"))
    out_cols = [F.col(key)]
    for c in payload:
        if c == bump_col:
            continue
        if c in seq_cols:
            out_cols.append(w[c].alias(c))
        elif c == deleted_col:
            out_cols.append(
                F.when(w[bump_col], content.isNull()).otherwise(w[c]).alias(c)
            )
        else:
            out_cols.append(
                F.when(w[bump_col], content[c]).otherwise(w[c]).alias(c)
            )
    return per_key.select(*out_cols)


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
