"""Incrementally-maintained materialized aggregates over a :class:`LakeTable`
— CDC view maintenance, the canonical downstream consumer of a change-capture
engine (the reference's per-run count/stat reports recomputed from the full
mirror DB, e.g. ``boxing/validate``'s global counts, become a view the ingest
keeps current per micro-batch instead of re-scanning the table).

Semantics: the view materializes ``SELECT <groups>, count(*) AS cnt,
sum(<measure>)… FROM table_final_state GROUP BY <groups>`` and is updated
per committed merge batch from that batch's *net effect* (post-image minus
pre-image of the touched keys), never by re-aggregating the table. Only
SUM-decomposable measures are supported (count / sum / avg-as-sum-over-cnt);
MIN/MAX are not retractable from deltas and are deliberately out of scope.

Storage is merge-on-read for aggregates, mirroring the main table's design:
each batch appends tiny signed delta rows ``(groups…, cnt, measures…)``
under ``deltas/batch_id=<b>/``; reading the view folds all committed deltas
with one ``groupBy(groups).sum()`` over O(n_batches × n_groups) rows, and
:meth:`compact` periodically collapses them to one row per group. There is
no read-modify-write of view state on the update path, so updates from
concurrent-looking retries can never double-apply or half-apply.

Exactly-once follows the engine-wide ledger discipline (lake/table.py,
operators/incremental.py): a batch's delta partition is written with dynamic
partition overwrite FIRST and its ledger marker LAST; reads filter to
marked batches, so a crash-retried update overwrites its own partial files
invisibly and re-marks. :meth:`update` is idempotent per ``batch_id``.

Scale shape (the 100 TB story): per-batch cost is O(batch) + two
bucket-pruned, column-pruned snapshot reads restricted to the batch's keys —
the unavoidable before-image cost of exact retraction on update/delete
streams (Flink does the same lookup against keyed RocksDB state; here the
key-bucketed table IS the keyed state). Touched keys come from the commit's
own delta files (``change_log``, O(batch) — never a table scan), touched
buckets from their hash (bounded by ``n_buckets``), and the pre/post scans
read only ``key + seq + source_columns`` column chunks from only those
buckets. The view itself never exceeds O(n_groups) live rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from data_pipelines_spark.functions.hashing import bucket_id
from data_pipelines_spark.lake.table import ChangeLogUnavailableError, LakeTable


class AggView:
    """A persistent incrementally-maintained GROUP BY view over a LakeTable.

    ``group_cols`` / ``measures`` are name→SQL-expression maps evaluated
    against the source table's rows; ``source_columns`` lists the physical
    columns those expressions read (the pre/post scans prune to exactly
    key + seq + these). All three are persisted in ``meta.json`` at
    :meth:`create` so :meth:`load` reopens the identical view definition.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        group_cols: dict[str, str],
        measures: dict[str, str],
        source_columns: list[str],
    ):
        if not group_cols:
            raise ValueError("at least one group column is required")
        bad = {"cnt", "batch_id"} & (set(group_cols) | set(measures))
        if bad:
            raise ValueError(f"reserved column names: {sorted(bad)}")
        self.spark = spark
        self.root = root
        self.group_cols = dict(group_cols)
        self.measures = dict(measures)
        self.source_columns = list(source_columns)
        self._deltas = os.path.join(root, "deltas")
        self._ledger_dir = os.path.join(root, "_ledger")
        os.makedirs(self._ledger_dir, exist_ok=True)

    # ------------------------------------------------------------- lifecycle

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        group_cols: dict[str, str],
        measures: dict[str, str],
        source_columns: list[str],
    ) -> "AggView":
        view = cls(spark, root, group_cols, measures, source_columns)
        meta = os.path.join(root, "meta.json")
        if os.path.exists(meta):
            raise FileExistsError(f"AggView already exists at {root}")
        os.makedirs(root, exist_ok=True)
        with open(meta, "w") as f:
            json.dump(
                {
                    "group_cols": view.group_cols,
                    "measures": view.measures,
                    "source_columns": view.source_columns,
                },
                f,
            )
        return view

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "AggView":
        with open(os.path.join(root, "meta.json")) as f:
            meta = json.load(f)
        return cls(
            spark,
            root,
            meta["group_cols"],
            meta["measures"],
            meta["source_columns"],
        )

    # ------------------------------------------------------------- ledger

    def _marker(self, batch_id) -> str:
        return os.path.join(self._ledger_dir, f"{batch_id}.json")

    def committed_batches(self) -> list[str]:
        return sorted(
            f[: -len(".json")]
            for f in os.listdir(self._ledger_dir)
            if f.endswith(".json")
        )

    def _absorbed(self) -> set[str]:
        out: set[str] = set()
        for b in self.committed_batches():
            with open(self._marker(b)) as f:
                out.update(json.load(f).get("absorbs", []))
        return out

    def is_committed(self, batch_id) -> bool:
        return os.path.exists(self._marker(str(batch_id))) or str(batch_id) in self._absorbed()

    def _stored_schema(self) -> StructType | None:
        """Read schema = the schema of the LATEST-applied batch (schema only
        evolves by widening/adding, so the newest superset reads every older
        delta partition). committed_batches() sorts lexicographically —
        batch '9' after '10' — so order by each marker's recorded
        table_version (mtime as the tiebreak for markers without one)."""
        best: tuple[int, float, dict] | None = None
        for b in self.committed_batches():
            path = self._marker(b)
            with open(path) as f:
                m = json.load(f)
            if m.get("schema") is None:
                continue
            rank = (int(m.get("table_version", -1)), os.path.getmtime(path), m)
            if best is None or rank[:2] > best[:2]:
                best = rank
        return StructType.fromJson(best[2]["schema"]) if best else None

    # ------------------------------------------------------------- update

    def _contrib(self, rows: DataFrame, sign: int) -> DataFrame:
        """Signed per-group contribution of a set of table rows."""
        groups = [F.expr(e).alias(n) for n, e in self.group_cols.items()]
        aggs = [F.sum(F.lit(sign)).cast("long").alias("cnt")] + [
            F.sum(F.expr(e) * F.lit(sign)).alias(n) for n, e in self.measures.items()
        ]
        return rows.groupBy(*groups).agg(*aggs)

    def update(self, table: LakeTable, batch_id: int | str) -> bool:
        """Fold one committed merge batch's net effect into the view.

        Returns False (no-op) when ``batch_id`` was already applied here.
        The batch must already be committed to ``table`` — the touched-key
        set is derived from that commit's own delta files.

        A ``LakeTable.rollback`` commit is itself a foldable batch (the
        snapshot diff reverts the view), but a batch REPLAYED after a
        rollback reuses its original batch id at a NEW table version — its
        old delta partition cannot simply be replaced (the rollback delta
        already netted against it), so that case fails loud: ``rebuild()``
        the view, which re-baselines and re-marks every ledger batch.
        """
        bid = str(batch_id)
        tl = table.ledger()
        if bid not in tl:
            raise ValueError(f"batch {bid!r} is not committed to the source table")
        post_v = tl[bid]
        marker = self._marker(bid)
        if os.path.exists(marker):
            with open(marker) as f:
                seen_v = json.load(f).get("table_version")
            if seen_v is not None and seen_v != post_v:
                raise ValueError(
                    f"batch {bid!r} was re-committed at v{post_v} after a "
                    f"rollback (view applied it at v{seen_v}) — rebuild() "
                    "the view to re-baseline"
                )
            return False
        if bid in self._absorbed():
            return False
        pre_v = post_v - 1

        key = table.key
        try:
            touched = table.change_log(pre_v, post_v).select(key).distinct()
        except ChangeLogUnavailableError:
            # CoW merges fold deltas into base files; the snapshot diff
            # still yields the touched keys (O(affected buckets), not O(batch))
            touched = table.changes(pre_v, post_v).select(key).distinct()
        # the touched-key frame is referenced three times below (bucket
        # probe + both semi-joins) and Spark does not CSE repeated plan
        # subtrees — persist it, materialized by the bucket collect
        touched = touched.persist()
        keys = F.broadcast(touched)
        # touched-bucket pruning must use EACH version's own layout: across a
        # rebucket pre_v and post_v disagree on n_buckets, and hashing the
        # keys with the current layout would prune away the very files that
        # hold them (silently losing contributions). Bounded driver collect:
        # at most that snapshot's n_buckets distinct values, cached per layout.
        bkt_cache: dict[int, list[int]] = {}

        def bkts_for(v: int) -> list[int]:
            nb = int(table._snapshot(v).get("n_buckets", table.n_buckets))
            if nb not in bkt_cache:
                bkt_cache[nb] = [
                    r["b"]
                    for r in touched.select(bucket_id(F.col(key), nb).alias("b"))
                    .distinct()
                    .collect()
                ]
            return bkt_cache[nb]

        def state(v: int) -> DataFrame:
            try:
                rows = table.read(
                    version=v, buckets=bkts_for(v), columns=self.source_columns
                )
            except (ValueError, FileNotFoundError):
                # pre-data snapshot: no schema yet → empty state
                return None
            return rows.join(keys, key, "left_semi")

        pre, post = state(pre_v), state(post_v)
        delta = self._contrib(post, 1)
        if pre is not None:
            delta = (
                delta.unionByName(self._contrib(pre, -1))
                .groupBy(*self.group_cols)
                .agg(
                    F.sum("cnt").alias("cnt"),
                    *[F.sum(n).alias(n) for n in self.measures],
                )
            )
        zero = (F.col("cnt") == 0) & F.lit(True)
        for n in self.measures:
            zero = zero & (F.col(n).isNull() | (F.col(n) == 0))
        delta = delta.where(~zero).withColumn("batch_id", F.lit(bid))

        (
            delta.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self._deltas)
        )
        touched.unpersist()
        schema = StructType([f for f in delta.schema.fields if f.name != "batch_id"])
        with open(self._marker(bid), "w") as f:
            json.dump({"table_version": post_v, "schema": schema.jsonValue()}, f)
        return True

    def update_all(self, table: LakeTable) -> int:
        """Apply every table batch this view hasn't seen, in commit order.
        The catch-up path after a view outage or a fresh view over an
        existing table. Returns the number of batches applied."""
        n = 0
        for bid, _v in sorted(table.ledger().items(), key=lambda kv: kv[1]):
            if self.update(table, bid):
                n += 1
        return n

    # ------------------------------------------------------------- read

    def _delta_rows(self) -> DataFrame | None:
        absorbed = self._absorbed()
        live = [b for b in self.committed_batches() if b not in absorbed]
        if not live:
            return None
        schema = self._stored_schema()
        if schema is None:
            return None
        # a committed batch may have written ZERO delta rows (pure seq-bump
        # or all-LWW-loser batches): dynamic overwrite emits no files then,
        # so the directory may not even exist yet — and with no partition
        # dirs on disk the batch_id partition column cannot be discovered,
        # so it must be part of the explicit read schema
        os.makedirs(self._deltas, exist_ok=True)
        from pyspark.sql.types import StringType, StructField

        full = StructType(list(schema.fields) + [StructField("batch_id", StringType())])
        df = self.spark.read.schema(full).parquet(self._deltas)
        return df.where(F.col("batch_id").isin(live))

    def read(self) -> DataFrame:
        """Current view state: one row per live group. O(batches × groups)
        delta rows folded by one aggregation — compaction keeps that small."""
        deltas = self._delta_rows()
        if deltas is None:
            raise ValueError("view has no committed batches yet")
        return (
            deltas.groupBy(*self.group_cols)
            .agg(
                F.sum("cnt").alias("cnt"),
                *[F.sum(n).alias(n) for n in self.measures],
            )
            .where(F.col("cnt") > 0)
        )

    # ------------------------------------------------------------- rebuild

    def rebuild(self, table: LakeTable) -> None:
        """Full refresh: recompute the aggregate from the table's CURRENT
        state and absorb every prior delta partition. The escape hatch for
        changes the incremental path cannot see — a :meth:`LakeTable.
        backfill` rewrites column values without advancing sequences, so no
        delta batch ever reports them; after one, rebuild any view whose
        measures read the backfilled column. Also marks every batch in the
        table's ledger as applied, so subsequent :meth:`update_all` resumes
        incrementally from here."""
        version = table.current_version()
        cid = f"rebuild-{version}"
        if self.is_committed(cid):
            return
        rows = table.read(version=version, columns=self.source_columns)
        folded = self._contrib(rows, 1).withColumn("batch_id", F.lit(cid))
        (
            folded.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self._deltas)
        )
        absorbed = sorted(
            set(self.committed_batches()) | set(map(str, table.ledger()))
        )
        schema = StructType([f for f in folded.schema.fields if f.name != "batch_id"])
        with open(self._marker(cid), "w") as f:
            json.dump(
                {"absorbs": absorbed, "schema": schema.jsonValue(),
                 "table_version": version},
                f,
            )
        for b in absorbed:
            if b != cid:
                try:
                    os.remove(self._marker(b))
                except FileNotFoundError:
                    pass

    # ------------------------------------------------------------- compact

    def compact(self) -> bool:
        """Fold all live delta partitions into one consolidated partition
        (one row per group), absorbing their markers — the view-side analog
        of the table's delta compaction. Idempotent: no-op when ≤1 live
        partition exists. Crash-safe: the consolidated partition is written
        first, its marker (carrying ``absorbs``) last; absorbed markers are
        deleted after, and a crash between leaves reads correct because
        ``absorbs`` masks them."""
        absorbed = self._absorbed()
        live = [b for b in self.committed_batches() if b not in absorbed]
        if len(live) <= 1:
            return False
        cid = f"viewcompact-{max(live)}"
        if self.is_committed(cid):
            return False
        folded = (
            self._delta_rows()
            .groupBy(*self.group_cols)
            .agg(
                F.sum("cnt").alias("cnt"),
                *[F.sum(n).alias(n) for n in self.measures],
            )
            .withColumn("batch_id", F.lit(cid))
        )
        (
            folded.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self._deltas)
        )
        schema = StructType([f for f in folded.schema.fields if f.name != "batch_id"])
        with open(self._marker(cid), "w") as f:
            json.dump({"absorbs": live, "schema": schema.jsonValue()}, f)
        for b in live:
            try:
                os.remove(self._marker(b))
            except FileNotFoundError:
                pass
        return True
