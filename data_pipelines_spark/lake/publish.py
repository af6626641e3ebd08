"""Publish stage: atomic snapshot export of a lake table (sink #3).

Reference: ``boxing/database/deploy/preview.py:209-283`` +
``sync_to_cloudflare.py:98-144`` — export every table, replace the serving
copy (delete+insert), verify row counts, gate on the validation suite.

Spark-native form: resolve the table to its current state, sanitize values
at the sink boundary (K8), write one atomic parquet/json snapshot directory
versioned by the source snapshot id, verify counts (K6), and keep a LATEST
pointer — the same write-audit-publish discipline as the lake commits.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_spark.lake.table import LakeTable
from data_pipelines_spark.operators.validation import CheckResult, suite_passed


class PublishError(RuntimeError):
    pass


def sanitize_for_export(df: DataFrame) -> DataFrame:
    """K8 value sanitization at the sink boundary
    (``sync_to_cloudflare.py:44-63``): booleans → int, binary → hex string —
    the lowest-common-denominator types a downstream serving store accepts.
    """
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        t = f.dataType.typeName()
        if t == "boolean":
            cols.append(c.cast("int").alias(f.name))
        elif t == "binary":
            cols.append(F.hex(c).alias(f.name))
        else:
            cols.append(c)
    return df.select(*cols)


def publish_snapshot(
    spark: SparkSession,
    table: LakeTable,
    out_root: str,
    fmt: str = "parquet",
    validation: list[CheckResult] | None = None,
) -> dict:
    """Export the table's current state as an immutable published snapshot.

    Gate on validation results if provided (the ``full`` pipeline's abort-
    on-failed-check, ``run_pipeline.py:144-151``). Returns a manifest with
    the row-count reconciliation (K6).
    """
    if validation is not None and not suite_passed(validation):
        failed = [r.name for r in validation if not r.passed]
        raise PublishError(f"validation gate failed: {failed}")

    version = table.current_version()
    df = sanitize_for_export(table.read())
    dest = os.path.join(out_root, f"snapshot-v{version}-{uuid.uuid4().hex[:8]}")
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(os.path.join(dest, "data"))
    elif fmt == "json":
        df.write.mode("overwrite").json(os.path.join(dest, "data"))
    elif fmt == "csv":
        # RFC-4180 doubled quotes (escape='"') so the verify reader below —
        # which parses with the same escape — round-trips values containing
        # quotes/newlines; Spark's default backslash escape would split such
        # rows and fail (or worse, coincidentally pass) reconciliation.
        (
            df.write.mode("overwrite")
            .option("header", True)
            .option("escape", '"')
            .csv(os.path.join(dest, "data"))
        )
    else:
        raise ValueError(fmt)

    source_rows = df.count()
    # read back with the writer's schema (no inference — an empty export
    # would otherwise fail schema inference) and, for CSV, multiLine so
    # quoted embedded newlines in text columns stay one record.
    data_dir = os.path.join(dest, "data")
    target_rows = {
        "parquet": lambda: spark.read.parquet(data_dir).count(),
        "json": lambda: spark.read.schema(df.schema).json(data_dir).count(),
        "csv": lambda: spark.read.schema(df.schema)
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(data_dir)
        .count(),
    }[fmt]()
    manifest = {
        "source_snapshot": version,
        "format": fmt,
        "rows_source": source_rows,
        "rows_published": target_rows,
        "match": source_rows == target_rows,
        "path": dest,
    }
    with open(os.path.join(dest, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    if not manifest["match"]:
        raise PublishError(f"count reconciliation failed: {manifest}")
    # atomic LATEST pointer, same discipline as the lake's CURRENT
    # (flush+fsync before rename, so a crash can't leave a torn pointer)
    tmp = os.path.join(out_root, f".latest-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(dest)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(out_root, "LATEST"))
    return manifest
