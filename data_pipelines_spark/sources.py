"""Source scans (SURVEY §2.1) as thin, typed helpers.

S1 — CSV URL work queue: the reference's ``load_urls_from_csv``
(``boxing/scrapers/boxrec/boxer.py:171-189``; pandas variant
``airflow/dags/scrape_html_zyte.py:87-107``) picks the ``url``/``URL``
column, drops nulls, dedups. S4 — directory scan of raw page files
(``boxing/run_validators.py:86-89``) becomes a ``binaryFile`` read carrying
(path, modificationTime, content). S7 — the due-work scan over the change
metadata (``boxing/database/change_detection.py:37-49``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_url_queue(spark: SparkSession, path: str, dedup: bool = True) -> DataFrame:
    """S1: CSV work queue → one non-null ``url`` column (case-insensitive
    header match), optionally distinct — the stream of things to ingest."""
    df = spark.read.csv(path, header=True)
    url_col = next((c for c in df.columns if c.lower() == "url"), None)
    if url_col is None:
        raise ValueError(f"no url column in {path}: {df.columns}")
    out = df.select(F.col(url_col).alias("url")).where(F.col("url").isNotNull())
    return out.distinct() if dedup else out


def read_page_files(spark: SparkSession, glob_path: str) -> DataFrame:
    """S4: directory of raw page files → (path, modificationTime, length,
    html) via the binaryFile source — new-file discovery is the streaming
    variant (``readStream.format('binaryFile')``)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.html")
        .load(glob_path)
        .select(
            "path",
            "modificationTime",
            "length",
            F.col("content").alias("html"),
        )
    )


def read_change_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Change-log tail in multiple wire formats.

    ``parquet`` is the native binlog-segment layout; ``json`` accepts
    JSON-lines segments where the ``html`` payload is base64 text (JSON has
    no binary type — the reference's scraper receives page bodies base64-
    encoded the same way, ``boxing/scrapers/boxrec/boxer.py:98-105``) and
    decodes it to the engine's binary column; ``csv`` likewise. Identical
    downstream pipeline regardless of wire format.
    """
    reader = spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
    if fmt == "parquet":
        return reader.schema(schema).parquet(path)
    from pyspark.sql import types as T

    def _csv_unsafe(dt: T.DataType) -> bool:
        return isinstance(dt, (T.MapType, T.ArrayType, T.StructType, T.BinaryType))

    # text formats: binary payloads arrive base64; for CSV, complex columns
    # (maps/arrays/structs from schema evolution) additionally travel as
    # JSON text, since the CSV source cannot carry them natively
    wire_fields = []
    json_cols: list[str] = []
    for f in schema.fields:
        if f.name == "html" or isinstance(f.dataType, T.BinaryType):
            wire_fields.append(T.StructField(f.name, T.StringType(), True))
        elif fmt == "csv" and _csv_unsafe(f.dataType):
            wire_fields.append(T.StructField(f.name, T.StringType(), True))
            json_cols.append(f.name)
        else:
            wire_fields.append(T.StructField(f.name, f.dataType, True))
    wire = T.StructType(wire_fields)
    if fmt == "json":
        df = reader.schema(wire).json(path)
    elif fmt == "csv":
        # multiLine: base64() emits MIME-chunked text with embedded
        # newlines, so quoted fields span physical lines (costs per-file
        # parallelism — yet another reason parquet is the native format)
        df = (
            reader.schema(wire)
            .option("header", True)
            .option("multiLine", True)
            .csv(path)
        )
    else:
        raise ValueError(fmt)
    for f in schema.fields:
        if f.name == "html" or isinstance(f.dataType, T.BinaryType):
            df = df.withColumn(f.name, F.unbase64(F.col(f.name)))
        elif f.name in json_cols:
            df = df.withColumn(f.name, F.from_json(F.col(f.name), f.dataType))
    return df


def due_work_scan(
    state: DataFrame,
    cutoff,
    key: str = "url",
    checked_col: str = "last_checked_at",
    limit: int | None = 100,
) -> DataFrame:
    """S7: keys due a re-check — never-checked first, then stalest-first,
    bounded batch (the reference's nulls-first ordering + LIMIT)."""
    out = (
        state.where(F.col(checked_col).isNull() | (F.col(checked_col) < F.lit(cutoff)))
        .select(key, checked_col)
        .orderBy(F.col(checked_col).asc_nulls_first(), F.col(key))
    )
    return out.limit(limit) if limit is not None else out


#: the 17 standard boxing weight divisions (public data; the reference seeds
#: the same set — ``boxing/database/seed_divisions.py:18-36``)
DIVISIONS = [
    ("minimumweight", "Minimumweight", "minimum", 105),
    ("light-flyweight", "Light Flyweight", "light fly", 108),
    ("flyweight", "Flyweight", "fly", 112),
    ("super-flyweight", "Super Flyweight", "super fly", 115),
    ("bantamweight", "Bantamweight", "bantam", 118),
    ("super-bantamweight", "Super Bantamweight", "super bantam", 122),
    ("featherweight", "Featherweight", "feather", 126),
    ("super-featherweight", "Super Featherweight", "super feather", 130),
    ("lightweight", "Lightweight", "light", 135),
    ("super-lightweight", "Super Lightweight", "super light", 140),
    ("welterweight", "Welterweight", "welter", 147),
    ("super-welterweight", "Super Welterweight", "super welter", 154),
    ("middleweight", "Middleweight", "middle", 160),
    ("super-middleweight", "Super Middleweight", "super middle", 168),
    ("light-heavyweight", "Light Heavyweight", "light heavy", 175),
    ("cruiserweight", "Cruiserweight", "cruiser", 200),
    ("heavyweight", "Heavyweight", "heavy", 201),
]


def seed_divisions(spark: SparkSession) -> DataFrame:
    """S8 dimension seed: the static divisions table (17 rows, broadcast-
    sized) — the engine analog of the reference's seeded dimension."""
    return spark.createDataFrame(
        DIVISIONS, "slug string, name string, short_name string, weight_limit_lbs int"
    )
