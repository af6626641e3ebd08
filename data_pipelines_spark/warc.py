"""WARC codec — the Common-Crawl wire format as an engine source/sink.

The reference stores each scraped page as one ``.html`` file on disk
(``boxing/run_validators.py:86-89`` directory scan; filenames carry the URL
via the F8 codec). The web-scale equivalent container is WARC (ISO 28500):
multi-record archive files of ~1 GB, each record one fetched resource with
typed headers — exactly what Common Crawl publishes. This module implements
a from-scratch WARC/1.0 reader and writer (public spec; no warcio):

- :func:`read_warc` — ``binaryFile`` scan of ``*.warc`` / ``*.warc.gz`` →
  one row per record ``(warc_file, record_id, warc_type, url, warc_ts,
  payload)``. Parsing runs in ``mapInPandas`` Arrow batches (one batch row =
  one archive file, the Common-Crawl unit of parallelism — a 1000-file crawl
  segment is a 1000-task scan, no shuffle). Gzipped archives use the
  standard member-per-record framing, handled by stdlib ``gzip`` multi-member
  decompression.
- :func:`warc_record_bytes` — row → serialized record, as a pandas UDF
  Column (pure function of (url, ts, payload); record ids are
  ``urn:uuid:md5(url|ts)`` so serialization is deterministic and replayable
  — no ``uuid4()``/``now()`` anywhere, per the engine's replay invariant).
- :func:`write_warc` — sink: one ``part-<partition>.warc[.gz]`` file per
  partition via ``mapInPandas`` (each task streams its rows through an
  incremental writer — never materializes an archive in memory), returning
  a (file, records, bytes) manifest DataFrame. Tasks write to a temp name
  and rename on completion, so a retried task never leaves a half archive
  visible; the manifest is the commit surface a caller should fsync/ledger
  (the lake table, not this sink, is the exactly-once boundary).

Record layout written (and accepted) — ``resource`` records carrying the
raw page bytes:

    WARC/1.0\\r\\n
    WARC-Type: resource\\r\\n
    WARC-Record-ID: <urn:uuid:...>\\r\\n
    WARC-Date: 2024-01-01T00:00:00Z\\r\\n
    WARC-Target-URI: https://...\\r\\n
    Content-Type: text/html\\r\\n
    Content-Length: <n>\\r\\n
    \\r\\n
    <payload>\\r\\n\\r\\n
"""

from __future__ import annotations

import gzip
import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"

READ_SCHEMA = (
    "warc_file string, record_pos long, record_id string, warc_type string, "
    "url string, warc_ts timestamp, payload binary"
)

MANIFEST_SCHEMA = "file string, records long, bytes long"


# ---------------------------------------------------------------------------
# serialization (pure, deterministic)
# ---------------------------------------------------------------------------


def _record_id(url: str, ts_iso: str) -> str:
    h = hashlib.md5(f"{url}|{ts_iso}".encode("utf-8")).hexdigest()
    return (
        f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def _serialize(url: str, ts_iso: str, payload: bytes) -> bytes:
    payload = b"" if payload is None else bytes(payload)
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: resource" + _CRLF
        + b"WARC-Record-ID: " + _record_id(url, ts_iso).encode() + _CRLF
        + b"WARC-Date: " + ts_iso.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
        + b"Content-Type: text/html" + _CRLF
        + b"Content-Length: " + str(len(payload)).encode() + _CRLF
        + _CRLF
    )
    return head + payload + _CRLF + _CRLF


def _ts_iso(ts) -> str:
    return pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")


def warc_record_bytes(url: Column, warc_ts: Column, payload: Column) -> Column:
    """Column: the serialized WARC record for one row (vectorized pandas
    UDF — Arrow batches, no per-row Python on the Spark side)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def ser(u: pd.Series, t: pd.Series, p: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _serialize(uu, _ts_iso(tt), pp)
                for uu, tt, pp in zip(u, t, p)
            ],
            dtype=object,
        )

    return ser(url, warc_ts, payload)


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------


def _parse_stream(buf: bytes) -> Iterator[tuple[str, str, str, str, bytes]]:
    """Yield (record_id, warc_type, url, date_iso, payload) from one
    archive's bytes. Tolerates trailing garbage/empty tail; raises on a
    malformed header block (fail-loud beats silent row loss)."""
    pos, n = 0, len(buf)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and buf[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        end = buf.find(_CRLF + _CRLF, pos)
        if end < 0:
            raise ValueError("truncated WARC header block")
        header = buf[pos:end].decode("utf-8", errors="replace")
        lines = header.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at byte {pos}: {lines[0]!r}")
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        length = int(fields["content-length"])
        body_start = end + 4
        payload = buf[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        yield (
            fields.get("warc-record-id", ""),
            fields.get("warc-type", ""),
            fields.get("warc-target-uri", ""),
            fields.get("warc-date", ""),
            payload,
        )
        pos = body_start + length


def _maybe_gunzip(content: bytes) -> bytes:
    if content[:2] == b"\x1f\x8b":
        # stdlib decompress handles the multi-member stream (one gzip
        # member per record, the CC framing) in one call
        return gzip.decompress(content)
    return content


def read_warc(spark: SparkSession, glob_path: str) -> DataFrame:
    """Scan WARC archives → one row per record.

    ``binaryFile`` source (one task per archive — the CC parallelism unit);
    per-file parse in mapInPandas. Filter/projection on the OUTPUT applies
    after parse; to skip whole archives use path globbing, the natural
    partition pruning for crawl segments.
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(glob_path)
        .select("path", "content")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = _maybe_gunzip(bytes(content))
                rows = [
                    (
                        path,
                        pos,
                        rid,
                        rtype,
                        url,
                        # WARC-Date is always UTC ('Z'); hand Spark a naive
                        # UTC wall time (session tz is UTC engine-wide)
                        pd.Timestamp(date).tz_convert("UTC").tz_localize(None),
                        payload,
                    )
                    for pos, (rid, rtype, url, date, payload) in enumerate(
                        _parse_stream(raw)
                    )
                ]
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "warc_file",
                        "record_pos",
                        "record_id",
                        "warc_type",
                        "url",
                        "warc_ts",
                        "payload",
                    ],
                )

    return files.mapInPandas(parse, READ_SCHEMA)


# ---------------------------------------------------------------------------
# sink
# ---------------------------------------------------------------------------


def write_warc(
    df: DataFrame,
    out_dir: str,
    *,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    compress: bool = False,
) -> DataFrame:
    """Write one ``part-<pid>.warc[.gz]`` per partition; returns the
    (file, records, bytes) manifest. Rows are streamed — a task holds one
    record in memory at a time, so archive size is bounded by the caller's
    partitioning (``df.repartition(k)`` → k archives), not by RAM.
    """
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    picked = df.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts"),
        F.col(payload_col).alias("payload"),
    )

    def writer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = 0 if ctx is None else ctx.partitionId()
        final = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        tmp = final + f".inprogress-{0 if ctx is None else ctx.attemptNumber()}"
        n = written = 0
        with open(tmp, "wb") as f:
            for pdf in batches:
                for u, t, p in zip(pdf["url"], pdf["warc_ts"], pdf["payload"]):
                    rec = _serialize(u, _ts_iso(t), p)
                    if compress:
                        rec = gzip.compress(rec, mtime=0)  # deterministic bytes
                    f.write(rec)
                    n += 1
                    written += len(rec)
        os.replace(tmp, final)  # atomic visibility: no half archives
        yield pd.DataFrame([(final, n, written)], columns=["file", "records", "bytes"])

    return picked.mapInPandas(writer, MANIFEST_SCHEMA)


# ---------------------------------------------------------------------------
# bootstrap adapter: crawl dump → change stream
# ---------------------------------------------------------------------------


def warc_as_changes(records: DataFrame) -> DataFrame:
    """Adapt a :func:`read_warc` scan into the engine's change-stream shape
    (op/url/warc_ts/offset/html) — the Common-Crawl bootstrap: a crawl dump
    is an insert-only CDC stream, so loading an archive set is just
    ``pipe.run_batches(warc_as_changes(read_warc(...)), ...)``.

    Offsets are ``xxhash64(file) ⊕ position`` — deterministic and
    collision-irrelevant: the offset only tie-breaks LWW *within one (url,
    warc_ts)*, i.e. among re-crawls of the same page at the same second,
    and any stable value picks a stable winner there.
    """
    return records.where(F.col("warc_type") == "resource").select(
        F.lit("I").alias("op"),
        "url",
        "warc_ts",
        F.xxhash64(F.col("warc_file")).bitwiseXOR(F.col("record_pos")).alias("offset"),
        F.col("payload").alias("html"),
        # the decode stage backfills lang from the page itself
        F.lit(None).cast("string").alias("lang"),
    )
