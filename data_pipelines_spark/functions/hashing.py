"""Content hashing / change detection / bucketing expressions.

All JVM-side built-ins: ``sha2`` matches the reference's hex SHA-256 output
byte-for-byte; ``xxhash64`` drives the lake table's url-hash bucketing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_hash(col: Column) -> Column:
    """SHA-256 hex digest of a string or binary column.

    Reference: ``boxing/database/metadata.py:37-39``
    (``hashlib.sha256(html.encode()).hexdigest()``) — ``sha2(col, 256)``
    produces the identical lowercase hex string.
    """
    return F.sha2(col.cast("binary"), 256)


def change_flag(old_hash: Column, new_hash: Column) -> Column:
    """True when content changed (or no prior hash exists).

    Reference: ``boxing/database/metadata.py:57-69``.
    """
    return old_hash.isNull() | (old_hash != new_hash)


def bucket_id(key: Column, n_buckets: int) -> Column:
    """Deterministic hash bucket for a key column (lake-table partitioning).

    ``pmod(xxhash64(key), n)`` — stable across sessions/executors, cheap, and
    uniform; the lake's MERGE touches only buckets present in a batch.
    """
    return F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int")
