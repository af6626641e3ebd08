"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side architecture is real and tested — schemas, partition-aware
``mapInPandas`` batch iteration, Arrow batch shapes, deterministic fake
features — while the actual media decoding is stubbed behind
``NotImplementedError`` / a deterministic fake, because no image/audio codec
libraries exist in this container (per the build brief). Swapping the stub
for PIL/torchaudio changes one function body, not the plan shape.

Design rules for 100 TB of media:

- media bytes live in a ``binary`` column next to a typed ``media_meta``
  struct (mime, width, height, duration_ms, sample_rate) so planners can
  filter/prune on metadata without touching bytes;
- decode/feature-extract runs via ``mapInPandas`` (whole Arrow batches, one
  Python worker round-trip per ~10k rows), never per-row UDFs;
- feature output is a fixed-length ``array<float>`` ready for the
  similarity operators (``operators/similarity.py``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_meta", MEDIA_META),
    ]
)

FEATURE_DIM = 64


def real_decode(payload: bytes, mime: str):
    """The codec boundary. Container has no media libraries — see module doc."""
    raise NotImplementedError(
        "media decoding requires codec libraries (PIL/ffmpeg/torchaudio) "
        "not present in this environment; use fake_features for plumbing"
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in features: blake2b-seeded pseudo-embedding.

    Stable across replays/platforms, so the downstream plumbing (schema,
    partitioning, similarity join) is testable end-to-end without codecs.
    """
    seed = int.from_bytes(hashlib.blake2b(payload or b"", digest_size=8).digest(), "big")
    rng = np.random.RandomState(seed % (2**32))
    v = rng.randn(dim).astype(np.float32)
    return v / (np.linalg.norm(v) or 1.0)


def extract_media_features(df: DataFrame, batch_hint: int = 4096) -> DataFrame:
    """media rows → (media_id, kind, feature:array<float>) via mapInPandas.

    Column-pruned input (id, kind, payload only — metadata/byte columns the
    extractor doesn't need are never shipped to Python), whole-batch Arrow
    transfer, one output row per input row.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_features(bytes(p) if p is not None else b"").tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return df.select("media_id", "kind", "payload").mapInPandas(op, out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms).

    The timestamps come from metadata (duration), so the fan-out is a pure
    JVM ``explode(sequence(...))`` — the expensive per-frame decode happens
    only afterwards, on an already-partitioned frame list. Decode stubbed.
    """
    frames = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(F.coalesce(F.col("media_meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
            F.lit(every_ms),
        )
    ).alias("frame_ts_ms")
    return df.where(F.col("kind") == "video").select("media_id", frames)


def resize_plan(df: DataFrame, max_side: int = 512) -> DataFrame:
    """Image resize *plan*: target dims computed JVM-side from metadata;
    the pixel work (stubbed) would run in mapInPandas batches."""
    w = F.coalesce(F.col("media_meta.width"), F.lit(0))
    h = F.coalesce(F.col("media_meta.height"), F.lit(0))
    scale = F.when(
        F.greatest(w, h) > max_side, F.greatest(w, h) / F.lit(float(max_side))
    ).otherwise(F.lit(1.0))
    return df.where(F.col("kind") == "image").select(
        "media_id",
        (w / scale).cast("int").alias("target_w"),
        (h / scale).cast("int").alias("target_h"),
    )


def synth_media(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table exercising the full schema."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    payload = F.sha2(F.concat(F.lit("media"), F.col("id").cast("string")), 512).cast("binary")
    meta = F.struct(
        F.concat(F.lit("application/x-fake-"), kinds).alias("mime"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 2)), F.lit(1080)) + 16).cast("int").alias("height"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 3)), F.lit(60000)) + 1000).cast("int").alias("duration_ms"),
        F.lit(16000).alias("sample_rate"),
    )
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            kinds.alias("kind"),
            payload.alias("payload"),
            meta.alias("media_meta"),
        )
    )
