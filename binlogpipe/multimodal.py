"""Multimodal columns: opaque `binary` payloads + typed metadata, with
decode / feature-extract / resize / frame-sample plumbing over
`mapInPandas` (Arrow batches).

The Spark-side contract is real and tested — schema, partitioning, UDF
signature, batch shape. The actual codec step is STUBBED (task brief: the
image/audio libraries are not in this container): `decode_real` raises
NotImplementedError, and the default path uses a deterministic fake decode
derived from the payload bytes, so tests and oracles are reproducible.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
    T.StructField("meta_width", T.IntegerType()),
    T.StructField("meta_height", T.IntegerType()),
    T.StructField("meta_duration_ms", T.IntegerType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_digest", T.StringType()),
    T.StructField("feat_mean", T.DoubleType()),
    T.StructField("feat_std", T.DoubleType()),
    T.StructField("n_frames_sampled", T.IntegerType()),
])


def decode_real(payload: bytes, kind: str):
    """Real codec hook (PIL / libav / soundfile). Not available in this
    container — STUB."""
    raise NotImplementedError(
        "media codecs not installed; wire PIL/pyav here on a real cluster")


def _fake_decode(payload: bytes) -> tuple[float, float]:
    """Deterministic fake decode: derive stable 'pixel statistics' from the
    byte content so the plumbing is testable end-to-end."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return 0.0, 0.0
    return float(round(arr.mean(), 6)), float(round(arr.std(), 6))


def synth_media_df(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table derived from the documents table
    (payload = utf-8 text bytes; metadata from n_chars) — stands in for an
    Iceberg table with real encoded blobs."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kinds.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        (F.col("n_chars") % 640).cast("int").alias("meta_width"),
        (F.col("n_chars") % 480).cast("int").alias("meta_height"),
        (F.col("n_chars") * 10).cast("int").alias("meta_duration_ms"),
    )


def feature_extract(media: DataFrame, frames_per_video: int = 4) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one feature frame
    out. Repartitions by media_id so batches are balanced at scale."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for r in b.itertuples(index=False):
                payload = bytes(r.payload)
                mean, std = _fake_decode(payload)
                out.append({
                    "media_id": r.media_id,
                    "kind": r.kind,
                    "n_bytes": len(payload),
                    "content_digest": hashlib.sha256(payload).hexdigest()[:16],
                    "feat_mean": mean,
                    "feat_std": std,
                    "n_frames_sampled": (
                        frames_per_video if r.kind == "video" else 1),
                })
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA])

    return (media.repartition("media_id")
            .mapInPandas(gen, FEATURE_SCHEMA)
            .orderBy("media_id"))
