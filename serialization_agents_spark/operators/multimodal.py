"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque `binary` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over ``mapInPandas`` so each task streams record batches
without materializing whole partitions.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are STUBBED: ``decode_image`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder (derived
from the bytes' md5) exercises the full Spark-side path — schema,
batching, partitioning — which is what the tests cover.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, channels int, "
    "feature array<float>, decode_ok boolean"
)


def _fake_decode(content: bytes, n_features: int = 8) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a real image decode: dimensions and a
    feature vector derived from the content digest. Replaces PIL, which
    is unavailable here; the Spark-side plumbing is identical."""
    d = hashlib.md5(content or b"").digest()
    width = 16 + d[0] % 240
    height = 16 + d[1] % 240
    feats = [round(b / 255.0, 6) for b in d[2 : 2 + n_features]]
    return width, height, 3, feats


def decode_image_batches(fake: bool = True, batch_limit: int = 1024):
    """Returns a mapInPandas kernel: Iterator[pd.DataFrame] -> Iterator[...].

    Real deployment swaps `_fake_decode` for PIL/torchvision; the
    signature, batch shape, and output schema stay the same.
    """
    if not fake:
        raise NotImplementedError(
            "real image decoding requires PIL/torchvision, not present in "
            "this environment; pass fake=True to exercise the pipeline"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # bound memory: re-chunk oversized Arrow batches
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                rows = []
                for mid, content in zip(chunk["media_id"], chunk["content"]):
                    try:
                        w, h, c, feats = _fake_decode(bytes(content or b""))
                        rows.append((mid, w, h, c, feats, True))
                    except Exception:
                        rows.append((mid, None, None, None, None, False))
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "width", "height", "channels",
                        "feature", "decode_ok",
                    ],
                )

    return kernel


def extract_image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """media(media_id, kind, content, meta) -> IMAGE_FEATURES rows.

    Narrow op: mapInPandas streams Arrow batches; no shuffle. Filter
    pushdown on `kind` happens before the Python stage so only image
    bytes cross the JVM->Arrow boundary.
    """
    images = media.where(F.col("kind") == "image").select("media_id", "content")
    return images.mapInPandas(decode_image_batches(fake=fake), IMAGE_FEATURES_SCHEMA)


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table (binary payload = md5-chained bytes)."""
    df = spark.range(n)
    payload = F.sha2(F.concat(F.lit("media"), F.col("id").cast("string")), 256)
    return df.select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, "audio").otherwise("image").alias("kind"),
        F.encode(payload, "utf-8").cast("binary").alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(F.col("id") % 3 == 0, 16000).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
