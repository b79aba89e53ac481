"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct
(modality, mime, width/height/duration…). The Spark-side plumbing —
schema, partition-preserving mapInPandas, Arrow batch shapes — is real
and tested; the actual codec calls are STUBBED (the image/audio
libraries are not in this container): ``decode_image`` raises
NotImplementedError, and ``fake_feature_extract`` produces a
deterministic sha256-seeded feature vector so downstream similarity
plumbing is exercisable end-to-end.

Scale: payload columns are only materialized inside mapInPandas
batches; metadata-only queries never touch the bytes (parquet column
pruning drops the binary column at the scan).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-table schema: id + opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("modality", StringType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def fake_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: utf-8 text bytes as the payload.

    Stands in for real image/audio ingestion so the binary-column
    plumbing (schema, pruning, batch shapes) is testable.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.encode("text", "utf-8")).cast("bigint").alias("n_bytes"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """STUB: real deployments plug Pillow/torchvision here."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "swap in PIL.Image.open(io.BytesIO(payload)) in production"
    )


def _deterministic_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """md5-seeded fake feature vector — stable across runs/machines,
    one digest byte per feature scaled to [0, 1).

    md5 (not sha256) so the derivation has an exact SQL twin: DuckDB's
    ``md5_number_upper``/``md5_number_lower`` expose the first/last 8
    digest bytes as little-endian integers, so byte ``i`` is
    ``(upper >> 8*i) & 255`` — which lets q_multimodal_features carry a
    real differential oracle instead of a rows-only check.  k/256 is an
    exact binary fraction, so the floats are bit-identical across
    engines with no rounding step."""
    if payload is None:
        return [0.0] * dim
    digest = hashlib.md5(payload).digest()  # 16 bytes == FEATURE_DIM
    return [digest[i % len(digest)] / 256.0 for i in range(dim)]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas keeps partitioning (no shuffle); each batch arrives as a
    pandas DataFrame with the binary payload as Python bytes. The codec
    call is the stubbed deterministic hash — the Spark plumbing (schema
    contract, batch iteration, column pruning of unused metadata) is the
    real thing.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "features": [
                        _deterministic_features(p) for p in pdf["payload"]
                    ],
                }
            )

    return media.select("media_id", "modality", "payload").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)


def resize_media(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Arrow-batched resize plumbing: binary in → binary out with the
    target dimensions as typed metadata.

    The codec call is STUBBED deterministically (payload truncated/
    zero-padded to width*height bytes — a real deployment swaps in
    PIL `Image.resize` over `decode_image`); the Spark contract is the
    production one: partition-preserving mapInPandas, binary columns in
    Arrow batches both directions, output schema carrying the new
    metadata. Resize runs where the data lives — payload bytes never
    cross a shuffle.
    """
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p in pdf["payload"]:
                if p is None:
                    out.append(None)
                else:
                    b = bytes(p)[:target]
                    out.append(b + b"\x00" * (target - len(b)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' for the fake payloads: slice the binary every N
    bytes (substr on binary is JVM-side) — models video frame-sample
    plumbing where each output row is one frame payload."""
    # ceil, not floor: a 100-byte payload at 64-byte frames must yield
    # 2 frames — truncation would silently drop the 36-byte tail
    n_frames = F.greatest(
        F.ceil(F.octet_length("payload") / F.lit(every_n_bytes)).cast("int"),
        F.lit(1),
    )
    return media.select(
        "media_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: F.substring(
                    F.col("payload"), i * every_n_bytes + 1, every_n_bytes
                ),
            )
        ).alias("frame_idx", "frame_payload"),
    )
