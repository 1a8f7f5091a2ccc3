"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed with Arrow-batched ``mapInPandas`` operators.

The real decode step (image/audio/video codecs) is STUBBED — the codec
libraries are not in this environment — but everything Spark-side is real
and tested: the schema contract, the batch iterator shape, partition-size
control, and a deterministic fake decoder used by tests to validate the
plumbing end-to-end.

Scale design (100 TB of media): payloads stay in executor-side Arrow
batches (never driver-collected); per-batch work is bounded by
``spark.sql.files.maxPartitionBytes`` on read and the Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``) inside mapInPandas —
decode cost is linear per partition and embarrassingly parallel.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, sha256 string, "
    "feat array<double>"
)


def decode_image(payload: bytes) -> "object":
    """Real image decode (PIL/opencv) — not available in this container."""
    raise NotImplementedError(
        "image codecs are not installed in this environment; "
        "use fake_decode_features for plumbing tests"
    )


def fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for decode+feature-extract: digest-derived
    pseudo-features. Same contract (bytes -> fixed-dim float vector)."""
    digest = hashlib.sha256(payload).digest()
    return [digest[i] / 255.0 for i in range(dim)]


def extract_features(
    media: DataFrame, *, dim: int = 8, decoder=fake_decode_features
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    ``decoder`` is the pluggable bytes→vector step; the default is the
    deterministic fake (the real one raises NotImplementedError until the
    codec libs exist on executors).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feat": payloads.map(
                        lambda b: decoder(b or b"", dim) if decoder else None
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def fake_resize_payload(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for the pixel-resample kernel: a
    digest-seeded byte string whose length scales with the target area
    (same contract: bytes → bytes, output size a function of target
    dims). The real kernel (PIL/opencv) raises until codecs exist."""
    seed = hashlib.sha256(payload + width.to_bytes(4, "big") + height.to_bytes(4, "big"))
    out_len = max(1, (width * height) // 64)
    block = seed.digest()
    return (block * (out_len // len(block) + 1))[:out_len]


def resize_images(
    media: DataFrame,
    *,
    width: int,
    height: int,
    kernel=fake_resize_payload,
) -> DataFrame:
    """Batch image resize over opaque binary payloads: mapInPandas keeps
    payloads in executor-side Arrow batches (never driver-collected); the
    metadata struct is rewritten to the target dims so downstream
    operators see consistent typed metadata. ``kernel`` is the pluggable
    bytes→bytes pixel step (stubbed deterministically here — the Spark
    plumbing, schema contract and batch shape are the real part)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = pdf[pdf["media_type"] == "image"]
            if not len(keep):
                continue
            yield pd.DataFrame(
                {
                    "media_id": keep["media_id"],
                    "payload": keep["payload"].map(
                        lambda b: kernel(b or b"", width, height)
                    ),
                    "media_type": keep["media_type"],
                    "meta": keep["meta"].map(
                        lambda m: {
                            "width": width,
                            "height": height,
                            "sample_rate": (m or {}).get("sample_rate", 0),
                            "n_frames": (m or {}).get("n_frames", 0),
                        }
                    ),
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, *, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per kept
    frame index based on metadata (the decode of the frame itself is the
    stubbed step). Pure built-ins — array expansion, no UDF. Frameless
    media (n_frames == 0 or NULL) emit no rows — there is no frame 0 to
    sample from an empty video."""
    frames = F.sequence(
        F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
    )
    return (
        media.filter(
            (F.col("media_type") == "video") & (F.col("meta.n_frames") > 0)
        )
        .select("media_id", F.explode(frames).alias("frame_idx"))
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/catalog: treat document text bytes as opaque
    payloads so the binary plumbing runs against real testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.struct(
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
            F.lit(0).alias("sample_rate"),
            (F.col("n_chars") % 100).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
