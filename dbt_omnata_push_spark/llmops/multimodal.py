"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct. The Spark-side machinery (schema, partition-preserving
mapInPandas, Arrow batch shape) is real and tested; the actual codec
calls are stubbed because no media libraries exist in this container —
``decode_stub=True`` substitutes a deterministic fake feature extractor,
and ``decode_stub=False`` raises NotImplementedError at the stage
boundary, marking exactly where a real decoder (PIL/ffmpeg/torchaudio)
plugs in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature_norm", DoubleType()),
        StructField("payload_digest", StringType()),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Adapt the documents table into the media schema (text bytes as the
    opaque payload) so the binary pipeline is exercised on real data."""
    payload = F.col("text").cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas).

    Partitioning is preserved (narrow transformation); each Arrow batch
    carries the binary payloads so the decoder amortizes per-batch setup.
    """
    import hashlib

    import pandas as pd

    def decode_batch(batches):
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg; install and "
                    "replace this stub (see llmops/multimodal.py)"
                )
            payloads = pdf["payload"]
            # Deterministic fake 'feature': byte-sum norm + content digest.
            norms = payloads.map(
                lambda b: float(sum(b) / (len(b) or 1))
            )
            digests = payloads.map(lambda b: hashlib.md5(b).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feature_norm": norms,
                    "payload_digest": digests,
                }
            )

    return media.mapInPandas(decode_batch, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_media(
    media: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """Resize stage: binary -> binary with target-dimension metadata.

    One-to-one over Arrow batches; the stub 'resample' truncates/repeats
    payload bytes to width*height deterministically, standing in for a
    PIL resize. The schema, batch shape, and partition behavior are what
    a real decoder would use unchanged.
    """
    import pandas as pd

    target = width * height

    def resize_batch(batches):
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real image resize requires PIL; install and replace "
                    "this stub (see llmops/multimodal.py)"
                )
            resized = pdf["payload"].map(
                lambda b: (b * (target // max(len(b), 1) + 1))[:target]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": resized,
                    "mime": pdf["mime"],
                    "n_bytes": resized.map(len),
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(resize_batch, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, n_frames: int = 4, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling: one media row -> n_frames frame rows (one-to-many
    inside mapInPandas — the output batch is longer than the input, the
    Arrow contract that a real ffmpeg frame extractor needs).

    The stub slices the payload into n_frames even chunks standing in
    for decoded frames; real code swaps the slicer for ffmpeg keyframe
    extraction and nothing else changes.
    """
    import pandas as pd

    def frames_batch(batches):
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg; install and "
                    "replace this stub (see llmops/multimodal.py)"
                )
            rows = {"media_id": [], "frame_idx": [], "frame_payload": [], "n_bytes": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    chunk = payload[i * step : (i + 1) * step]
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_payload"].append(chunk)
                    rows["n_bytes"].append(len(chunk))
            yield pd.DataFrame(rows)

    return media.mapInPandas(frames_batch, FRAME_SCHEMA)
