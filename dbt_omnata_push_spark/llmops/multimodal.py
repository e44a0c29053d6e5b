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
