"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct. The Spark-side machinery (schema, partition-preserving
mapInPandas, Arrow batch shape) is real and tested. Codec dispatch is
by payload magic bytes: BMP, PNG (compressed — stdlib-zlib inflate +
RFC 2083 scanline unfiltering), GIF (LZW), WAV and AVI (RIFF container,
uncompressed DIB video frames) payloads run REAL pure-Python codecs
(llmops/codecs.py — decode, luminance/RMS features, nearest-neighbour
resize, time-sliced audio segments, video frame extraction emitting
standalone BMPs); other formats need PIL/ffmpeg, which this container
lacks, so ``decode_stub=True`` substitutes a deterministic fake and
``decode_stub=False`` raises NotImplementedError at the stage boundary,
marking exactly where a production decoder plugs in.
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

    from . import codecs

    def feature(b: bytes) -> float:
        kind = codecs.sniff(b)
        if kind == "bmp":  # real decode: mean luma
            return codecs.bmp_mean_luminance(b)
        if kind == "png":  # real inflate+unfilter decode: mean luma
            return codecs.png_mean_luminance(b)
        if kind == "gif":  # real LZW decode: mean luma
            return codecs.gif_mean_luminance(b)
        if kind == "wav":  # real decode: RMS amplitude
            return codecs.wav_rms(b)
        if kind == "avi":  # real video decode: mean luma over all frames
            return codecs.avi_mean_luminance(b)
        if not decode_stub:
            raise NotImplementedError(
                "payload is not BMP/PNG/GIF/WAV/AVI; real decoding "
                "requires PIL/ffmpeg (see llmops/multimodal.py)"
            )
        # Deterministic fake 'feature': byte-sum norm.
        return float(sum(b) / (len(b) or 1))

    def decode_batch(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            norms = payloads.map(feature)
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

    from . import codecs

    def resample(b: bytes) -> bytes:
        kind = codecs.sniff(b)
        if kind == "bmp":  # real nearest-neighbour resize
            return codecs.resize_bmp(b, width, height)
        if kind == "png":  # real decode -> resample -> re-deflate
            return codecs.resize_png(b, width, height)
        if kind == "gif":  # real LZW decode -> resample -> re-encode
            return codecs.resize_gif(b, width, height)
        if kind == "avi":  # real per-frame resample -> re-encoded AVI
            return codecs.resize_avi(b, width, height)
        if not decode_stub:
            raise NotImplementedError(
                "payload is not BMP/PNG/GIF/AVI; real resize requires "
                "PIL/ffmpeg (see llmops/multimodal.py)"
            )
        return (b * (target // max(len(b), 1) + 1))[:target]

    def resize_batch(batches):
        for pdf in batches:
            resized = pdf["payload"].map(resample)
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

    from . import codecs

    def slices(payload: bytes) -> list[bytes]:
        kind = codecs.sniff(payload)
        if kind == "wav":  # real time-sliced segments
            return codecs.slice_wav(payload, n_frames)
        if kind == "avi":  # real frames, emitted as standalone BMPs
            return codecs.sample_avi_frames(payload, n_frames)
        if not decode_stub:
            raise NotImplementedError(
                "payload is not WAV/AVI; real frame sampling requires "
                "ffmpeg (see llmops/multimodal.py)"
            )
        step = max(len(payload) // n_frames, 1)
        return [payload[i * step : (i + 1) * step] for i in range(n_frames)]

    def frames_batch(batches):
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_payload": [], "n_bytes": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, chunk in enumerate(slices(payload)):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_payload"].append(chunk)
                    rows["n_bytes"].append(len(chunk))
            yield pd.DataFrame(rows)

    return media.mapInPandas(frames_batch, FRAME_SCHEMA)


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def perceptual_dhash(media: DataFrame) -> DataFrame:
    """(media_id, phash) via the 64-bit difference hash
    (llmops/codecs.py::dhash64) — REAL decode for BMP/PNG/GIF payloads;
    anything else raises at the stage boundary (perceptual hashing of
    undecodable bytes would be silently meaningless, so no stub here).

    Partition-preserving mapInPandas, same Arrow batch shape as
    extract_features. Downstream grouping is an equi-join/groupBy on
    the 8-byte hash — image near-dup at corpus scale costs one shuffle
    of (id, long), never of pixels.
    """
    import pandas as pd

    from . import codecs

    def hash_batch(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pdf["payload"].map(codecs.dhash64),
                }
            )

    return media.mapInPandas(hash_batch, PHASH_SCHEMA)


def documents_as_synthetic_bmps(
    df: DataFrame, id_col: str = "doc_id", n_groups: int = 100
) -> DataFrame:
    """Deterministic 9x8 grayscale BMPs from the documents table: the
    base image is md5(doc_id % n_groups) bytes mapped into [40, 219]
    (72 pixels), plus a per-document uniform brightness offset of
    2*(doc_id % 7) — clip-free by construction, so dHash is provably
    invariant within a group while distinct groups get pseudorandom
    gradients. This is the planted structure the phash-dedup oracle
    checks against pure SQL."""
    import hashlib

    import pandas as pd

    from . import codecs

    def build(batches):
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                g = int(doc_id) % n_groups
                base = hashlib.md5(f"img:{g}".encode()).digest()
                base = (base * 5)[:72]  # 72 pixel seeds
                off = 2 * (int(doc_id) % 7)
                px = [
                    [
                        (
                            40 + (base[y * 9 + x] % 180) + off,
                        )
                        * 3
                        for x in range(9)
                    ]
                    for y in range(8)
                ]
                payloads.append(codecs.encode_bmp(9, 8, px))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "media_type": "image",
                    "payload": payloads,
                    "mime": "image/bmp",
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return df.select(id_col).mapInPandas(build, MEDIA_SCHEMA)
