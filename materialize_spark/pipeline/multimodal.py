"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
struct of metadata; decode / feature-extract / resize / frame-sample are
Arrow-batched Python transforms (``mapInPandas``) because codecs are
Python-side by nature.

Decode is REAL for the formats a dependency-free container can decode
from public specs — netpbm P5/P6 and 24bpp BMP (pipeline/imaging.py,
pure numpy): pixel-level features, nearest-neighbor resize with PPM
re-encode. Every other format (no PIL/libav here) falls through to a
deterministic byte-fold stub, clearly marked per row by ``meta_format``;
the schema/Arrow-batching/partition-preserving plumbing is identical on
both paths, so swapping in PIL/pyav touches only the kernel table.

Scale: mapInPandas streams Arrow batches (see session.py
``arrow.maxRecordsPerBatch``); decode parallelism == partition count, no
shuffle introduced; metadata-only predicates (width/duration filters) are
plain columns, pushed down before any Python runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("payload", BinaryType()),     # opaque encoded bytes
    StructField("meta_format", StringType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("checksum", StringType()),
    StructField("feature", ArrayType(FloatType())),  # fixed-dim feature vector
])

_FEATURE_DIM = 8


def _decode_stub(payload: bytes) -> list[float]:
    """STUB decode/feature kernel (no media libs in this container).

    Deterministic: folds payload bytes into a fixed-dim vector. Replace
    with a real decoder (PIL / torchaudio / pyav) in production; the
    surrounding plumbing is unchanged.
    """
    acc = [0.0] * _FEATURE_DIM
    for i, byte in enumerate(payload):
        acc[i % _FEATURE_DIM] += float(byte)
    total = sum(acc) or 1.0
    return [v / total for v in acc]


def extract_features(media_df: DataFrame) -> DataFrame:
    """Binary payload → feature vector, streamed through Arrow batches.

    Decodable formats (imaging.DECODABLE_FORMATS) get a real pixel-level
    descriptor; the rest get the byte-fold stub — both 8-dim."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from materialize_spark.pipeline.imaging import (
            DECODABLE_FORMATS, audio_features, decode_avi, decode_image,
            decode_wav, image_features, video_features,
        )

        def feat(payload: bytes, fmt: str) -> list[float]:
            base = (fmt or "").split(";")[0].lower()
            if base in DECODABLE_FORMATS:
                return image_features(decode_image(payload, base))
            if base == "wav":
                return audio_features(*decode_wav(payload))
            if base == "avi":
                return video_features(*decode_avi(payload))
            return _decode_stub(payload)

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": payloads.map(len).astype("int64"),
                "checksum": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                "feature": [feat(p, f) for p, f in
                            zip(payloads, pdf["meta_format"])],
            })

    return media_df.mapInPandas(run, schema=FEATURE_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: re-type the documents table as a media table (text bytes as
    the opaque payload) so the multimodal path has real data to chew on."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("fake/raw").alias("meta_format"),
    )


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("payload", BinaryType()),
    StructField("meta_format", StringType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("frame", BinaryType()),
])


def resize_media(media_df: DataFrame, *, width: int = 64,
                 height: int = 64) -> DataFrame:
    """Resize: 1 row in -> 1 row out with a size-bounded payload and
    updated metadata. Per-row binary -> binary, Arrow-batched,
    partition-preserving (no shuffle).

    Decodable images (netpbm/BMP) get a REAL nearest-neighbor resample
    re-encoded as PPM (imaging.py); other formats keep the documented
    deterministic truncate/tile stand-in.
    """
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from materialize_spark.pipeline.imaging import (
            DECODABLE_FORMATS, decode_image, encode_ppm, resize_nearest,
        )

        def stub(b: bytes) -> bytes:
            if not b:
                return bytes(target)
            reps = (target // len(b)) + 1
            return (b * reps)[:target]

        def kernel(b: bytes, fmt: str) -> tuple[bytes, str]:
            base = (fmt or "").split(";")[0].lower()
            if base in DECODABLE_FORMATS:
                arr = resize_nearest(decode_image(b, base), width, height)
                return encode_ppm(arr), f"ppm;{width}x{height}"
            return stub(b), f"fake/raw;{width}x{height}"

        for pdf in batches:
            resized = [kernel(p, f) for p, f in
                       zip(pdf["payload"], pdf["meta_format"])]
            out = pdf[["media_id", "kind"]].copy()
            out["payload"] = [p for p, _ in resized]
            out["meta_format"] = [m for _, m in resized]
            out["width"] = width
            out["height"] = height
            yield out

    return media_df.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media_df: DataFrame, *, frame_bytes: int = 256,
                  max_frames: int = 4) -> DataFrame:
    """Frame sampling: 1 video row -> N frame rows — the Python-side
    analog of FlatMap (one input row yields a variable number of output
    rows inside mapInPandas), no shuffle introduced.

    AVI payloads get REAL frame extraction: up to ``max_frames`` frames
    evenly strided across the video, each re-encoded as a standalone PPM
    image. Other formats keep the documented byte-slice stand-in
    (``frame_bytes`` chunks).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from materialize_spark.pipeline.imaging import (
            decode_avi, encode_ppm,
        )
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload, fmt in zip(pdf["media_id"], pdf["payload"],
                                         pdf["meta_format"]):
                base = (fmt or "").split(";")[0].lower()
                if base == "avi":
                    video, _fps = decode_avi(bytes(payload))
                    n = min(max_frames, len(video))
                    picks = np.linspace(0, len(video) - 1, n).astype(int)
                    for i, fi in enumerate(picks):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(encode_ppm(video[fi]))
                    continue
                n = min(max_frames,
                        max(1, (len(payload) + frame_bytes - 1) // frame_bytes))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(payload[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media_df.mapInPandas(run, schema=FRAME_SCHEMA)
