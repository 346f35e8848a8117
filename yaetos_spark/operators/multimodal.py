"""Multimodal columns — image/audio/video as opaque binary + metadata.

The Spark-side plumbing is real and tested: a canonical media struct
schema, binary-file ingestion, partition-size control for fat binary
rows, and Arrow-batched ``mapInPandas`` operators with correct
signatures and batch shapes. The actual pixel/sample decode is STUBBED
(this container has no image/audio libs): ``decode_image`` raises
``NotImplementedError`` unless a deterministic fake decoder is
requested, which derives plausible metadata from the bytes themselves
(stable across runs, so tests can assert on it).

Scale notes: binary rows are fat — ``files.maxPartitionBytes`` (set in
the session factory) keeps scan partitions bounded; feature extraction
is ``mapInPandas`` (per-batch Python cost, Arrow transfer) and should
be preceded by column pruning so only (id, content) cross the
JVM↔Python boundary.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("uri", T.StringType(), True),
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("size_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def read_binary_files(spark: SparkSession, path: str, kind: str = "image") -> DataFrame:
    """Ingest raw files as media rows via Spark's binaryFile source
    (distributed read; content stays off the driver)."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.abs(F.xxhash64("path")).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content"),
        F.struct(
            F.col("path").alias("uri"),
            F.lit(None).cast("string").alias("mime"),
            F.col("length").alias("size_bytes"),
        ).alias("meta"),
    )


_IMAGE_FEATURE_SCHEMA = "media_id long, width int, height int, n_channels int, sha256 string"


def decode_image(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode image bytes → (media_id, width, height, n_channels, sha256).

    Real decode requires PIL/opencv — NOT in this container, so it is
    stubbed: ``fake=True`` derives deterministic metadata from the byte
    content (for plumbing tests); ``fake=False`` raises unless PIL is
    importable.
    """
    try:
        import PIL.Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not fake and not have_pil:
        raise NotImplementedError(
            "real image decode needs PIL/opencv (not in this image); use fake=True for plumbing tests"
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                digest = hashlib.sha256(data).hexdigest()
                if fake:
                    # deterministic fake: dims derived from the hash
                    h = int(digest[:8], 16)
                    out.append((mid, 64 + h % 512, 64 + (h >> 9) % 512, 3, digest))
                else:  # pragma: no cover - needs PIL
                    import io

                    with PIL.Image.open(io.BytesIO(data)) as im:
                        out.append((mid, im.width, im.height, len(im.getbands()), digest))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "n_channels", "sha256"]
            )

    return df.select("media_id", "content").mapInPandas(_decode, schema=_IMAGE_FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: emits one row per sampled frame
    index based on fake frame counts derived from size (decode stub).
    Shows the explode-based fan-out shape a real decoder plugs into."""
    n_frames = (F.coalesce(F.col("meta.size_bytes"), F.lit(0)) / F.lit(1000)).cast("int")
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))))
        .select("media_id", "frame_idx")
    )


_AUDIO_FEATURE_SCHEMA = (
    "media_id long, duration_ms long, sample_rate int, rms double, sha256 string"
)


def extract_audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Audio bytes → (media_id, duration_ms, sample_rate, rms, sha256).

    Same contract as decode_image: real decode needs soundfile/librosa
    (absent here) so ``fake=True`` derives deterministic features from
    the byte content; the mapInPandas signature, Arrow batching, and
    column pruning are the real production shape.
    """
    try:
        import soundfile  # noqa: F401

        have_sf = True
    except ImportError:
        have_sf = False
    if not fake and not have_sf:
        raise NotImplementedError(
            "real audio decode needs soundfile/librosa (not in this image); "
            "use fake=True for plumbing tests"
        )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                digest = hashlib.sha256(data).hexdigest()
                h = int(digest[:12], 16)
                out.append(
                    (
                        mid,
                        1000 + h % 600_000,                     # 1s..10min
                        (8000, 16000, 44100, 48000)[h % 4],
                        (h % 10_000) / 10_000.0,
                        digest,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "duration_ms", "sample_rate", "rms", "sha256"],
            )

    return df.select("media_id", "content").mapInPandas(
        _extract, schema=_AUDIO_FEATURE_SCHEMA
    )


def resize_plan(
    decoded: DataFrame, max_side: int = 256
) -> DataFrame:
    """Resize *plan* over decoded image metadata: target dims that fit
    ``max_side`` preserving aspect ratio, plus the scale factor — the
    pure-column arithmetic stage a real resizer (mapInPandas over
    content) would consume. Zero shuffles; integer dims via floor.
    """
    w, h = F.col("width"), F.col("height")
    longest = F.greatest(w, h)
    scale = F.when(longest > max_side, max_side / longest).otherwise(F.lit(1.0))
    return decoded.select(
        "media_id",
        "width",
        "height",
        F.floor(w * scale).cast("int").alias("target_width"),
        F.floor(h * scale).cast("int").alias("target_height"),
        scale.alias("scale"),
    )
