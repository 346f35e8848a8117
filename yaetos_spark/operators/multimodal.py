"""Multimodal columns — image/audio/video as opaque binary + metadata.

The Spark-side plumbing is real and tested: a canonical media struct
schema, binary-file ingestion, partition-size control for fat binary
rows, and Arrow-batched ``mapInPandas`` operators with correct
signatures and batch shapes.  Decode is REAL for the uncompressed
formats parseable with numpy + stdlib alone — PPM (P6) images and PCM
WAV audio — including pixel statistics, nearest-neighbor resize, and
sample RMS.  Codec formats (JPEG/PNG/MP3/...) need PIL/soundfile,
which this container lacks, so those paths are STUBBED: they raise
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


# ---------------------------------------------------------------------
# pure-numpy parsers for uncompressed formats (no codec libs needed)
# ---------------------------------------------------------------------


def parse_ppm(data: bytes):
    """Parse a binary PPM (P6) image with numpy: returns
    ``(width, height, pixels)`` where pixels is a (h, w, 3) uint8 array.
    Handles '#' comments in the header per the netpbm spec.  Raises
    ValueError on anything that isn't a well-formed P6."""
    import numpy as np

    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # tokenize the header: magic, width, height, maxval; '#' starts a
    # comment running to end-of-line
    tokens, i, n = [], 2, len(data)
    while len(tokens) < 3 and i < n:
        c = data[i : i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"#":
            while i < n and data[i : i + 1] != b"\n":
                i += 1
        else:
            j = i
            while j < n and data[j : j + 1] not in b" \t\r\n#":
                j += 1
            tokens.append(data[i:j])
            i = j
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    width, height, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    i += 1  # exactly one whitespace byte separates maxval from pixels
    need = width * height * 3
    raw = data[i : i + need]
    if len(raw) < need:
        raise ValueError("truncated PPM pixel data")
    return width, height, np.frombuffer(raw, dtype=np.uint8).reshape(height, width, 3)


def write_ppm(pixels) -> bytes:
    """Inverse of parse_ppm: (h, w, 3) uint8 array → P6 bytes."""
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def parse_wav(data: bytes):
    """Parse a PCM16 WAV with stdlib struct + numpy: returns
    ``(sample_rate, n_channels, samples)`` where samples is a float64
    array in [-1, 1) (channel-interleaved flattened).  Walks RIFF
    chunks properly (skips LIST/fact/etc.).  Raises ValueError for
    non-PCM encodings."""
    import struct

    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, n = 12, len(data)
    fmt = None
    payload = None
    while i + 8 <= n:
        cid, csz = data[i : i + 4], struct.unpack("<I", data[i + 4 : i + 8])[0]
        body = data[i + 8 : i + 8 + csz]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
        i += 8 + csz + (csz & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (format={audio_format}, bits={bits})")
    samples = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
    return sample_rate, n_channels, samples


def write_wav(samples_int16, sample_rate: int, n_channels: int = 1) -> bytes:
    """Inverse of parse_wav for tests: int16 array → PCM16 WAV bytes."""
    import struct

    payload = samples_int16.astype("<i2").tobytes()
    block_align = 2 * n_channels
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


_IMAGE_FEATURE_SCHEMA = "media_id long, width int, height int, n_channels int, sha256 string"


def decode_image(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode image bytes → (media_id, width, height, n_channels, sha256).

    PPM (P6) decodes for REAL (pure numpy — no codec lib).  Codec
    formats need PIL/opencv, absent in this container: for those,
    ``fake=True`` derives deterministic metadata from the byte content
    (for plumbing tests); ``fake=False`` raises unless PIL is
    importable or every row is PPM.
    """
    try:
        import PIL.Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                digest = hashlib.sha256(data).hexdigest()
                if data.startswith(b"P6"):
                    w, h, _ = parse_ppm(data)
                    out.append((mid, w, h, 3, digest))
                elif have_pil:  # pragma: no cover - needs PIL
                    import io

                    with PIL.Image.open(io.BytesIO(data)) as im:
                        out.append((mid, im.width, im.height, len(im.getbands()), digest))
                elif fake:
                    # deterministic fake: dims derived from the hash
                    hh = int(digest[:8], 16)
                    out.append((mid, 64 + hh % 512, 64 + (hh >> 9) % 512, 3, digest))
                else:
                    raise NotImplementedError(
                        "non-PPM image decode needs PIL/opencv (not in this "
                        "image); use fake=True for plumbing tests"
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "n_channels", "sha256"]
            )

    return df.select("media_id", "content").mapInPandas(_decode, schema=_IMAGE_FEATURE_SCHEMA)


_IMAGE_STATS_SCHEMA = (
    "media_id long, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def image_stats(df: DataFrame) -> DataFrame:
    """REAL per-channel pixel statistics over PPM content — the
    feature-extraction stage (brightness/color filters for training-
    data curation), Arrow-batched, numpy vectorized per image.  Only
    (media_id, content) cross the JVM↔Python boundary."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, px = parse_ppm(bytes(content))
                means = px.reshape(-1, 3).mean(axis=0)
                out.append((mid, w, h, float(means[0]), float(means[1]), float(means[2])))
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "mean_r", "mean_g", "mean_b"],
            )

    return df.select("media_id", "content").mapInPandas(_stats, schema=_IMAGE_STATS_SCHEMA)


_RESIZED_SCHEMA = "media_id long, width int, height int, content binary"


def resize_image(df: DataFrame, max_side: int = 256) -> DataFrame:
    """REAL nearest-neighbor resize of PPM content (numpy index-
    gather), aspect-preserving to fit ``max_side``; re-encodes P6 so
    the output is itself a decodable media column.  Images already
    within bounds pass through untouched.  This is the executable
    counterpart of ``resize_plan`` (which computes target dims as pure
    column arithmetic)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content)
                w, h, px = parse_ppm(data)
                longest = max(w, h)
                if longest <= max_side:
                    out.append((mid, w, h, data))
                    continue
                scale = max_side / longest
                tw, th = max(int(w * scale), 1), max(int(h * scale), 1)
                rows = (np.arange(th) * (h / th)).astype(int)
                cols = (np.arange(tw) * (w / tw)).astype(int)
                resized = px[rows][:, cols]
                out.append((mid, tw, th, write_ppm(resized)))
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "content"])

    return df.select("media_id", "content").mapInPandas(_resize, schema=_RESIZED_SCHEMA)


_FRAME_SCHEMA = "media_id long, frame_idx int, width int, height int, content binary"


def write_ppm_video(frames) -> bytes:
    """Toy video container for tests: concatenated P6 frames (the
    format real pipelines would replace with mp4+codec — here the
    CONTAINER walk and frame sampling are the real part)."""
    return b"".join(write_ppm(f) for f in frames)


def iter_ppm_frames(data: bytes):
    """Walk a concatenated-P6 buffer yielding (offset, frame_bytes).
    Re-parses each header to compute the frame's exact byte length —
    no index needed, tolerant of per-frame dimension changes."""
    i, n = 0, len(data)
    while i < n:
        w, h, _ = parse_ppm(data[i:])
        # find the exact header length: skip magic, then 3 tokens with
        # interleaved whitespace/comments, then ONE whitespace byte
        j = i + 2
        seen = 0
        while seen < 3 and j < n:
            c = data[j:j+1]
            if c in b" \t\r\n":
                j += 1
            elif c == b"#":
                while j < n and data[j:j+1] != b"\n":
                    j += 1
            else:
                while j < n and data[j:j+1] not in b" \t\r\n#":
                    j += 1
                seen += 1
        j += 1  # the single whitespace byte before pixel data
        frame_len = (j - i) + w * h * 3
        yield i, data[i : i + frame_len]
        i += frame_len


def extract_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """REAL frame extraction for concatenated-PPM video content: walk
    the container, keep every ``every_n``-th frame, emit each as its
    own decodable PPM row (ready for image_stats / resize_image
    downstream).  Arrow-batched mapInPandas; only (media_id, content)
    cross the boundary, frames fan out as rows — the production video
    shape with the codec swapped for the no-codec container."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content)
                for idx, (_, frame) in enumerate(iter_ppm_frames(data)):
                    if idx % every_n == 0:
                        w, h, _ = parse_ppm(frame)
                        out.append((mid, idx, w, h, frame))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "width", "height", "content"]
            )

    return df.select("media_id", "content").mapInPandas(_extract, schema=_FRAME_SCHEMA)


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

    PCM16 WAV decodes for REAL (stdlib struct + numpy: true sample
    rate, duration, RMS).  Compressed formats need soundfile/librosa
    (absent here) so for those ``fake=True`` derives deterministic
    features from the byte content; ``fake=False`` raises on a
    non-WAV row.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                digest = hashlib.sha256(data).hexdigest()
                if data.startswith(b"RIFF"):
                    rate, n_ch, samples = parse_wav(data)
                    n_frames = len(samples) // max(n_ch, 1)
                    rms = math.sqrt(float((samples * samples).mean())) if len(samples) else 0.0
                    out.append((mid, n_frames * 1000 // rate, rate, rms, digest))
                elif fake:
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
                else:
                    raise NotImplementedError(
                        "non-WAV audio decode needs soundfile/librosa (not in "
                        "this image); use fake=True for plumbing tests"
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
