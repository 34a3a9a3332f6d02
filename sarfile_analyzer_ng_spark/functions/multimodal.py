"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

The Spark-side mechanics (schema, batching, partitioning, UDF
signatures) are real and tested; the media *decode* itself is stubbed
because no image/audio libraries ship in this container — plug a real
decoder into ``decode_fn`` and nothing else changes. A deterministic
fake decoder exists for tests.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),     # opaque bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def read_media_dir(spark: SparkSession, path: str, kind: str) -> DataFrame:
    """Ingest a directory of media files as MEDIA_SCHEMA rows — the
    ``binaryFile`` source streams payloads without driver involvement."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(None).cast("string").alias("mime"),
        F.col("content").alias("payload"),
        F.create_map(
            F.lit("path"), F.col("path"),
            F.lit("length"), F.col("length").cast("string"),
        ).alias("meta"),
    )


def real_decode(payload: bytes, kind: str):
    """Decode dispatch: REAL decode for formats that need no codec
    library (binary PPM/PGM — pure header parse + numpy), documented
    ``NotImplementedError`` for compressed formats (JPEG/PNG/audio/
    video), whose codecs do not ship in this container — plug a
    PIL/libav decoder in here and nothing else changes."""
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload, kind)
    raise NotImplementedError(
        "compressed-media decoding requires image/audio libraries not "
        "present in this environment; binary PPM/PGM decodes natively, "
        "or pass fake_decode for the deterministic stub"
    )


def _ppm_header(payload: bytes, start: int = 0):
    """Parse one binary netpbm header starting at ``start`` — the ONE
    token scanner (magic, comments, width/height/maxval) shared by the
    decoder and the frame splitter so the two can never drift.
    Returns (magic, width, height, maxval, pixel_offset)."""
    magic = payload[start:start + 2]
    tokens: list[bytes] = []
    i = start + 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval, then raw pixel data
    width, height, maxval = (int(t) for t in tokens)
    return magic, width, height, maxval, i


def decode_ppm(payload: bytes, kind: str):
    """Real image decode for binary netpbm (P6 RGB / P5 gray) — header
    parse + ``numpy.frombuffer``, no codec library involved. Returns
    (width, height, 0, feature) where the 8-dim feature is the
    mean-pooled 2×4 luminance grid in [0, 1] — deterministic, so the
    downstream similarity ops are testable on real pixels. Images
    smaller than the grid pool over the splits that exist and pad the
    feature with the overall mean (never NaN)."""
    import numpy as np

    magic, width, height, maxval, i = _ppm_header(payload)
    channels = 3 if magic == b"P6" else 1
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    px = np.frombuffer(
        payload, dtype=dtype, count=width * height * channels, offset=i
    ).reshape(height, width, channels)
    lum = px.astype(np.float64).mean(axis=2) / maxval
    rows = np.array_split(lum, min(2, lum.shape[0]), axis=0)
    cells = [
        float(c.mean())
        for r in rows
        for c in np.array_split(r, min(4, r.shape[1]), axis=1)
    ]
    overall = float(lum.mean())
    cells += [overall] * (8 - len(cells))
    return width, height, 0, cells[:8]


def fake_decode(payload: bytes, kind: str):
    """Deterministic stand-in: derives pseudo-dimensions and an 8-dim
    feature from the payload hash, so pipelines are testable
    end-to-end without codecs."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    duration = int.from_bytes(digest[2:4], "big") if kind != "image" else 0
    feature = [b / 255.0 for b in digest[4:12]]
    return width, height, duration, feature


def extract_features(media: DataFrame, decode_fn=real_decode) -> DataFrame:
    """Decode/feature-extract stage: Arrow-batched ``mapInPandas``,
    partition-parallel, nothing collected. Swap ``decode_fn`` for a
    real decoder in a container that ships one."""

    def batches(iterator):
        for pdf in iterator:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                data = bytes(payload) if payload is not None else b""
                if not data:
                    # a null/zero-byte payload is a per-row data
                    # problem, not a missing-codec problem — emit an
                    # empty-feature row instead of failing the job
                    out.append(
                        {
                            "media_id": mid,
                            "kind": kind,
                            "n_bytes": 0,
                            "sha256": hashlib.sha256(b"").hexdigest(),
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                            "feature": None,
                        }
                    )
                    continue
                width, height, duration, feature = decode_fn(data, kind)
                out.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "n_bytes": len(data),
                        "sha256": hashlib.sha256(data).hexdigest(),
                        "width": width,
                        "height": height,
                        "duration_ms": duration,
                        "feature": feature,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to decode.
    Pure JVM (sequence + explode); the decode itself plugs into
    :func:`extract_features`."""
    dur = F.coalesce(
        F.element_at(F.col("meta"), "duration_ms").cast("long"), F.lit(0)
    )
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ms"),
    )


def _ppm_extent(payload: bytes, start: int) -> int:
    """Byte offset one past the binary netpbm frame starting at
    ``start`` (shared header scan + computed pixel-block size)."""
    magic, width, height, maxval, i = _ppm_header(payload, start)
    channels = 3 if magic == b"P6" else 1
    bpp = 2 if maxval > 255 else 1
    return i + width * height * channels * bpp


def split_ppm_frames(payload: bytes) -> list[bytes]:
    """Split a concatenated-netpbm container (the codec-free 'video'
    format the tests and any PPM-pipe producer emit: P6/P5 frames laid
    end to end, like ffmpeg's ``-f image2pipe -vcodec ppm``) into its
    frame payloads."""
    frames = []
    i = 0
    while i < len(payload) and payload[i:i + 2] in (b"P6", b"P5"):
        end = _ppm_extent(payload, i)
        frames.append(payload[i:end])
        i = end
    return frames


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL end-to-end video frame sampling — no codec library: video
    rows carry concatenated-netpbm payloads (``split_ppm_frames``),
    every ``every_n``-th frame is sliced out and decoded with the real
    PPM decoder (:func:`decode_ppm`), one feature row per sampled
    frame. Arrow-batched ``mapInPandas``; a task holds one payload at
    a time, frames fan out as rows.

    This is the working instance of the frame-sample contract;
    :func:`frame_sample_plan` remains the JVM-side planning twin for
    containers that need an external decoder.
    """

    def batches(iterator):
        for pdf in iterator:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video" or payload is None:
                    continue
                frames = split_ppm_frames(bytes(payload))
                for idx in range(0, len(frames), every_n):
                    w, h, _, feat = decode_ppm(frames[idx], "image")
                    out.append(
                        {
                            "media_id": mid,
                            "frame_idx": idx,
                            "n_frames": len(frames),
                            "width": w,
                            "height": h,
                            "feature": feat,
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)
