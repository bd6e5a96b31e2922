"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A training-data pipeline at 100 TB carries media as ``binary`` columns
with a metadata struct; decode/resize/frame-sample run as Arrow-batched
kernels over ``mapInPandas`` so the bytes never round-trip per row.

The decode kernels themselves are STUBBED here (no PIL/ffmpeg in this
container): ``decode_image`` raises NotImplementedError unless given the
deterministic fake decoder, which parses the fixture's synthetic header.
The Spark-side plumbing — schema, batch iteration, partition sizing,
zero-copy Arrow transfer — is real and tested.
"""

from __future__ import annotations

import struct
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

# synthetic media blob: magic 'GSMM' + kind(1B) + width(u16) + height(u16)
# + duration_ms(u32) + payload
_MAGIC = b"GSMM"
_KINDS = {0: "image", 1: "audio", 2: "video"}


def make_fake_blob(kind: int, width: int, height: int, duration_ms: int, payload: bytes = b"") -> bytes:
    return _MAGIC + struct.pack("<BHHI", kind, width, height, duration_ms) + payload


def parse_media_header(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Extract the typed metadata struct from the binary header — pure
    Catalyst byte slicing (no Python), the pattern for real containers
    whose headers are fixed-offset (BMP/WAV/RIFF)."""
    b = F.col(blob_col)
    kind_byte = F.expr(f"cast(conv(hex(substring({blob_col}, 5, 1)), 16, 10) as int)")
    u16 = lambda off: F.expr(
        f"cast(conv(concat(hex(substring({blob_col}, {off+1}, 1)), hex(substring({blob_col}, {off}, 1))), 16, 10) as int)"
    )
    u32 = lambda off: F.expr(
        "cast(conv(concat("
        + ",".join(f"hex(substring({blob_col}, {off+i}, 1))" for i in (3, 2, 1, 0))
        + "), 16, 10) as int)"
    )
    kind = (
        F.when(kind_byte == 0, "image").when(kind_byte == 1, "audio").when(kind_byte == 2, "video")
    )
    return df.withColumn(
        "media_meta",
        F.when(
            F.substring(b, 1, 4) == F.lit(_MAGIC),
            F.struct(
                kind.alias("kind"),
                F.concat(F.lit("x-grove/"), kind).alias("mime"),
                u16(6).alias("width"),
                u16(8).alias("height"),
                u32(10).alias("duration_ms"),
            ),
        ).otherwise(F.lit(None).cast(MEDIA_META)),
    )


def fake_decode(blob: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: yields a
    (h, w) uint8 array derived from the header (real impl: PIL/libjpeg)."""
    if not blob.startswith(_MAGIC):
        raise ValueError("not a GSMM blob")
    kind, w, h, dur = struct.unpack("<BHHI", blob[4:13])
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 7 + y * 13 + dur) % 256).astype(np.uint8)


def decode_and_featurize(
    df: DataFrame,
    blob_col: str = "blob",
    decoder: Callable[[bytes], np.ndarray] | None = None,
    target: tuple[int, int] = (8, 8),
) -> DataFrame:
    """Decode -> resize -> mean-pool feature extraction as one
    mapInPandas kernel (Arrow batches; numpy vectorized per batch).

    ``decoder=None`` raises NotImplementedError at plan-build time: real
    codecs are not in this container. Pass ``fake_decode`` in tests.
    """
    if decoder is None:
        raise NotImplementedError(
            "no media codec available in this environment; pass decoder="
            "fake_decode or a real one (PIL/ffmpeg) in production"
        )
    th, tw = target
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf[blob_col]:
                img = decoder(bytes(blob))
                h, w = img.shape
                # nearest-neighbor resize to (th, tw), then normalize
                ys = (np.arange(th) * h // th).clip(0, h - 1)
                xs = (np.arange(tw) * w // tw).clip(0, w - 1)
                small = img[np.ix_(ys, xs)].astype(np.float32) / 255.0
                feats.append(small.ravel())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(kernel, out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000, blob_col: str = "blob") -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (the decode itself is the stubbed kernel above). Shows the fan-out
    schema/partitioning: explode over the sampled timeline, so frame rows
    inherit the parent's partition."""
    df = parse_media_header(df, blob_col)
    ts = F.sequence(
        F.lit(0),
        F.greatest(F.col("media_meta.duration_ms") - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        df.where(F.col("media_meta.kind") == "video")
        .withColumn("frame_ms", F.explode(ts))
    )
