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


# ---------------------------------------------------------------------------
# Real fixed-layout codecs (pure numpy — no PIL/ffmpeg needed): BMP + WAV.
# These plug into decode_and_featurize / wav_stats as real `decoder=`
# implementations, replacing the GSMM stub for the two container formats
# that are decodable from their spec alone.
# ---------------------------------------------------------------------------


def encode_bmp_gray8(img: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 array as an 8-bit grayscale BMP
    (BITMAPINFOHEADER + 256-entry gray palette, rows bottom-up, each row
    padded to 4 bytes — the standard Windows 3.x layout)."""
    h, w = img.shape
    row_bytes = (w + 3) & ~3
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    data_offset = 14 + 40 + len(palette)
    image_size = row_bytes * h
    header = b"BM" + struct.pack(
        "<IHHI", data_offset + image_size, 0, 0, data_offset
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, image_size, 2835, 2835, 256, 0
    )
    rows = bytearray()
    pad = b"\x00" * (row_bytes - w)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += img[y].tobytes() + pad
    return header + info + palette + bytes(rows)


def decode_bmp(blob: bytes) -> np.ndarray:
    """Decode an uncompressed BMP: 8-bit palette images return (h, w)
    uint8 gray values (palette applied, gray palettes collapse to the
    index), 24-bit images return (h, w, 3) uint8 RGB. Handles bottom-up
    AND top-down (negative height) row order and 4-byte row padding."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    hdr_size = struct.unpack_from("<I", blob, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if bpp == 8:
        n_colors = struct.unpack_from("<I", blob, 46)[0] or 256
        pal = np.frombuffer(
            blob, dtype=np.uint8, count=n_colors * 4, offset=14 + hdr_size
        ).reshape(n_colors, 4)
        row_bytes = (w + 3) & ~3
        raw = np.frombuffer(
            blob, dtype=np.uint8, count=row_bytes * h, offset=data_offset
        ).reshape(h, row_bytes)[:, :w]
        img = raw if not top_down else raw.copy()
        if not top_down:
            img = img[::-1]
        # apply the palette; a gray ramp palette collapses to the index
        bgr = pal[img][..., :3]
        if np.array_equal(bgr[..., 0], bgr[..., 1]) and np.array_equal(
            bgr[..., 1], bgr[..., 2]
        ):
            return np.ascontiguousarray(bgr[..., 0])
        return np.ascontiguousarray(bgr[..., ::-1])
    if bpp == 24:
        row_bytes = (w * 3 + 3) & ~3
        raw = np.frombuffer(
            blob, dtype=np.uint8, count=row_bytes * h, offset=data_offset
        ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        if not top_down:
            raw = raw[::-1]
        return np.ascontiguousarray(raw[..., ::-1])  # BGR -> RGB
    raise ValueError(f"unsupported BMP bpp {bpp}")


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode int16 samples ((n,) mono or (n, ch)) as a canonical RIFF
    PCM WAV (fmt + data chunks)."""
    s = np.asarray(samples, dtype="<i2")
    ch = 1 if s.ndim == 1 else s.shape[1]
    payload = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes):
    """Decode a PCM16 RIFF WAV by walking its chunks: returns
    ``(samples, rate)`` with samples int16, (n,) for mono or (n, ch)
    otherwise. Rejects non-PCM / non-16-bit encodings loudly."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, ch, rate, bits = 12, None, None, None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV encoding fmt={audio_fmt} bits={bits}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if data is None or ch is None:
        raise ValueError("WAV missing fmt/data chunk")
    s = np.frombuffer(data, dtype="<i2")
    if ch > 1:
        s = s.reshape(-1, ch)
    return s, rate


def wav_stats(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Audio ingest stats as one mapInPandas kernel over the REAL WAV
    decoder: per blob (n_samples, sample_rate, sum/min/max of samples) —
    integer-exact so an arithmetic oracle can verify the decode."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("n_samples", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("sample_sum", T.LongType()),
            T.StructField("sample_min", T.IntegerType()),
            T.StructField("sample_max", T.IntegerType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in
                    ("n_samples", "sample_rate", "sample_sum", "sample_min", "sample_max")}
            for blob in pdf[blob_col]:
                s, rate = decode_wav(bytes(blob))
                flat = s.reshape(-1).astype(np.int64)
                cols["n_samples"].append(flat.size)
                cols["sample_rate"].append(rate)
                # an empty data chunk is legal RIFF (zero-length capture):
                # sum 0, null extrema — min()/max() of an empty array raise
                cols["sample_sum"].append(int(flat.sum()) if flat.size else 0)
                cols["sample_min"].append(int(flat.min()) if flat.size else None)
                cols["sample_max"].append(int(flat.max()) if flat.size else None)
            pdf = pdf.copy()
            for k, v in cols.items():
                pdf[k] = v
            yield pdf

    return df.mapInPandas(kernel, out_schema)


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


def encode_png(img: np.ndarray, filter_mode: str = "mixed") -> bytes:
    """Encode (h, w) gray8 or (h, w, 3) rgb8 as a real PNG (zlib is in
    the stdlib — PNG needs no external codec). ``filter_mode``:
    ``'none'`` writes filter 0 rows; ``'mixed'`` cycles filters
    0..4 by row (None/Sub/Up/Average/Paeth) so a decoder must implement
    every unfilter to round-trip the bytes."""
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    bpp = 1 if img.ndim == 2 else img.shape[2]
    color = {1: 0, 3: 2}[bpp]
    flat = img.reshape(h, w * bpp).astype(np.int16)
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int16)
    for y in range(h):
        line = flat[y]
        a = np.concatenate([np.zeros(bpp, np.int16), line[:-bpp]])
        b = prev
        c = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
        ft = (y % 5) if filter_mode == "mixed" else 0
        if ft == 0:
            enc = line
        elif ft == 1:
            enc = line - a
        elif ft == 2:
            enc = line - b
        elif ft == 3:
            enc = line - ((a + b) >> 1)
        else:
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            enc = line - pred
        raw += bytes([ft]) + (enc & 0xFF).astype(np.uint8).tobytes()
        prev = line

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> np.ndarray:
    """Decode a real (non-interlaced, 8-bit gray or RGB) PNG with pure
    numpy + stdlib zlib: walk the chunk stream (CRC-checked), inflate the
    IDATs, and invert all five scanline filters. Sub/Up invert as
    vectorized mod-256 cumulative sums; Average/Paeth carry a true
    per-pixel dependency and run as a per-pixel lane loop (inherent to
    the format, bounded by the image size). Returns (h, w) or (h, w, 3)
    uint8."""
    import zlib

    if blob[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        typ = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (0, 2) or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG layout depth={depth} color={color} "
            f"interlace={interlace} (8-bit gray/RGB non-interlaced only)"
        )
    bpp = 1 if color == 0 else 3
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length does not match dimensions")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        off = y * (stride + 1)
        ft = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(
            np.int32
        )
        if ft == 0:
            cur = line
        elif ft == 1:  # Sub: additive along each bpp lane -> cumsum mod 256
            cur = np.cumsum(line.reshape(w, bpp), axis=0) % 256
            cur = cur.reshape(stride)
        elif ft == 2:  # Up
            cur = (line + prev) % 256
        elif ft in (3, 4):  # Average / Paeth: true sequential dependency
            cur = np.zeros(stride, dtype=np.int32)
            lanes = line.reshape(w, bpp)
            cur2 = cur.reshape(w, bpp)
            prev2 = prev.reshape(w, bpp)
            left = np.zeros(bpp, dtype=np.int32)
            upleft = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                b = prev2[x]
                if ft == 3:
                    pred = (left + b) >> 1
                else:
                    p = left + b - upleft
                    pa = np.abs(p - left)
                    pb = np.abs(p - b)
                    pc = np.abs(p - upleft)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, b, upleft)
                    )
                cur2[x] = (lanes[x] + pred) % 256
                left = cur2[x]
                upleft = b
            cur = cur2.reshape(stride)
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w) if bpp == 1 else out.reshape(h, w, 3)
