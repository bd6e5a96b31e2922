"""Multimodal plumbing: binary columns, Catalyst header parsing, Arrow
batch decode kernel (with the deterministic fake decoder)."""

import numpy as np
import pyspark.sql.types as T
import pytest

from grove_spark.operators.multimodal import (
    decode_and_featurize,
    fake_decode,
    frame_sample_plan,
    make_fake_blob,
    parse_media_header,
)

SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("blob", T.BinaryType()),
])


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, make_fake_blob(0, 640, 480, 0)),          # image
        (2, make_fake_blob(2, 1920, 1080, 4500)),     # video, 4.5 s
        (3, make_fake_blob(1, 0, 0, 60000)),          # audio, 60 s
        (4, b"\x00\x01junk"),                          # not media
    ]
    return spark.createDataFrame(rows, schema=SCHEMA)


def test_header_parse_catalyst_only(spark, media):
    out = {r["media_id"]: r["media_meta"] for r in parse_media_header(media).collect()}
    assert out[1].asDict() == {"kind": "image", "mime": "x-grove/image", "width": 640, "height": 480, "duration_ms": 0}
    assert out[2]["width"] == 1920 and out[2]["duration_ms"] == 4500
    assert out[3]["kind"] == "audio"
    assert out[4] is None


def test_decode_stub_refuses_without_codec(spark, media):
    with pytest.raises(NotImplementedError):
        decode_and_featurize(media)


def test_decode_featurize_arrow_kernel(spark, media):
    imgs = media.where("media_id = 1")
    out = decode_and_featurize(imgs, decoder=fake_decode, target=(4, 4)).collect()
    feats = out[0]["features"]
    assert len(feats) == 16
    # deterministic: matches the kernel math run locally
    img = fake_decode(make_fake_blob(0, 640, 480, 0))
    ys = (np.arange(4) * 480 // 4).clip(0, 479)
    xs = (np.arange(4) * 640 // 4).clip(0, 639)
    want = (img[np.ix_(ys, xs)].astype(np.float32) / 255.0).ravel()
    assert np.allclose(feats, want)


def test_frame_sampling_fanout(spark, media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert len(frames) == 5  # video of 4500 ms -> frames at 0..4000
    assert sorted(r["frame_ms"] for r in frames) == [0, 1000, 2000, 3000, 4000]


# ---------------------------------------------------------------------------
# real BMP / WAV codecs (round 3): spec-level golden bytes + stdlib oracle
# ---------------------------------------------------------------------------

def test_decode_bmp_golden_bytes_hand_built():
    """A 3x2 8-bit BMP constructed field-by-field from the spec (not via
    our encoder): bottom-up rows, 1-byte row padding to 4. Any offset or
    row-order bug in decode_bmp breaks this."""
    import struct

    import numpy as np

    from grove_spark.operators.multimodal import decode_bmp

    w, h = 3, 2
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    off = 14 + 40 + len(palette)
    # pixel rows: image row0 = [1,2,3], row1 = [4,5,6]; FILE stores
    # bottom row first, each padded to 4 bytes
    pix = bytes([4, 5, 6, 0]) + bytes([1, 2, 3, 0])
    blob = (
        b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(pix), 0, 0, 256, 0)
        + palette + pix
    )
    img = decode_bmp(blob)
    assert img.dtype == np.uint8
    assert img.tolist() == [[1, 2, 3], [4, 5, 6]]


def test_bmp_roundtrip_including_padding_and_topdown():
    import struct

    import numpy as np

    from grove_spark.operators.multimodal import decode_bmp, encode_bmp_gray8

    rng = np.random.RandomState(3)
    for w, h in [(3, 2), (8, 8), (5, 7), (4, 1)]:
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
        assert decode_bmp(encode_bmp_gray8(img)).tolist() == img.tolist()
    # top-down variant: the encoder wrote img[::-1] bottom-up, so the
    # file's row order is img top-first; flipping the height sign makes
    # the decoder read that order as-is -> decodes back to img
    img = rng.randint(0, 256, (2, 3)).astype(np.uint8)
    blob = bytearray(encode_bmp_gray8(img[::-1]))
    struct.pack_into("<i", blob, 22, -2)  # negative height = top-down
    assert decode_bmp(bytes(blob)).tolist() == img.tolist()


def test_decode_wav_against_stdlib_wave():
    """The chunk-walking decoder vs Python's stdlib `wave` encoder —
    fully independent implementations of the same spec."""
    import io
    import wave

    import numpy as np

    from grove_spark.operators.multimodal import decode_wav

    rng = np.random.RandomState(4)
    samples = rng.randint(-32768, 32768, 77).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(22050)
        wf.writeframes(samples.tobytes())
    got, rate = decode_wav(buf.getvalue())
    assert rate == 22050
    assert got.tolist() == samples.tolist()


def test_wav_roundtrip_stereo_and_errors():
    import numpy as np
    import pytest as _pytest

    from grove_spark.operators.multimodal import decode_wav, encode_wav_pcm16

    st = np.arange(20, dtype=np.int16).reshape(10, 2)
    got, rate = decode_wav(encode_wav_pcm16(st, rate=8000))
    assert rate == 8000 and got.shape == (10, 2) and got.tolist() == st.tolist()
    with _pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope")


def test_decode_and_featurize_with_real_bmp(spark):
    """The Arrow decode kernel runs the REAL BMP decoder end-to-end: a
    constant-value image mean-pools to exactly value/255."""
    import numpy as np

    from grove_spark.operators.multimodal import (
        decode_and_featurize,
        decode_bmp,
        encode_bmp_gray8,
    )

    img = np.full((16, 16), 51, dtype=np.uint8)
    df = spark.createDataFrame([(1, bytearray(encode_bmp_gray8(img)))],
                               "id int, blob binary")
    out = decode_and_featurize(df, decoder=decode_bmp, target=(4, 4)).first()
    feats = out["features"]
    assert len(feats) == 16
    assert all(abs(f - 51 / 255) < 1e-6 for f in feats)


def test_wav_stats_empty_data_chunk(spark):
    """A zero-length data chunk is legal RIFF: n_samples=0, null extrema
    — not a task-killing numpy reduction error."""
    import numpy as np

    from grove_spark.operators.multimodal import encode_wav_pcm16, wav_stats

    empty = encode_wav_pcm16(np.array([], dtype=np.int16), rate=8000)
    df = spark.createDataFrame([(1, bytearray(empty))], "id int, blob binary")
    r = wav_stats(df).first()
    assert r["n_samples"] == 0 and r["sample_sum"] == 0
    assert r["sample_min"] is None and r["sample_max"] is None


def test_png_roundtrip_all_filters_and_shapes():
    import numpy as np

    from grove_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(11)
    for shape in [(8, 8), (13, 5), (16, 16, 3), (1, 1), (7, 3, 3), (5, 1)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for mode in ("none", "mixed"):
            back = decode_png(encode_png(img, mode))
            assert back.shape == img.shape and (back == img).all()


def test_png_spec_bytes_and_hand_assembled_decode():
    """Independent of the encoder: a PNG assembled chunk-by-chunk from
    the spec (signature, IHDR fields big-endian, zlib IDAT of
    filter-0 scanlines, CRC over type+data) must decode to the exact
    pixels; a corrupted CRC must be rejected."""
    import struct
    import zlib

    import numpy as np

    from grove_spark.operators.multimodal import decode_png

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    # 2x2 gray: rows (1,2) and (3,4), each scanline prefixed filter 0
    raw = b"\x00\x01\x02" + b"\x00\x03\x04"
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    img = decode_png(png)
    assert img.tolist() == [[1, 2], [3, 4]]

    # corrupt the IDAT chunk CRC (the byte just before the IEND chunk's
    # length field)
    iend_off = png.rindex(b"IEND") - 4
    bad = bytearray(png)
    bad[iend_off - 1] ^= 0xFF
    import pytest
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))


def test_png_rejects_unsupported_layouts():
    import struct
    import zlib

    import numpy as np
    import pytest

    from grove_spark.operators.multimodal import decode_png, encode_png

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    # 16-bit depth rejected loudly
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported PNG layout"):
        decode_png(png)


# ---------------------------------------------------------------------------
# round 4: baseline JPEG (VERDICT r3 #9) — pure-numpy DCT codec
# ---------------------------------------------------------------------------


def test_jpeg_constant_tiles_roundtrip_exactly():
    """Constant 8x8 tiles with a flat quantizer of 8 make the lossy
    codec arithmetically exact (DC = 8*(v-128) divides losslessly, all
    AC are zero) — including non-multiple-of-8 dims via edge-replicate
    padding + crop."""
    import numpy as np

    from grove_spark.operators.multimodal import decode_jpeg, encode_jpeg_gray

    rng = np.random.default_rng(9)
    for (h, w) in [(16, 16), (13, 11), (8, 8), (24, 17), (5, 30), (1, 1)]:
        th, tw = (h + 7) // 8, (w + 7) // 8
        tiles = rng.integers(0, 256, (th, tw))
        img = np.kron(tiles, np.ones((8, 8), dtype=np.int64))[:h, :w].astype(
            np.uint8
        )
        out = decode_jpeg(encode_jpeg_gray(img, q=8))
        assert out.shape == (h, w)
        assert np.array_equal(out, img), (h, w)


def test_jpeg_general_images_near_exact_at_unit_quant():
    """q=1 keeps every rounded DCT coefficient: decoded pixels match the
    original within 1 LSB across random images (this seeded sweep also
    exercises byte stuffing, ZRL runs, DC diff signs and every AC size
    category)."""
    import numpy as np

    from grove_spark.operators.multimodal import decode_jpeg, encode_jpeg_gray

    rng = np.random.default_rng(42)
    for _ in range(60):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg_gray(img, q=1))
        assert out.shape == (h, w)
        err = np.abs(out.astype(int) - img.astype(int)).max()
        assert err <= 1, (h, w, err)
    # smooth gradient is exact
    y, x = np.mgrid[0:32, 0:24]
    img = ((x * 3 + y * 5) % 256).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_gray(img, q=1)), img)


def test_jpeg_rejects_unsupported_streams_loudly():
    import struct as _struct

    import numpy as np
    import pytest as _pytest

    from grove_spark.operators.multimodal import decode_jpeg, encode_jpeg_gray

    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"GIF89a")
    blob = bytearray(encode_jpeg_gray(np.zeros((8, 8), np.uint8)))
    # flip SOF0 -> SOF2 (progressive): loud, not garbage output
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2
    with _pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(blob))
    # 2-component SOF0 rejected (1 = gray and 3 = YCbCr are supported)
    blob2 = bytearray(encode_jpeg_gray(np.zeros((8, 8), np.uint8)))
    j = blob2.find(b"\xff\xc0")
    blob2[j + 9] = 2  # component count byte in SOF0 payload
    with _pytest.raises(ValueError, match="components=2"):
        decode_jpeg(bytes(blob2))
    # a declared DRI whose interval never fires (single-MCU stream, no
    # RSTs present) is valid and must decode — DRI support is real now,
    # not a loud reject (VERDICT r4 #9)
    dri = b"\xff\xdd" + _struct.pack(">H", 4) + _struct.pack(">H", 8)
    blob3 = bytearray(encode_jpeg_gray(np.zeros((8, 8), np.uint8)))
    k = blob3.find(b"\xff\xda")
    blob3 = blob3[:k] + dri + blob3[k:]
    assert (decode_jpeg(bytes(blob3)) == 0).all()


def test_jpeg_decoder_plugs_into_featurize_kernel(spark):
    """The real JPEG decoder drives the same Arrow kernel the stub
    documents (decode_and_featurize's decoder= injection point)."""
    import numpy as np

    from grove_spark.operators.multimodal import (
        decode_and_featurize,
        decode_jpeg,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(3)
    rows = []
    for i in range(8):
        tiles = rng.integers(0, 256, (2, 2))
        img = np.kron(tiles, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
        rows.append((i, bytearray(encode_jpeg_gray(img, q=8))))
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    out = decode_and_featurize(df, decoder=decode_jpeg, target=(2, 2)).collect()
    assert len(out) == 8
    for r in out:
        assert len(r["features"]) == 4
        assert all(0.0 <= f <= 1.0 for f in r["features"])


def test_jpeg_color_constant_tiles_exact_in_ycbcr():
    """Color baseline 4:4:4: q=8 constant 8x8 RGB tiles round-trip
    EXACTLY in the YCbCr domain (the DC path divides without loss per
    component); the RGB view differs only by the two color-transform
    roundings."""
    import numpy as np

    from grove_spark.operators.multimodal import (
        _rgb_to_ycbcr,
        decode_jpeg,
        encode_jpeg_color,
    )

    rng = np.random.RandomState(7)
    tiles = np.repeat(
        np.repeat(rng.randint(0, 256, (3, 4, 3), dtype=np.uint8), 8, 0), 8, 1
    )
    blob = encode_jpeg_color(tiles, q=8)
    assert np.array_equal(
        decode_jpeg(blob, color_space="ycbcr"), _rgb_to_ycbcr(tiles)
    )
    rgb = decode_jpeg(blob)
    assert rgb.shape == tiles.shape
    assert np.max(np.abs(rgb.astype(int) - tiles.astype(int))) <= 2


def test_jpeg_color_general_images_near_exact_at_unit_quant():
    """Random RGB at q=1: error bounded by DCT rounding + the forward/
    inverse color-transform roundings (<= 4 LSB), incl. non-multiple-of-8
    shapes (edge padding + crop per component)."""
    import numpy as np

    from grove_spark.operators.multimodal import decode_jpeg, encode_jpeg_color

    rng = np.random.RandomState(11)
    for shape in [(16, 16, 3), (17, 26, 3), (8, 9, 3)]:
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg_color(img, q=1))
        assert out.shape == img.shape
        assert np.max(np.abs(out.astype(int) - img.astype(int))) <= 4


def test_jpeg_color_rejects_unsupported_subsampling():
    """A subsampling layout outside 4:4:4 / 4:2:2 / 4:2:0 (e.g. the
    vertical-only 1x2, or 4x1) must raise, not mis-decode."""
    import numpy as np
    import pytest as _pytest

    from grove_spark.operators.multimodal import decode_jpeg, encode_jpeg_color

    for hv in (0x12, 0x41):  # 1x2 (vertical 4:2:2), 4x1
        blob = bytearray(encode_jpeg_color(np.zeros((8, 8, 3), np.uint8)))
        j = blob.find(b"\xff\xc0")
        blob[j + 11] = hv
        with _pytest.raises(ValueError, match="subsampling"):
            decode_jpeg(bytes(blob))


def test_jpeg_420_constant_tiles_exact_in_ycbcr():
    """4:2:0: q=8 constant 16x16 RGB tiles round-trip EXACTLY in the
    YCbCr domain (constant chroma box-means to itself; DC path lossless
    per block), incl. a non-multiple-of-16 crop."""
    import numpy as np

    from grove_spark.operators.multimodal import (
        _rgb_to_ycbcr,
        decode_jpeg,
        encode_jpeg_color,
    )

    rng = np.random.RandomState(13)
    tiles = np.repeat(
        np.repeat(rng.randint(0, 256, (2, 3, 3), dtype=np.uint8), 16, 0), 16, 1
    )
    for img in (tiles, tiles[:18, :37]):  # exact MCUs + padded crop
        blob = encode_jpeg_color(img, q=8, subsampling="420")
        assert np.array_equal(
            decode_jpeg(blob, color_space="ycbcr"), _rgb_to_ycbcr(img)
        ), img.shape
        rgb = decode_jpeg(blob)
        assert rgb.shape == img.shape
        assert np.max(np.abs(rgb.astype(int) - img.astype(int))) <= 2


def test_jpeg_420_luma_near_exact_at_unit_quant():
    """Random RGB through 4:2:0 at q=1: chroma is genuinely lossy
    (2x2 box mean), but the FULL-RESOLUTION luma plane must come back
    within DCT rounding (<=1 LSB)."""
    import numpy as np

    from grove_spark.operators.multimodal import (
        _rgb_to_ycbcr,
        decode_jpeg,
        encode_jpeg_color,
    )

    rng = np.random.RandomState(17)
    img = rng.randint(0, 256, (21, 34, 3), dtype=np.uint8)
    ycc = decode_jpeg(encode_jpeg_color(img, q=1, subsampling="420"),
                      color_space="ycbcr")
    want_y = _rgb_to_ycbcr(img)[..., 0]
    assert np.max(np.abs(ycc[..., 0].astype(int) - want_y.astype(int))) <= 1


def test_jpeg_422_constant_tiles_exact_in_ycbcr():
    """4:2:2 (VERDICT r4 #9): q=8 constant 16x8 RGB tiles round-trip
    EXACTLY in YCbCr (constant chroma 1x2-box-means to itself), incl. a
    non-multiple-of-16-width crop; RGB within the two color roundings."""
    import numpy as np

    from grove_spark.operators.multimodal import (
        _rgb_to_ycbcr,
        decode_jpeg,
        encode_jpeg_color,
    )

    rng = np.random.RandomState(19)
    tiles = np.repeat(
        np.repeat(rng.randint(0, 256, (3, 2, 3), dtype=np.uint8), 8, 0), 16, 1
    )
    for img in (tiles, tiles[:18, :27]):  # exact MCUs + padded crop
        blob = encode_jpeg_color(img, q=8, subsampling="422")
        assert np.array_equal(
            decode_jpeg(blob, color_space="ycbcr"), _rgb_to_ycbcr(img)
        ), img.shape
        rgb = decode_jpeg(blob)
        assert rgb.shape == img.shape
        assert np.max(np.abs(rgb.astype(int) - img.astype(int))) <= 2


def test_jpeg_422_luma_near_exact_at_unit_quant():
    """Random RGB through 4:2:2 at q=1: chroma is horizontally lossy,
    the full-resolution luma comes back within DCT rounding."""
    import numpy as np

    from grove_spark.operators.multimodal import (
        _rgb_to_ycbcr,
        decode_jpeg,
        encode_jpeg_color,
    )

    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, (21, 34, 3), dtype=np.uint8)
    ycc = decode_jpeg(encode_jpeg_color(img, q=1, subsampling="422"),
                      color_space="ycbcr")
    want_y = _rgb_to_ycbcr(img)[..., 0]
    assert np.max(np.abs(ycc[..., 0].astype(int) - want_y.astype(int))) <= 1


def test_jpeg_restart_markers_decode_identically():
    """DRI/RSTn (VERDICT r4 #9): the same image encoded with restart
    intervals (byte-aligned cycling RSTn, DC predictors reset per spec
    F.2.1.3.1) must decode bit-identically to the restart-free stream —
    gray and every color layout, at intervals that land mid-row and on
    the last MCU."""
    import numpy as np

    from grove_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_color,
        encode_jpeg_gray,
    )

    rng = np.random.RandomState(29)
    g = rng.randint(0, 256, (24, 40), dtype=np.uint8)
    for r in (1, 2, 5, 7):
        with_rst = encode_jpeg_gray(g, q=1, restart_interval=r)
        assert b"\xff\xdd" in with_rst and b"\xff\xd0" in with_rst
        assert np.array_equal(
            decode_jpeg(with_rst), decode_jpeg(encode_jpeg_gray(g, q=1))
        ), f"gray r={r}"
    img = rng.randint(0, 256, (37, 45, 3), dtype=np.uint8)
    for sub in ("444", "422", "420"):
        for r in (1, 3):
            assert np.array_equal(
                decode_jpeg(encode_jpeg_color(
                    img, q=1, subsampling=sub, restart_interval=r)),
                decode_jpeg(encode_jpeg_color(img, q=1, subsampling=sub)),
            ), f"{sub} r={r}"


def test_jpeg_restart_malformed_streams_are_loud():
    """RST markers with no DRI declaration, and a DRI interval the
    stream's segments cannot satisfy, both raise — never mis-decode."""
    import re

    import numpy as np
    import pytest as _pytest

    from grove_spark.operators.multimodal import decode_jpeg, encode_jpeg_color

    img = np.random.RandomState(31).randint(0, 256, (24, 24, 3), np.uint8)
    blob = encode_jpeg_color(img, q=1, restart_interval=3)
    no_dri = re.sub(rb"\xff\xdd\x00\x04\x00\x03", b"", blob, count=1)
    with _pytest.raises(ValueError, match="no DRI"):
        decode_jpeg(no_dri)
    # interval 1 demands more segments than the interval-3 stream has
    wrong = blob.replace(
        b"\xff\xdd\x00\x04\x00\x03", b"\xff\xdd\x00\x04\x00\x01", 1
    )
    with _pytest.raises(ValueError, match="fewer restart segments"):
        decode_jpeg(wrong)


def test_jpeg_color_space_validated_and_mismatch_is_loud():
    import numpy as np
    import pytest as _pytest

    from grove_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_color,
        encode_jpeg_gray,
    )

    gray = encode_jpeg_gray(np.zeros((8, 8), np.uint8))
    with _pytest.raises(ValueError, match="color_space"):
        decode_jpeg(gray, color_space="bogus")  # validated on EVERY path
    # gray ignores a valid color_space (no transform to apply)
    assert decode_jpeg(gray, color_space="ycbcr").shape == (8, 8)
    # SOS naming a component id absent from SOF: ValueError, not KeyError
    blob = bytearray(encode_jpeg_color(np.zeros((8, 8, 3), np.uint8)))
    j = blob.find(b"\xff\xda")
    blob[j + 5] = 9  # first scan component id 1 -> 9
    with _pytest.raises(ValueError, match="missing frame component"):
        decode_jpeg(bytes(blob))
