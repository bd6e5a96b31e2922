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
