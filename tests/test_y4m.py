"""Y4M codec (operators/y4m.py): roundtrip, header tolerance, rejections."""

from __future__ import annotations

import numpy as np
import pytest

from fs2_kinesis_firehose_spark.operators.y4m import decode_y4m, encode_y4m


def test_roundtrip_identity():
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(4, 6, 10), dtype=np.uint8)
    fps, out = decode_y4m(encode_y4m(frames, fps=(30, 1)))
    assert fps == (30, 1)
    assert np.array_equal(out, frames)
    # header text varies with W/H; rebuild the expected bytes exactly
    hdr = b"YUV4MPEG2 W10 H6 F25:1 Ip A1:1 Cmono\n"
    assert len(encode_y4m(frames)) == len(hdr) + 4 * (6 + 60)


def test_decoder_param_order_and_x_params():
    frames = np.arange(8, dtype=np.uint8).reshape(1, 2, 4)
    payload = (
        b"YUV4MPEG2 XCOMMENT F24:1 H2 Cmono W4 Ip\n"
        + b"FRAME\n" + frames[0].tobytes()
    )
    fps, out = decode_y4m(payload)
    assert fps == (24, 1) and np.array_equal(out, frames)


def test_decoder_rejections():
    frames = np.zeros((1, 2, 2), dtype=np.uint8)
    good = encode_y4m(frames)
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"RIFF" + bytes(20))
    with pytest.raises(ValueError, match="Cmono"):
        decode_y4m(good.replace(b"Cmono", b"C420 "))
    with pytest.raises(ValueError, match="missing W or H"):
        decode_y4m(b"YUV4MPEG2 F25:1 Cmono\n")
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(good[:-2])
    with pytest.raises(ValueError, match="FRAME"):
        decode_y4m(good[: len(good) - 4 - 6] + b"JUNK!\n" + bytes(4))
    with pytest.raises(ValueError, match="\\(T, H, W\\)"):
        encode_y4m(np.zeros((2, 2), dtype=np.uint8))


def test_video_features_spark(spark):
    from pyspark.sql import Row

    from fs2_kinesis_firehose_spark.operators.y4m import video_features

    f1 = np.stack([np.full((2, 2), 10, np.uint8), np.full((2, 2), 30, np.uint8)])
    df = spark.createDataFrame([Row(cid=1, payload=bytearray(encode_y4m(f1, fps=(25, 1))))])
    r = video_features(df, "payload", ["cid"]).collect()[0]
    assert (r.n_frames, r.height, r.width, r.fps_num) == (2, 2, 2, 25)
    assert r.total_luma == 4 * 10 + 4 * 30
    assert r.frame_delta_sum == abs(120 - 40)
    assert r.peak_luma == 30


def test_zero_frame_clip_decodes_and_features(spark):
    """Regression (r8 fix, y4m.py:110): a header-only clip (zero FRAMEs) is
    legal — decode yields shape (0, H, W) and video_features must not crash
    on the reshape (the old reshape(-1, h*w) raised on 0 frames)."""
    from pyspark.sql import Row

    from fs2_kinesis_firehose_spark.operators.y4m import video_features

    payload = encode_y4m(np.zeros((0, 4, 6), np.uint8), fps=(30, 1))
    fps, frames = decode_y4m(payload)
    assert fps == (30, 1)
    assert frames.shape == (0, 4, 6) and frames.dtype == np.uint8

    df = spark.createDataFrame([Row(cid=1, payload=bytearray(payload))])
    r = video_features(df, "payload", ["cid"]).collect()[0]
    assert (r.n_frames, r.height, r.width) == (0, 4, 6)
    assert (r.total_luma, r.frame_delta_sum, r.peak_luma) == (0, 0, 0)
