"""WAV codec (operators/wav.py): roundtrip, spec-reader tolerance, rejections."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fs2_kinesis_firehose_spark.operators.wav import decode_wav, encode_wav


def test_roundtrip_identity():
    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32767, size=997, dtype=np.int16)
    rate, out = decode_wav(encode_wav(s, 16000))
    assert rate == 16000
    assert np.array_equal(out, s)
    assert len(encode_wav(s, 16000)) == 44 + 2 * len(s)


def test_decoder_skips_unknown_chunks_and_any_order():
    s = np.array([1, -2, 3], dtype=np.int16)
    data = s.tobytes()
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    junk = b"LIST" + struct.pack("<I", 5) + b"junk!" + b"\x00"  # odd size -> pad byte
    body = junk + b"data" + struct.pack("<I", len(data)) + data + b"fmt " + fmt
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, out = decode_wav(payload)
    assert rate == 8000 and np.array_equal(out, s)


def test_decoder_rejects_non_pcm16_and_garbage():
    s = np.zeros(4, dtype=np.int16)
    good = bytearray(encode_wav(s, 8000))
    stereo = good.copy(); stereo[22] = 2            # channels = 2
    floatw = good.copy(); floatw[20] = 3            # format = IEEE float
    with pytest.raises(ValueError, match="PCM16 mono"):
        decode_wav(bytes(stereo))
    with pytest.raises(ValueError, match="PCM16 mono"):
        decode_wav(bytes(floatw))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + bytes(40))
    with pytest.raises(ValueError, match="missing fmt or data"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_encode_rejects_bad_shape():
    with pytest.raises(ValueError, match="1-D"):
        encode_wav(np.zeros((2, 2), dtype=np.int16), 8000)


def test_audio_features_spark(spark):
    from pyspark.sql import Row

    from fs2_kinesis_firehose_spark.operators.wav import audio_features

    s1 = np.array([100, -200, 300, 0, -1], dtype=np.int16)
    s2 = np.array([5], dtype=np.int16)
    df = spark.createDataFrame(
        [
            Row(cid=1, payload=bytearray(encode_wav(s1, 8000))),
            Row(cid=2, payload=bytearray(encode_wav(s2, 12000))),
        ]
    )
    got = {r.cid: r.asDict() for r in audio_features(df, "payload", ["cid"]).collect()}
    assert got[1]["n_samples"] == 5 and got[1]["sample_rate"] == 8000
    assert got[1]["sum_squares"] == 100**2 + 200**2 + 300**2 + 0 + 1
    assert got[1]["zero_crossings"] == 2  # 100/-200, -200/300; 0 never crosses
    assert got[1]["peak"] == 300
    assert got[2]["n_samples"] == 1 and got[2]["zero_crossings"] == 0 and got[2]["peak"] == 5


def test_decode_truncated_chunk_raises():
    """Regression (r8 fix, wav.py:65): a chunk declaring more bytes than
    remain must raise, not silently yield a short clip."""
    payload = encode_wav(np.arange(100, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="truncated chunk"):
        decode_wav(payload[:-7])


def test_decode_odd_data_length_raises():
    """Regression (r8 fix, wav.py:85): a 3-byte data chunk cannot hold
    16-bit samples — loud error, not a silently dropped trailing byte."""
    data = b"\x01\x02\x03"
    payload = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    with pytest.raises(ValueError, match="odd data chunk"):
        decode_wav(payload)
