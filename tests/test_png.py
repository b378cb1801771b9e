"""Pure-stdlib PNG codec (operators/png.py): round-trip, all five scanline
filters against a forward-filtering reference, color-type conversions, and
malformed-input errors."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from fs2_kinesis_firehose_spark.operators import png as P


def test_roundtrip_rgb():
    rng = np.random.default_rng(11)
    ref = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    data = P.encode_png(ref)
    assert P.is_png(data)
    assert (P.decode_png(data) == ref).all()


def test_encode_rejects_bad_shape():
    with pytest.raises(ValueError):
        P.encode_png(np.zeros((4, 4), dtype=np.uint8))


def _forward_filter(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Reference FORWARD filtering (spec §6): produces the raw stream the
    decoder must invert."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    out = b""
    for y, ft in enumerate(ftypes):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        line = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            left = cur[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if ft == 0:
                line[i] = cur[i]
            elif ft == 1:
                line[i] = cur[i] - left
            elif ft == 2:
                line[i] = cur[i] - up
            elif ft == 3:
                line[i] = cur[i] - ((left + up) >> 1)
            elif ft == 4:
                line[i] = cur[i] - P._paeth(left, up, ul)
        out += bytes([ft]) + bytes((line & 0xFF).astype(np.uint8))
    return out


def _png_from_raw(raw: bytes, w: int, h: int, ctype: int) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        P._SIGNATURE
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(raw))
        + P._chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_each_filter_type_inverts(ftype):
    rng = np.random.default_rng(ftype)
    ref = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    raw = _forward_filter(ref, [ftype] * 5)
    assert (P.decode_png(_png_from_raw(raw, 7, 5, 2)) == ref).all()


def test_mixed_filters_per_scanline():
    rng = np.random.default_rng(99)
    ref = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    raw = _forward_filter(ref, [0, 1, 2, 3, 4])
    assert (P.decode_png(_png_from_raw(raw, 4, 5, 2)) == ref).all()


def test_grayscale_broadcasts_and_rgba_drops_alpha():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(3))
    out = P.decode_png(_png_from_raw(raw, 4, 3, 0))
    assert out.shape == (3, 4, 3)
    assert (out[:, :, 0] == out[:, :, 2]).all()

    rgba = np.arange(2 * 2 * 4, dtype=np.uint8).reshape(2, 2, 4)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(2))
    out = P.decode_png(_png_from_raw(raw, 2, 2, 6))
    assert out.shape == (2, 2, 3)
    assert (out == rgba[:, :, :3]).all()


def test_crc_corruption_detected():
    data = bytearray(P.encode_png(np.zeros((2, 2, 3), dtype=np.uint8)))
    data[-18] ^= 0xFF  # flip a byte inside IDAT payload region
    with pytest.raises(ValueError, match="CRC|length|IDAT|Error"):
        P.decode_png(bytes(data))


def test_rejects_non_png_and_interlace():
    with pytest.raises(ValueError, match="signature"):
        P.decode_png(b"JFIF....")
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)  # interlace=1
    bad = P._SIGNATURE + P._chunk(b"IHDR", ihdr) + P._chunk(b"IDAT", zlib.compress(b"")) + P._chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="Adam7"):
        P.decode_png(bad)
