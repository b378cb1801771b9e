"""Minimal pure-stdlib PNG codec (RFC 2083 / W3C PNG spec — public).

Exists so the multimodal REAL-decode path (`multimodal.decode_image`
``fake=False``) executes on actual image bytes even in environments without
Pillow: PNG is the one mainstream format decodable with nothing but
``zlib`` (stdlib) plus the five scanline filters.  Scope is deliberately
small and explicit:

- bit depth 8 only; color types 0 (gray), 2 (RGB), 6 (RGBA); no interlace
  (Adam7 rejected with a clear error), no palette, no 16-bit.
- decode returns (H, W, 3) uint8 — gray broadcast to 3 channels, alpha
  dropped — matching the Pillow ``convert("RGB")`` contract.
- encode writes color type 2, filter 0 scanlines (valid PNG readable by any
  viewer; used by tests to produce real files).

When Pillow IS importable the caller prefers it (full format coverage);
this module is the guaranteed floor, not a Pillow replacement.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → PNG bytes (color type 2, filter 0)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"encode_png expects (H, W, 3) uint8, got {a.shape}")
    h, w, _ = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == _SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw[pos : pos + stride], dtype=np.uint8).astype(np.int32)
        pos += stride
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth need the in-progress scanline
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                up = prev[i]
                ul = prev[i - ch] if i >= ch else 0
                if ftype == 1:  # Sub
                    cur[i] = (line[i] + left) & 0xFF
                elif ftype == 3:  # Average
                    cur[i] = (line[i] + ((left + up) >> 1)) & 0xFF
                elif ftype == 4:  # Paeth
                    cur[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
                else:
                    raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, ch)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, 3) uint8 (gray broadcast, alpha dropped)."""
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        crc_stored = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc_stored:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only bit depth 8 supported, got {depth}")
    if ctype not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype} (no palette/16-bit)")
    if interlace != 0:
        raise ValueError("Adam7 interlace not supported")
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (w * ch + 1):
        raise ValueError("PNG IDAT length mismatch")
    img = _unfilter(raw, h, w, ch)
    if ch == 1:
        return np.repeat(img, 3, axis=2)
    if ch == 4:
        return np.ascontiguousarray(img[:, :, :3])
    return img
