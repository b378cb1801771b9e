"""Minimal pure-stdlib Y4M (YUV4MPEG2) video container codec — the video
leg of the multimodal family, completing the real-container trio
(image: operators/png.py, audio: operators/wav.py, video: here).  Y4M is
the uncompressed interchange format the ffmpeg/mjpegtools toolchain
speaks (public spec: a space-separated ASCII stream header, then per
frame an ASCII ``FRAME`` marker + raw planar pixel bytes) — the one
video container decodable with no codec library at all, which is exactly
the role PNG/WAV play for the other modalities.

Scope, deliberately small and explicit:
- ``Cmono`` (8-bit luma-only) frames; color subsampling variants
  (C420…) are rejected with a clear error — the CONTAINER walk is the
  point, not a chroma pipeline.
- encode writes the canonical header ``YUV4MPEG2 W<w> H<h> F<n>:<d> Ip
  A1:1 Cmono``; decode accepts parameters in any order, ignores
  unknown/comment (``X…``) parameters as the spec requires of readers,
  and validates frame payload sizes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

__all__ = ["encode_y4m", "decode_y4m", "video_features"]

_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(T, H, W) uint8 luma frames → Y4M bytes (Cmono, Ip, A1:1)."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim != 3:
        raise ValueError(f"encode_y4m expects (T, H, W) uint8 frames, got shape {f.shape}")
    t, h, w = f.shape
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n".encode()
    return header + b"".join(b"FRAME\n" + f[i].tobytes() for i in range(t))


def decode_y4m(payload: bytes) -> tuple[tuple[int, int], np.ndarray]:
    """Y4M bytes → ((fps_num, fps_den), (T, H, W) uint8 frames).
    Cmono only; parameter order free; X-parameters ignored; malformed
    streams raise ValueError."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(_MAGIC + b" ") and payload[:nl] != _MAGIC:
        raise ValueError("not a YUV4MPEG2 stream")
    head = payload[:nl].split(b" ")
    if head[0] != _MAGIC:
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    colorspace = b"420"  # the spec default when C is absent
    for p in head[1:]:
        if not p:
            continue
        tag, val = p[:1], p[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps = (int(num), int(den))
        elif tag == b"C":
            colorspace = val
        # I (interlacing), A (aspect), X (extensions): irrelevant to pixels
    if w is None or h is None:
        raise ValueError("missing W or H in stream header")
    if colorspace != b"mono":
        raise ValueError(f"only Cmono supported, got C{colorspace.decode()}")
    frame_size = w * h
    frames = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        body = payload[fnl + 1 : fnl + 1 + frame_size]
        if len(body) != frame_size:
            raise ValueError(f"truncated frame at byte {fnl + 1}")
        frames.append(np.frombuffer(body, dtype=np.uint8).reshape(h, w))
        pos = fnl + 1 + frame_size
    return fps, np.stack(frames) if frames else np.zeros((0, h, w), np.uint8)


def video_features(df: DataFrame, payload_col: str, keep_cols: list[str]) -> DataFrame:
    """Decode + feature-extract a Y4M binary column in one Arrow pass.

    Output per row: ``keep_cols…, fps_num int, n_frames int, height int,
    width int, total_luma bigint, frame_delta_sum bigint, peak_luma int``
    — all exact integers (total luma of 8-bit frames fits int64 at any
    clip length a row can hold).  ``frame_delta_sum`` is the Σ_t
    \\|S_t − S_{t−1}\\| temporal-activity measure over per-frame luma sums
    S_t — the scene-change / static-clip triage statistic frame-sampling
    pipelines cut on."""
    import pandas as pd

    keep_schema = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in keep_cols)
    out_schema = (
        keep_schema + ", fps_num int, n_frames int, height int, width int, "
        "total_luma bigint, frame_delta_sum bigint, peak_luma int"
    )

    def extract(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                (fn, _fd), frames = decode_y4m(bytes(r[payload_col]))
                # explicit h*w (not -1): reshape(-1) raises on a legal
                # zero-frame clip, where frames has shape (0, h, w)
                n_f, f_h, f_w = frames.shape
                sums = frames.reshape(n_f, f_h * f_w).sum(axis=1, dtype=np.int64)
                delta = int(np.abs(np.diff(sums)).sum()) if len(sums) > 1 else 0
                rows.append(
                    tuple(r[c] for c in keep_cols)
                    + (
                        fn,
                        int(frames.shape[0]),
                        int(frames.shape[1]),
                        int(frames.shape[2]),
                        int(sums.sum()),
                        delta,
                        int(frames.max()) if frames.size else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=keep_cols
                + [
                    "fps_num", "n_frames", "height", "width",
                    "total_luma", "frame_delta_sum", "peak_luma",
                ],
            )

    return df.select(*keep_cols, payload_col).mapInPandas(extract, schema=out_schema)
