"""Minimal pure-stdlib WAV (RIFF/WAVE PCM16) codec — the audio leg of the
multimodal family (Microsoft/IBM RIFF WAVE format, public spec; same role
as operators/png.py for images: the REAL decode path that needs no
third-party audio library, because PCM WAV is a fixed 44-byte header plus
raw little-endian samples).

Scope, deliberately small and explicit:
- PCM (audio format 1), 16-bit, mono; other formats/bit depths rejected
  with a clear error (compressed WAV, float WAV, multi-channel are out of
  scope — the container is the point, not a DSP suite).
- canonical 44-byte header layout on encode (RIFF + fmt(16) + data);
  decode accepts any chunk order and skips unknown chunks (LIST/fact …),
  as the spec requires of readers.

``audio_features`` is the Arrow-batched feature extractor over a binary
payload column: one ``mapInPandas`` pass, numpy ``frombuffer`` per row —
no Python loops over samples.  Emitted features are integer-exact
(sum of squares, zero crossings, peak) precisely so a SQL oracle can
restate them bit-for-bit from a deterministic waveform definition.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["encode_wav", "decode_wav", "audio_features"]


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples → canonical PCM16 WAV bytes (44-byte header)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim != 1:
        raise ValueError(f"encode_wav expects 1-D int16 samples, got shape {s.shape}")
    data = s.tobytes()
    byte_rate = sample_rate * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, int16 sample array).  PCM16 mono only;
    unknown chunks are skipped, chunk order is free (spec-conforming
    reader), malformed containers raise ValueError."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, n = 12, len(payload)
    sample_rate = None
    data = None
    while pos + 8 <= n:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if pos + 8 + size > n:
            raise ValueError(
                f"truncated chunk {tag!r} at byte {pos}: declares {size} bytes, "
                f"{n - pos - 8} remain"
            )
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk too short: {size}")
            fmt, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"only PCM16 mono supported, got format={fmt} channels={channels} bits={bits}"
                )
            sample_rate = rate
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if len(data) % 2:
        raise ValueError(f"odd data chunk length {len(data)} for 16-bit samples")
    return sample_rate, np.frombuffer(data, dtype="<i2")


def audio_features(df: DataFrame, payload_col: str, keep_cols: list[str]) -> DataFrame:
    """Decode + feature-extract a WAV binary column in one Arrow pass.

    Output per row: ``keep_cols…, sample_rate int, n_samples bigint,
    sum_squares bigint, zero_crossings bigint, peak int`` — all exact
    integers (sum of squares of int16 fits int64 far beyond any real clip
    length).  Zero crossings use the strict-sign-product convention
    (s[i-1]·s[i] < 0); zeros do not cross.
    """
    keep_schema = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in keep_cols)
    out_schema = (
        keep_schema + ", sample_rate int, n_samples bigint, sum_squares bigint, "
        "zero_crossings bigint, peak int"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                rate, s = decode_wav(bytes(r[payload_col]))
                s64 = s.astype(np.int64)
                zc = int(np.count_nonzero(s64[:-1] * s64[1:] < 0)) if len(s) > 1 else 0
                rows.append(
                    tuple(r[c] for c in keep_cols)
                    + (
                        rate,
                        len(s),
                        int(np.dot(s64, s64)),
                        zc,
                        int(np.max(np.abs(s64))) if len(s) else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=keep_cols
                + ["sample_rate", "n_samples", "sum_squares", "zero_crossings", "peak"],
            )

    return df.select(*keep_cols, payload_col).mapInPandas(extract, schema=out_schema)
