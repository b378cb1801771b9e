"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

Same opaque-bytes contract as the reference's Record payload
(RecordOps.scala:26 — a ByteBuffer the engine never interprets); the *Spark*
side (schema, partition flow, UDF signatures, batch shapes) is real and
tested.  Codec calls are gated behind an OPTIONAL dependency: when Pillow is
importable, ``decode_image`` decodes real JPEG/PNG bytes (skip-marked pytest
exercises that path); otherwise it raises ``NotImplementedError`` unless
``fake=True`` selects the deterministic fake decoder (header-derived,
reproducible everywhere — the CI and oracle path).

At 100 TB: binary payloads dominate row size — the decode stage is
``mapInPandas`` so each task streams Arrow batches without materializing the
partition; pair with ``spark.sql.files.maxPartitionBytes`` sizing and
``repartition`` before GPU-bound stages.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, payload binary, media_type string, "
    "meta struct<n_bytes: bigint, sha256: string, source: string>"
)

IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, n_channels int, "
    "mean_intensity double, payload_sha string"
)

FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_idx int, frame_payload binary"


def attach_media(
    df: DataFrame, payload_col, media_type: str = "image/fake", source_col: str | None = None
) -> DataFrame:
    """Wrap a binary column into the engine's media contract:
    (payload: binary, media_type, meta struct) — metadata travels WITH the
    bytes through every shuffle, so downstream stages never re-derive it."""
    payload = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.struct(
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
            (F.col(source_col) if source_col else F.lit("synthetic")).alias("source"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake image decode: dimensions and pixels derived from the
    payload bytes (stable across engines/processes). STUB — replace with a
    real codec (PIL/libvips) in production images."""
    if payload is None or len(payload) == 0:
        return np.zeros((1, 1, 3), dtype=np.uint8)
    h = 8 + (payload[0] % 8)
    w = 8 + (payload[-1] % 8)
    tile = np.frombuffer(payload, dtype=np.uint8)
    need = h * w * 3
    reps = int(np.ceil(need / len(tile)))
    return np.tile(tile, reps)[:need].reshape(h, w, 3)


try:  # optional dependency: real codecs only when Pillow is importable
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - absent in the CI container
    _PILImage = None


def decode_image(payload: bytes, *, fake: bool = False) -> np.ndarray:
    """Decode image bytes to an (H, W, 3) uint8 array.

    ``fake=True`` selects the deterministic header-derived decoder (the CI /
    oracle path — no codec dependency, reproducible everywhere).  The real
    path prefers Pillow (full format coverage) when importable; PNG bytes
    always decode via the pure-stdlib codec (`operators/png.py`) as the
    guaranteed floor, so real-media decode runs even without Pillow.  Other
    formats without Pillow raise rather than silently degrading."""
    if fake:
        return _fake_decode(payload)
    if _PILImage is not None:
        import io

        with _PILImage.open(io.BytesIO(payload)) as img:
            return np.asarray(img.convert("RGB"))
    from fs2_kinesis_firehose_spark.operators import png as _png

    if _png.is_png(bytes(payload)):
        return _png.decode_png(payload)
    raise NotImplementedError(
        "real decoding of non-PNG formats requires Pillow, which is not "
        "installed; PNG decodes via the stdlib codec, or pass fake=True "
        "for the deterministic test decoder"
    )


def extract_image_features(df_media: DataFrame, *, fake: bool = True) -> DataFrame:
    """mapInPandas decode + feature stage.

    Batch shape: Arrow record batches of the media contract in, feature rows
    out (1:1).  The UDF never sees the whole partition — bounded memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hashlib import sha256

        for pdf in batches:
            rows = []
            for doc_id, payload, media_type in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                img = decode_image(bytes(payload), fake=fake)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_type": media_type,
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "n_channels": img.shape[2],
                        "mean_intensity": round(float(img.mean()), 6),
                        "payload_sha": sha256(bytes(payload)).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return df_media.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_images(df_media: DataFrame, size: tuple[int, int], *, fake: bool = True) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (raw bytes) via mapInPandas.

    STUB decode; the resize itself is real numpy (nearest-neighbor index
    sampling), demonstrating the full decode→transform→reencode batch flow."""
    th, tw = size

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(payload), fake=fake)
                ys = (np.arange(th) * img.shape[0] // th).astype(int)
                xs = (np.arange(tw) * img.shape[1] // tw).astype(int)
                resized = img[ys][:, xs]
                out.append({"doc_id": doc_id, "payload": resized.tobytes()})
            yield pd.DataFrame(out)

    return df_media.mapInPandas(run, "doc_id bigint, payload binary")


def sample_frames(df_media: DataFrame, every_n: int = 4, *, fake: bool = True) -> DataFrame:
    """Video-style 1:N frame sampling: each media row expands to its sampled
    'frames' (here: byte stripes of the fake decode) — demonstrates the
    1-to-many mapInPandas expansion shape used for real video."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(payload), fake=fake)
                for frame_idx in range(0, img.shape[0], every_n):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": frame_idx,
                            "frame_payload": img[frame_idx].tobytes(),
                        }
                    )
            yield pd.DataFrame(rows)

    return df_media.mapInPandas(run, FRAME_SAMPLE_SCHEMA)
