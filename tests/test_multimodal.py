"""Multimodal plumbing tests: media contract schema, mapInPandas batch shapes,
deterministic fake decode, 1:N frame expansion, stub gating."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.operators import multimodal as M


def _media(spark):
    rows = [(1, b"abcdefgh" * 10), (2, b"zyxwvut" * 12), (3, b"Q")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    return M.attach_media(df, "payload", media_type="image/fake")


def test_media_contract_schema(spark):
    media = _media(spark)
    assert media.schema["payload"].dataType.simpleString() == "binary"
    meta = media.schema["meta"].dataType
    assert [f.name for f in meta.fields] == ["n_bytes", "sha256", "source"]
    row = media.filter("doc_id = 1").first()
    assert row.meta.n_bytes == 80
    assert row.meta.sha256 == hashlib.sha256(b"abcdefgh" * 10).hexdigest()


@pytest.mark.skipif(M._PILImage is not None, reason="Pillow installed: real decode available")
def test_decode_non_png_raises_without_pillow():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x00\x01")  # not a PNG; no Pillow -> explicit error


def test_real_codec_decodes_actual_png(spark):
    """decode_image handles REAL encoded PNG bytes — via Pillow when present,
    else the pure-stdlib codec — and the full mapInPandas feature stage runs
    on them (fake=False).  Runs unconditionally: PNG decode has no optional
    dependency."""
    import numpy as np

    from fs2_kinesis_firehose_spark.operators.png import encode_png

    ref = np.arange(6 * 5 * 3, dtype=np.uint8).reshape(6, 5, 3)
    png = encode_png(ref)
    assert (M.decode_image(png) == ref).all()  # PNG is lossless

    media = M.attach_media(
        spark.createDataFrame([(1, png)], "doc_id long, payload binary"),
        "payload",
        media_type="image/png",
    )
    row = M.extract_image_features(media, fake=False).first()
    assert (row.height, row.width, row.n_channels) == (6, 5, 3)
    assert row.mean_intensity == round(float(ref.mean()), 6)


def test_fake_decode_deterministic_dimensions():
    img = M._fake_decode(b"abcdefgh")
    # h = 8 + ord('a')%8 = 8+1, w = 8 + ord('h')%8 = 8+0
    assert img.shape == (9, 8, 3)
    assert (M._fake_decode(b"abcdefgh") == img).all()


def test_extract_image_features_one_to_one(spark):
    media = _media(spark)
    feats = M.extract_image_features(media, fake=True)
    rows = {r.doc_id: r for r in feats.collect()}
    assert set(rows) == {1, 2, 3}
    r1 = rows[1]
    assert (r1.height, r1.width, r1.n_channels) == (9, 8, 3)
    assert r1.payload_sha == hashlib.sha256(b"abcdefgh" * 10).hexdigest()
    assert 0.0 <= r1.mean_intensity <= 255.0


def test_resize_images_shape(spark):
    media = _media(spark)
    out = {r.doc_id: bytes(r.payload) for r in M.resize_images(media, (4, 4), fake=True).collect()}
    assert all(len(p) == 4 * 4 * 3 for p in out.values())


def test_sample_frames_expansion(spark):
    media = _media(spark).filter("doc_id = 1")  # fake image is 9 rows tall
    frames = M.sample_frames(media, every_n=4, fake=True).collect()
    assert [f.frame_idx for f in frames] == [0, 4, 8]
    img = M._fake_decode(b"abcdefgh" * 10)
    assert bytes(frames[0].frame_payload) == img[0].tobytes()


def test_partitioned_execution_preserves_rows(spark):
    rows = [(i, bytes([i % 256]) * (10 + i % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").repartition(8)
    media = M.attach_media(df, "payload")
    assert M.extract_image_features(media, fake=True).count() == 200
