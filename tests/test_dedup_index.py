"""Persisted MinHash fingerprint index (operators/dedup.py:
write_minhash_index / append_minhash_index / read_minhash_index): the
append ≡ rebuild contract, frozen-params meta, and validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.operators import dedup as D


def _docs(spark):
    rows = [
        (i, f"w{i % 5} alpha beta gamma delta w{i % 3} epsilon zeta eta theta")
        for i in range(24)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_append_equals_rebuild(spark, tmp_path):
    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 2 == 0)
    growth = docs.filter(F.col("doc_id") % 2 == 1)

    grown = str(tmp_path / "grown")
    D.write_minhash_index(grown, base, "text", "doc_id",
                          shingle_n=3, num_hashes=32, bands=16)
    D.append_minhash_index(spark, grown, growth)

    rebuilt = str(tmp_path / "rebuilt")
    D.write_minhash_index(rebuilt, docs, "text", "doc_id",
                          shingle_n=3, num_hashes=32, bands=16)

    _, gi = D.read_minhash_index(spark, grown)
    _, ri = D.read_minhash_index(spark, rebuilt)
    key = lambda r: (r.doc_id, r.band, r.band_hash)  # noqa: E731
    assert sorted(map(key, gi.collect())) == sorted(map(key, ri.collect()))


def test_meta_freezes_params(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    D.write_minhash_index(path, docs, "text", "doc_id",
                          shingle_n=4, num_hashes=64, bands=8)
    meta, idx = D.read_minhash_index(spark, path)
    assert meta == {
        "shingle_n": 4, "num_hashes": 64, "bands": 8,
        "text_col": "text", "key_col": "doc_id",
    }
    # index rows carry exactly the frozen band count
    assert idx.select("band").distinct().count() == 8


def test_read_rejects_corrupt_meta(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    D.write_minhash_index(path, docs)
    # a second meta row (e.g. a botched manual append) must fail loudly
    spark.createDataFrame(
        [(3, 32, 16, "text", "doc_id")], D._MINHASH_META_SCHEMA
    ).coalesce(1).write.mode("append").parquet(f"{path}/meta")
    with pytest.raises(ValueError, match="exactly one meta row"):
        D.read_minhash_index(spark, path)
