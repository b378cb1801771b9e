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


# ---------------------------------------------------------------------------
# exact_substring_spans (Lee et al. ExactSubstr accounting)
def _ess(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from fs2_kinesis_firehose_spark.operators.dedup import exact_substring_spans

    return {
        r.doc_id: (r.n_tokens, r.dup_grams, r.covered_tokens, r.coverage)
        for r in exact_substring_spans(df, **kw).collect()
    }


def test_exact_substring_exact_dup_docs_fully_covered(spark):
    text = "a b c d e f g h i j"
    got = _ess(spark, [(1, text), (2, text), (3, "z y x w v u t s r q")], k=8)
    # docs 1/2 duplicate each other: every 8-gram repeats, full coverage
    assert got[1] == (10, 3, 10, 1.0)
    assert got[2] == (10, 3, 10, 1.0)
    assert 3 not in got  # unique doc: no duplicated grams


def test_exact_substring_partial_overlap_and_island_merge(spark):
    # doc 2 shares ONLY the 8-token prefix of doc 1; doc 1 has 12 tokens ->
    # one duplicated 8-gram at pos 0, covering tokens 0..7 of both docs
    d1 = "a b c d e f g h X Y Z W"
    d2 = "a b c d e f g h p q r s"
    got = _ess(spark, [(1, d1), (2, d2)], k=8)
    assert got[1] == (12, 1, 8, round(8 / 12, 6))
    assert got[2] == (12, 1, 8, round(8 / 12, 6))


def test_exact_substring_overlapping_spans_union_once(spark):
    # doc 2 repeats doc 1's tokens 0..8 (9 tokens): two overlapping dup
    # 8-grams (pos 0, pos 1) must merge into ONE 9-token island, not 16
    d1 = "a b c d e f g h i J K L"
    d2 = "a b c d e f g h i p q r"
    got = _ess(spark, [(1, d1), (2, d2)], k=8)
    assert got[1] == (12, 2, 9, 0.75)


def test_exact_substring_within_doc_repeat_counts(spark):
    # the SAME 8-gram twice within one doc is corpus-count 2 -> duplicated
    text = "a b c d e f g h a b c d e f g h"
    got = _ess(spark, [(1, text)], k=8)
    assert got[1] == (16, 2, 16, 1.0)


def test_exact_substring_validation(spark):
    from fs2_kinesis_firehose_spark.operators.dedup import exact_substring_spans

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must be"):
        exact_substring_spans(df, k=1)
    with pytest.raises(ValueError, match="min_occurrences"):
        exact_substring_spans(df, min_occurrences=1)
