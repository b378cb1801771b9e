"""Winnowing fingerprints (operators/fingerprint.py) — hand-checked
selection rule + the paper's coverage guarantee."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.operators.fingerprint import (
    fingerprint_overlap_pairs,
    winnow_fingerprints,
)


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def _reference_winnow(text: str, gram_n: int = 3, window: int = 4) -> set[int]:
    toks = text.split()
    grams = [" ".join(toks[i : i + gram_n]) for i in range(len(toks) - gram_n + 1)]
    hs = [_h(g) for g in grams]
    if not hs:
        return set()
    starts = range(max(len(hs) - window + 1, 1))
    return {min(hs[j : j + window]) for j in starts}


def test_winnow_matches_reference_implementation(spark):
    docs = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "a short doc"),          # exactly one gram -> one fingerprint
        (2, "tiny"),                 # fewer tokens than gram_n -> no grams
        (3, "one two three four five six seven"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(df, "text", "doc_id").collect():
        got.setdefault(r.doc_id, set()).add(r.fingerprint)
    for doc_id, text in docs:
        expected = _reference_winnow(text)
        assert got.get(doc_id, set()) == expected, doc_id


def test_shared_passage_guarantees_shared_fingerprint(spark):
    # docs share a run of window + gram_n - 1 = 6 tokens -> the winnowing
    # guarantee says at least one selected fingerprint is common
    shared = "alpha beta gamma delta epsilon zeta"
    docs = [
        (0, f"intro words here {shared} tail one"),
        (1, f"completely different start {shared} other ending tokens"),
        (2, "no overlap with anything else whatsoever in this text"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    fp = winnow_fingerprints(df, "text", "doc_id")
    by_doc: dict[int, set[int]] = {}
    for r in fp.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[0] & by_doc[1], "shared 6-token run must share a fingerprint"
    assert not (by_doc[0] & by_doc[2])


def test_overlap_pairs_counts(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            (0, f"x y z {shared}"),
            (1, f"p q r s {shared}"),
            (2, "unrelated content entirely different words throughout here"),
        ],
        "doc_id int, text string",
    )
    pairs = {
        (r.key1, r.key2): r.n_shared
        for r in fingerprint_overlap_pairs(df, min_shared=1).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert all(2 not in k for k in pairs)


def test_density_is_sublinear(spark, sf_smoke):
    from fs2_kinesis_firehose_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    n_grams = docs.select(
        F.explode(F.expr("slice(split(trim(text), '\\\\s+'), 1, greatest(size(split(trim(text), '\\\\s+')) - 2, 0))"))
    ).count()
    n_fp = winnow_fingerprints(docs, "text", "doc_id").count()
    # expected density 2/(w+1) = 0.4 of gram count; distinct-ing only lowers
    assert n_fp < 0.6 * n_grams


def test_coverage_report_run_lengths_and_guarantee(spark):
    from fs2_kinesis_firehose_spark.operators.fingerprint import coverage_report

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens -> 6 grams
    docs = [
        (0, f"intro words here {shared} closing words"),
        (1, f"{shared} completely different tail text now"),
        (2, "unrelated text with no overlap at all whatsoever"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    rows = {(r.key1, r.key2): r for r in coverage_report(df, "text", "doc_id").collect()}
    assert set(rows) == {(0, 1)}
    r = rows[(0, 1)]
    # 8 shared tokens = 6 shared consecutive 3-grams on one diagonal
    assert r.max_gram_run == 6
    assert r.n_matches >= 6
    # run >= window(4) => the guarantee must hold with >=1 shared fingerprint
    assert r.n_shared_fp >= 1
    assert bool(r.guarantee_ok) is True


def test_coverage_report_below_window_run_is_still_reported(spark):
    from fs2_kinesis_firehose_spark.operators.fingerprint import coverage_report

    # 6 shared tokens -> 4 shared grams: exactly at the window boundary
    shared = "one two three four five six"
    docs = [
        (0, f"{shared} padding tail a b c"),
        (1, f"prefix words {shared} other ending"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    rows = coverage_report(df, "text", "doc_id", gram_n=3, window=4).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.max_gram_run == 4
    assert r.n_shared_fp >= 1 and bool(r.guarantee_ok) is True
