"""Gopher repetition signals (operators/textstats.py:gopher_repetition).

Hand-computed fractions on tiny documents; the corpus-level statistic is
oracle-checked via the gopher_repetition_flags registry entry.
"""

from __future__ import annotations

import pytest

from fs2_kinesis_firehose_spark.operators.textstats import gopher_repetition


@pytest.fixture(scope="module")
def rows(spark):
    docs = [
        # 0: "a b" ×4 — top 2-gram "a b" count 4, 2 chars -> 8/8 = 1.0
        (0, "a b a b a b a b"),
        # 1: 30 distinct 3-char words — top-n fracs are n/30, all in bounds
        (1, " ".join(f"w{i:02d}" for i in range(30))),
        # 2: shorter than 5 tokens -> all dup fracs 0
        (2, "xx yy zz"),
        # 3: empty
        (3, ""),
        # 4: a repeated 5-gram: "p q r s t" twice (10 tokens, 10 chars)
        (4, "p q r s t p q r s t"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = gopher_repetition(df, "text", "doc_id").collect()
    return {r["doc_id"]: r for r in out}


def test_top_bigram_saturated(rows):
    r = rows[0]
    assert r["total_chars"] == 8
    assert r["top_2gram_char_frac"] == 1.0
    assert not r["keep_repetition"]


def test_distinct_doc_passes(rows):
    r = rows[1]
    # every gram occurs once; equal word lengths make top-n frac n/30
    assert r["dup_5gram_char_frac"] == 0.0
    assert r["top_2gram_char_frac"] == pytest.approx(2 / 30)
    assert r["top_4gram_char_frac"] == pytest.approx(4 / 30)
    assert r["keep_repetition"]


def test_short_doc_no_dup_grams(rows):
    r = rows[2]
    for n in range(5, 11):
        assert r[f"dup_{n}gram_char_frac"] == 0.0
    # 3 tokens -> one 3-gram ("xx yy zz", 6 chars / 6 chars), zero 4-grams
    assert r["top_3gram_char_frac"] == 1.0
    assert r["top_4gram_char_frac"] == 0.0


def test_empty_doc_all_zero(rows):
    r = rows[3]
    assert r["total_chars"] == 0
    assert all(
        r[c] == 0.0
        for c in r.asDict()
        if c.endswith("_char_frac")
    )


def test_repeated_5gram_counted_with_overlap(rows):
    r = rows[4]
    # "p q r s t" occurs exactly twice (starts 1 and 6); the overlapping
    # starts 2..5 grams ("q r s t p" etc.) each occur once.  dup chars =
    # 2 occurrences x 5 chars over 10 total.
    assert r["dup_5gram_char_frac"] == pytest.approx(1.0)
    # 6-grams: all 5 distinct -> no duplicates
    assert r["dup_6gram_char_frac"] == 0.0
    assert not r["keep_repetition"]
