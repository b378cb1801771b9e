"""Ground-truth tests for the BPE trainer/segmenter (rows-only operator —
merge selection is corpus-global, not SQL-expressible)."""

from __future__ import annotations

from fs2_kinesis_firehose_spark.operators import bpe as B


def test_bpe_train_hand_computed_merges(spark):
    # corpus: 'low' x5, 'lower' x2 — classic Sennrich example shape.
    # Pair counts round 1: (l,o)=7, (o,w)=7, (w,</w>)=5, (w,e)=2, (e,r)=2,
    # (r,</w>)=2 → tie (l,o) vs (o,w) at 7 → lexicographic: ('l','o').
    df = spark.createDataFrame(
        [(1, "low low low low low"), (2, "lower lower")], "id long, text string"
    )
    merges = B.bpe_train(df, num_merges=3, min_count=1)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")  # (lo,w)=7 now dominates
    assert merges[2] == ("low", "</w>")  # low</w> x5


def test_bpe_train_deterministic_across_partitionings(spark):
    rows = [(i, f"alpha beta gamma delta tok{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, text string")
    m1 = B.bpe_train(df, num_merges=20)
    m2 = B.bpe_train(df.repartition(13), num_merges=20)
    assert m1 == m2


def test_bpe_segment_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "low low low low low"), (2, "lower lower")], "id long, text string"
    )
    merges = B.bpe_train(df, num_merges=10, min_count=1)
    out = {r.id: r.bpe_tokens for r in B.bpe_segment(df, merges).collect()}
    # with enough merges the frequent word collapses to one token
    assert out[1] == ["low</w>"] * 5
    # segmentation is lossless: concatenated tokens reproduce the words
    joined = "".join(out[2]).replace("</w>", " ").strip()
    assert joined == "lower lower"


def test_bpe_min_count_prunes_rare_words(spark):
    df = spark.createDataFrame(
        [(1, "common common common rare")], "id long, text string"
    )
    merges = B.bpe_train(df, num_merges=30, min_count=2)
    flat = {a for a, b in merges} | {b for a, b in merges} | {a + b for a, b in merges}
    assert not any("r" == s or "rare" in s for s in flat)  # 'rare' never trained on


def test_bpe_vocab_collect_is_bounded_adversarially(spark):
    """High-cardinality vocab (one unique token per row) must NOT reach the
    driver: max_vocab caps the collected word table distributively, keeping
    the most frequent words under a deterministic tie-break."""
    rows = [(i, f"common{i % 3} uniq{i}") for i in range(20_000)]
    df = spark.createDataFrame(rows, "id long, text string")
    wf = B.word_frequencies(df, min_count=1, max_vocab=50)
    assert wf.count() == 50  # 20_003 distinct words in the corpus
    kept = {r.w for r in wf.collect()}
    assert {"common0", "common1", "common2"} <= kept  # top-by-count survive
    # training under the cap learns ONLY from the kept words
    merges = B.bpe_train(df, num_merges=5, min_count=1, max_vocab=3)
    flat = {a for a, b in merges} | {b for a, b in merges}
    assert flat and not any("q" in s for s in flat)  # no 'uniq*' leakage
