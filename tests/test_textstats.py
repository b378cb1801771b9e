"""Text-analysis operator tests (semantics; oracle parity is covered by
tests/test_oracle_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.operators import textstats as TS


def test_lang_id_markers(spark):
    rows = [
        (1, "the cat and the dog in a house"),
        (2, "der hund und die katze ist nicht hier"),
        (3, "le chat est dans la maison pour dormir"),
        (4, "el perro y el gato es una mascota"),
        (5, "xyzzy qwerty asdf"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.lang for r in df.select("doc_id", TS.lang_id("text").alias("lang")).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello world, it's 42 degrees!")], "id long, text string")
    row = df.select(
        TS.token_count("text").alias("ws"),
        TS.bpe_ish_token_count("text").alias("bpe"),
    ).first()
    assert row.ws == 5
    # hello | world | , | it | ' | s | 4 | 2 | degrees | !
    assert row.bpe == 10


def test_quality_features_bounds(spark):
    rows = [(1, "the of and to in a is it that for varied words here"),
            (2, "aaa aaa aaa aaa aaa")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in TS.quality_features(df).collect()}
    for r in out.values():
        assert 0.0 <= r.quality_score <= 1.0
        assert 0.0 <= r.lexical_diversity <= 1.0
    # diverse stopword-rich text scores higher than degenerate repetition
    assert out[1].quality_score > out[2].quality_score
    assert out[2].lexical_diversity == 0.2


def test_fingerprint_normalizes_whitespace_and_case(spark):
    rows = [(1, "Hello   World"), (2, "hello world"), (3, "  HELLO\tWORLD  "), (4, "other")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r.doc_id: r.fp for r in df.select("doc_id", TS.fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2] == fps[3]
    assert fps[4] != fps[1]


def test_gopher_quality_flags_degenerate_docs(spark):
    from fs2_kinesis_firehose_spark.operators.textstats import gopher_quality

    good = " ".join(f"word{i:03d}" for i in range(60))  # 60 distinct tokens
    spammy = "buy now " * 40  # 80 tokens, 2 distinct, one dominant bigram
    symbols = "@@ ## $$ %% ^^ && ** (( )) __ " * 8
    df = spark.createDataFrame(
        [(1, good.strip()), (2, spammy.strip()), (3, symbols.strip())],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_quality(df).collect()}
    assert out[1].keep
    assert not out[2].keep  # repetition: dup_word_fraction ~0.975
    assert out[2].dup_word_fraction > 0.9
    assert out[2].top_bigram_fraction > 0.4
    assert not out[3].keep  # no alphabetic words
    assert out[3].alpha_word_fraction == 0.0


def test_gopher_quality_single_token_doc_has_zero_bigram_fraction(spark):
    """A 1-token doc has NO bigrams: the fraction must coalesce to 0.0 (the
    degenerate 1-gram would otherwise score 1.0 and diverge from the SQL
    oracle's empty comprehension)."""
    from fs2_kinesis_firehose_spark.operators.textstats import gopher_quality

    df = spark.createDataFrame([(1, "loneword"), (2, "two words")], "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_quality(df).collect()}
    assert out[1].top_bigram_fraction == 0.0
    assert out[2].top_bigram_fraction == 1.0  # one bigram, trivially dominant


def test_tfidf_keywords_hand_computed(spark):
    import math

    from fs2_kinesis_firehose_spark.operators.textstats import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "cherry cherry cherry common"),
        ],
        "doc_id long, text string",
    )
    out = [(r["doc_id"], r["term"], r["rank"], r["tfidf"])
           for r in tfidf_keywords(docs, top_k=2).collect()]

    def idf(df_):  # N = 3
        return math.log((1.0 + 3) / (1.0 + df_))

    want = [
        (1, "apple", 1, round(2 * idf(1), 6)),   # tf=2, df=1
        (1, "banana", 2, round(1 * idf(2), 6)),
        (2, "banana", 1, round(1 * idf(2), 6)),  # banana beats cherry by term ASC
        (2, "cherry", 2, round(1 * idf(2), 6)),
        (3, "cherry", 1, round(3 * idf(2), 6)),
        (3, "common", 2, round(1 * idf(3), 6)),
    ]
    assert sorted(out) == sorted(want)
