"""Ground-truth tests for the bigram LM (operators/lm.py) and span dedup
(operators/dedup.py:span_dedup) — hand-computed probabilities on tiny
corpora, vocab-cap/UNK behavior, and span reconstruction properties.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.operators import dedup as D
from fs2_kinesis_firehose_spark.operators import lm as LM


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------
def test_cross_entropy_hand_computed(spark):
    # corpus: "a b a b" → bigrams (a,b)(b,a)(a,b); vocab {a,b} V=2
    # c(a,b)=2 c(b,a)=1; context c(a·)=2 c(b·)=1
    # logp(a,b)=ln(3)-ln(4); logp(b,a)=ln(2)-ln(3)
    docs = _docs(spark, [(1, "a b a b")])
    model = LM.train_bigram_lm(docs)
    row = LM.score_cross_entropy(docs, model).collect()[0]
    expect = -(2 * (math.log(3) - math.log(4)) + (math.log(2) - math.log(3))) / 3
    assert row["n_bigrams"] == 3
    assert row["oov_bigrams"] == 0
    assert row["cross_entropy"] == pytest.approx(expect, abs=1e-4)


def test_short_docs_surface_with_null_entropy(spark):
    docs = _docs(spark, [(1, "solo"), (2, "a b")])
    model = LM.train_bigram_lm(docs)
    rows = {r["doc_id"]: r for r in LM.score_cross_entropy(docs, model).collect()}
    assert rows[1]["n_bigrams"] == 0 and rows[1]["cross_entropy"] is None
    assert rows[2]["n_bigrams"] == 1 and rows[2]["cross_entropy"] is not None


def test_vocab_cap_maps_rare_tokens_to_unk(spark):
    # "x" appears once; vocab_size=2 keeps the two frequent tokens a, b
    docs = _docs(spark, [(1, "a b a b a x")])
    model = LM.train_bigram_lm(docs, vocab_size=2)
    bi = {(r["w1"], r["w2"]): r["c12"] for r in model.bigrams.collect()}
    assert (LM.UNK not in {w for p in bi for w in p}) is False  # unk present
    assert bi[("a", LM.UNK)] == 1
    assert model.vocab.collect()[0]["v"] == 3  # a, b, <unk>


def test_unseen_bigram_scores_at_add_one_floor(spark):
    train = _docs(spark, [(1, "a b a b")])
    model = LM.train_bigram_lm(train)
    # "b b" never seen: logp = ln(0+1) - ln(c(b·)+V) = -ln(1+2)
    score = LM.score_cross_entropy(_docs(spark, [(9, "b b")]), model).collect()[0]
    assert score["oov_bigrams"] == 1
    assert score["cross_entropy"] == pytest.approx(math.log(3), abs=1e-4)


def test_min_count_prunes_bigram_table_only(spark):
    docs = _docs(spark, [(1, "a b a b a c")])
    pruned = LM.train_bigram_lm(docs, min_count=2)
    # bigrams: (a,b)x2 (b,a)x2 (a,c)x1 → min_count=2 drops only (a,c)
    assert {(r["w1"], r["w2"]) for r in pruned.bigrams.collect()} == {("a", "b"), ("b", "a")}
    # context counts stay unpruned → normalization intact
    uni = {r["w1"]: r["c1"] for r in pruned.unigrams.collect()}
    assert uni == {"a": 3, "b": 2}


def test_perplexity_filter_keeps_fluent_docs(spark):
    docs = _docs(spark, [(1, "a b a b a b"), (2, "q z q q z p")])
    model = LM.train_bigram_lm(_docs(spark, [(0, "a b a b a b a b")]))
    kept = LM.perplexity_filter(docs, model, max_cross_entropy=1.5)
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_score_plan_broadcasts_lm_tables(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "b c d")])
    model = LM.train_bigram_lm(docs)
    plan = LM.score_cross_entropy(docs, model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# span dedup
# ---------------------------------------------------------------------------
def test_span_dedup_drops_repeated_span_keeps_first(spark):
    # doc 1 and doc 2 share an identical 3-token span; doc 1 wins (lower key)
    docs = _docs(spark, [(1, "x y z p q r"), (2, "x y z h i j")])
    out = {r["doc_id"]: r for r in D.span_dedup(docs, span_tokens=3).collect()}
    assert out[1]["n_spans"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["text_kept"] == "x y z p q r"
    assert out[2]["n_spans"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["text_kept"] == "h i j"


def test_span_dedup_intra_doc_repeat(spark):
    docs = _docs(spark, [(1, "a b a b")])
    out = D.span_dedup(docs, span_tokens=2).collect()[0]
    assert out["n_spans"] == 2 and out["n_kept"] == 1
    assert out["text_kept"] == "a b"


def test_span_dedup_fully_deduped_doc_surfaces_empty(spark):
    docs = _docs(spark, [(1, "a b"), (2, "a b")])
    out = {r["doc_id"]: r for r in D.span_dedup(docs, span_tokens=2).collect()}
    assert out[2]["n_kept"] == 0 and out[2]["text_kept"] == ""


def test_span_dedup_partial_tail_span_and_order(spark):
    # 5 tokens at span 2 → spans "a b", "c d", "e"; reassembly preserves order
    docs = _docs(spark, [(1, "a b c d e")])
    out = D.span_dedup(docs, span_tokens=2).collect()[0]
    assert out["n_spans"] == 3 and out["n_kept"] == 3
    assert out["text_kept"] == "a b c d e"


def test_span_dedup_total_tokens_conserved(spark, sf_oracle):
    from fs2_kinesis_firehose_spark.tables import load_table

    docs = load_table(spark, sf_oracle, "documents")
    out = D.span_dedup(docs, span_tokens=10)
    agg = out.agg(
        F.sum("n_spans").alias("total"), F.sum("n_kept").alias("kept")
    ).collect()[0]
    # kept spans = distinct spans corpus-wide (first-occurrence semantics)
    distinct_spans = (
        docs.select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(F.size(F.split(F.trim("text"), r"\s+")) / 10).cast("int") - 1,
                    ),
                    lambda i: F.array_join(
                        F.slice(F.split(F.trim("text"), r"\s+"), i * 10 + 1, 10), " "
                    ),
                )
            ).alias("s")
        )
        .distinct()
        .count()
    )
    assert agg["kept"] == distinct_spans
    assert agg["total"] >= agg["kept"]
