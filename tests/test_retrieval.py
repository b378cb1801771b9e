"""BM25 retrieval: hand-computed ground truth, postings-path equivalence,
top-k determinism, and plan shape (TakeOrderedAndProject, no cartesian)."""

from __future__ import annotations

import math

import pytest

from fs2_kinesis_firehose_spark.operators import retrieval


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (1, "cat dog cat"),
        (2, "dog fish"),
        (3, "cat cat cat bird bird"),
        (4, "whale plankton"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _bm25_ref(corpus: dict[int, list[str]], terms: list[str], k1=1.2, b=0.75):
    """Independent plain-Python BM25 (Lucene idf variant)."""
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    df = {t: sum(1 for toks in corpus.values() if t in toks) for t in terms}
    out = {}
    for doc, toks in corpus.items():
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(toks) / avgdl))
        if s > 0:
            out[doc] = round(s, 4)
    return out


def test_bm25_matches_hand_reference(tiny_docs):
    corpus = {1: "cat dog cat".split(), 2: "dog fish".split(),
              3: "cat cat cat bird bird".split(), 4: "whale plankton".split()}
    expected = _bm25_ref(corpus, ["cat", "fish"])
    got = {r["doc_id"]: r["bm25"] for r in retrieval.bm25_scores(tiny_docs, ["cat", "fish"]).collect()}
    assert got == expected


def test_bm25_only_matching_docs_returned(tiny_docs):
    got = retrieval.bm25_scores(tiny_docs, ["whale"]).collect()
    assert [r["doc_id"] for r in got] == [4]


def test_bm25_rejects_empty_query(tiny_docs):
    with pytest.raises(ValueError):
        retrieval.bm25_scores(tiny_docs, [])


def test_postings_path_equivalent_to_scan_path(tiny_docs):
    posts = retrieval.posting_lists(tiny_docs)
    base = tiny_docs.collect()
    n_docs = len(base)
    avgdl = sum(len(r["text"].split()) for r in base) / n_docs
    via_posts = {
        r["doc_id"]: r["bm25"]
        for r in retrieval.bm25_scores_from_postings(
            posts, ["cat", "dog"], n_docs, avgdl
        ).collect()
    }
    via_scan = {
        r["doc_id"]: r["bm25"]
        for r in retrieval.bm25_scores(tiny_docs, ["cat", "dog"]).collect()
    }
    assert via_posts == via_scan


def test_topk_deterministic_tiebreak(spark):
    # Two docs with identical token profiles → identical scores; the lower
    # doc_id must win the tie on every run.
    rows = [(i, "tie tie word") for i in range(10, 0, -1)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    top3 = retrieval.bm25_topk(docs, ["tie"], k=3).collect()
    assert [r["doc_id"] for r in top3] == [1, 2, 3]


def test_topk_plan_is_take_ordered_no_cartesian(tiny_docs):
    plan = retrieval.bm25_topk(tiny_docs, ["cat"], k=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


# --- rrf_fuse ---------------------------------------------------------------


def test_rrf_hand_computed(spark):
    from fs2_kinesis_firehose_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, bm25 double"
    )
    dense = spark.createDataFrame(
        [(2, 0.9), (4, 0.8), (1, 0.7)], "doc_id long, cos_sim double"
    )
    got = {r["doc_id"]: r["rrf_score"] for r in
           rrf_fuse([lex, dense], rrf_k=60).collect()}
    want = {
        1: round(1 / 61 + 1 / 63, 6),   # rank 1 lex, rank 3 dense
        2: round(1 / 62 + 1 / 61, 6),   # rank 2 lex, rank 1 dense
        3: round(1 / 63, 6),            # lex only
        4: round(1 / 62, 6),            # dense only
    }
    assert got == want


def test_rrf_tiebreak_by_key_and_topn(spark):
    from fs2_kinesis_firehose_spark.operators.retrieval import rrf_fuse

    # equal scores → rank by key ASC; top_n truncates deterministically
    a = spark.createDataFrame([(5, 1.0), (3, 1.0)], "doc_id long, s double")
    b = spark.createDataFrame([(3, 2.0), (5, 2.0)], "doc_id long, s double")
    rows = rrf_fuse([a, b], rrf_k=0, top_n=1).collect()
    # doc 3 outranks doc 5 in both lists (key tie-break) → 1/1 + 1/1 = 2
    assert [(r["doc_id"], r["rrf_score"]) for r in rows] == [(3, 2.0)]


def test_rrf_validation(spark):
    from fs2_kinesis_firehose_spark.operators.retrieval import rrf_fuse

    one = spark.createDataFrame([(1, 1.0)], "doc_id long, s double")
    with pytest.raises(ValueError):
        rrf_fuse([one])
    bad = spark.createDataFrame([(1, 1.0, 2.0)], "doc_id long, s double, t double")
    with pytest.raises(ValueError):
        rrf_fuse([one, bad])


def test_rrf_rejects_duplicate_keys(spark):
    from fs2_kinesis_firehose_spark.operators.retrieval import rrf_fuse

    ok = spark.createDataFrame([(1, 1.0), (2, 2.0)], "doc_id long, s double")
    dup = spark.createDataFrame([(1, 1.0), (1, 2.0)], "doc_id long, s double")
    # the guard is in-plan: the error surfaces when the fused plan RUNS
    fused = rrf_fuse([ok, dup])
    with pytest.raises(Exception, match="duplicate key"):
        fused.collect()


def test_rrf_construction_is_lazy(spark):
    # plan construction must trigger ZERO Spark jobs: feed rankings whose
    # evaluation raises — an eager guard (the old per-ranking .first())
    # would blow up here, a lazy plan only at collect()
    from pyspark.sql import functions as F

    from fs2_kinesis_firehose_spark.operators.retrieval import rrf_fuse

    def poison(name):
        return spark.range(2).select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") >= 0, F.raise_error(F.lit(f"{name} evaluated"))
            )
            .otherwise(F.lit(0.0))
            .cast("double")
            .alias("s"),
        )

    fused = rrf_fuse([poison("a"), poison("b")])  # must not raise
    with pytest.raises(Exception, match="evaluated"):
        fused.collect()
