"""DSIR importance weighting (operators/dsir.py).

Sign/ordering semantics on a corpus with two disjoint vocabularies; the
corpus-scale pipeline is oracle-checked via dsir_importance_weights.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.operators.dsir import feature_rows, importance_weights


def _corpus(spark):
    a = [(i, "apple banana cherry date elderberry fig grape " * 3) for i in range(5)]
    b = [(i, "xylo yonder zephyr quark nimbus vortex umbra " * 3) for i in range(5, 10)]
    return spark.createDataFrame(a + b, "doc_id int, text string")


def test_target_lookalikes_score_positive(spark):
    df = _corpus(spark)
    target = df.filter(F.col("doc_id") < 5)
    out = {r["doc_id"]: r for r in importance_weights(df, target, n_buckets=1000).collect()}
    # every vocab-A doc outweighs every vocab-B doc, and the flag agrees
    a_w = [out[i]["log_weight"] for i in range(5)]
    b_w = [out[i]["log_weight"] for i in range(5, 10)]
    assert min(a_w) > max(b_w)
    assert all(out[i]["keep"] for i in range(5))
    assert not any(out[i]["keep"] for i in range(5, 10))


def test_identical_distributions_weight_near_zero(spark):
    df = _corpus(spark)
    out = importance_weights(df, df, n_buckets=1000).collect()
    # target == raw: per-bucket ratios cancel except the smoothing totals;
    # weights are equal across docs with equal feature counts
    weights = {r["log_weight"] for r in out}
    assert len(weights) == 1


def test_feature_rows_counts_occurrences(spark):
    df = spark.createDataFrame([(0, "a b a")], "doc_id int, text string")
    rows = feature_rows(df, n_buckets=100).collect()
    # 3 unigrams ("a","b","a") + 2 bigrams ("a b","b a") = 5 occurrence rows
    assert len(rows) == 5


def test_empty_doc_contributes_no_features(spark):
    df = spark.createDataFrame([(0, ""), (1, "   "), (2, "a b")], "doc_id int, text string")
    got = {r["doc_id"] for r in feature_rows(df, n_buckets=100).collect()}
    assert got == {2}
    out = {r["doc_id"]: r for r in importance_weights(df, df, n_buckets=100).collect()}
    assert out[0]["n_features"] == 0 and out[0]["log_weight"] == 0.0
