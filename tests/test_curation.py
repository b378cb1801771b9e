"""Ground-truth tests for curation operators (split/mix/redact/pack)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.operators import curation as C


def test_deterministic_split_is_stable_and_partition_invariant(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id: r.split for r in C.deterministic_split(df, "doc_id").collect()}
    s2 = {
        r.doc_id: r.split
        for r in C.deterministic_split(df.repartition(7), "doc_id").collect()
    }
    assert s1 == s2  # repartitioning must not move rows between splits
    frac = {k: sum(1 for v in s1.values() if v == k) / len(s1) for k in ("train", "val", "test")}
    assert abs(frac["train"] - 0.8) < 0.05
    assert abs(frac["val"] - 0.1) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03


def test_weighted_source_sample_fractions(spark):
    rows = [(i, "keep_all" if i % 2 else "keep_none") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = C.weighted_source_sample(df, {"keep_all": 1.0, "keep_none": 0.0})
    srcs = {r.source for r in out.collect()}
    assert srcs == {"keep_all"}
    assert out.count() == 1000


def test_stratified_sample_exact_counts_and_stability(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = C.stratified_sample(df, group_col="lang", n_per_group=10)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 10, "b": 10}
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(
        r.doc_id
        for r in C.stratified_sample(df.repartition(13), group_col="lang", n_per_group=10).collect()
    )
    assert ids1 == ids2  # same sample regardless of partitioning
    # small group: returns the whole group, not an error
    tiny = C.stratified_sample(df.filter("doc_id < 4"), group_col="lang", n_per_group=10)
    assert tiny.count() == 4


def test_stratified_sample_prefilter_matches_exact(spark):
    """The broadcast-count prefilter (scale path) must select the identical
    sample as the exact full-window path."""
    rows = [(i, f"g{i % 4}") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    exact = sorted(
        r.doc_id
        for r in C.stratified_sample(
            df, group_col="lang", n_per_group=25, prefilter_oversample=None
        ).collect()
    )
    fast = sorted(
        r.doc_id
        for r in C.stratified_sample(
            df, group_col="lang", n_per_group=25, prefilter_oversample=8.0
        ).collect()
    )
    assert exact == fast


def test_stratified_sample_null_group_paths_agree(spark):
    """NULL group values must survive BOTH paths identically: the prefilter's
    count join is null-safe, so NULL forms its own group exactly like the
    exact window path treats it."""
    rows = [(i, None if i % 5 == 0 else f"g{i % 3}") for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    exact = sorted(
        (r.doc_id, r.lang)
        for r in C.stratified_sample(
            df, group_col="lang", n_per_group=15, prefilter_oversample=None
        ).collect()
    )
    fast = sorted(
        (r.doc_id, r.lang)
        for r in C.stratified_sample(
            df, group_col="lang", n_per_group=15, prefilter_oversample=8.0
        ).collect()
    )
    assert exact == fast
    assert sum(1 for _, lang in exact if lang is None) == 15  # NULL is a group


def test_pack_sequences_sharded_parallelism(spark):
    """shards=k keeps the packing lossless with globally unique seq ids; no
    sequence exceeds budget unless it is a single oversized doc."""
    rows = [(i, "g", 3 + (i % 5)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = C.pack_sequences(df, budget=20, group_col="lang", shards=4).collect()
    assert sorted(r.doc_id for r in out) == list(range(200))  # lossless
    fills: dict = {}
    for r in out:
        fills.setdefault(r.seq_id, []).append(r.n_tokens)
    for seq, toks in fills.items():
        assert sum(toks) <= 20 or len(toks) == 1


def test_pii_redact_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or 555-123-4567 today"),
            (2, "server at 10.0.0.1 leaked ssn 123-45-6789"),
            (3, "nothing sensitive here at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in C.pii_redact(df, "text").collect()}
    assert out[1].n_email == 1 and "<EMAIL>" in out[1].redacted
    assert "bob@example.com" not in out[1].redacted
    assert "<PHONE>" in out[1].redacted
    assert out[2].n_ssn == 1 and "<SSN>" in out[2].redacted
    assert out[2].n_ip == 1 and "<IP>" in out[2].redacted
    assert out[3].redacted == "nothing sensitive here at all"


def test_pack_sequences_next_fit_ground_truth(spark):
    # budget 10; docs (id, tokens): 4,5,3,10,2 → seqs [1:4+5, 2:3, 3:10, 3?]
    # next-fit walk: 4 (fill 4) ; +5=9 ok ; +3=12 >10 → seq2 fill 3 ;
    # +10=13 >10 → seq3 fill 10 ; +2=12 >10 → seq4 fill 2
    rows = [(1, "g", 4), (2, "g", 5), (3, "g", 3), (4, "g", 10), (5, "g", 2)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = {
        r.doc_id: r.seq_id
        for r in C.pack_sequences(df, budget=10, group_col="lang").collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 3, 5: 4}


def test_pack_sequences_oversized_doc_gets_own_sequence(spark):
    rows = [(1, "g", 3), (2, "g", 99), (3, "g", 3)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = {
        r.doc_id: r.seq_id
        for r in C.pack_sequences(df, budget=10, group_col="lang").collect()
    }
    assert out == {1: 1, 2: 2, 3: 3}  # lossless: oversize isolated, not dropped


def test_temperature_mixing_upweights_rare_sources(spark):
    from fs2_kinesis_firehose_spark.operators.curation import temperature_mixing

    rows = [(i, "rare") for i in range(20)] + [(i, "common") for i in range(20, 420)]
    df = spark.createDataFrame(rows, "doc_id int, source string")
    kept = temperature_mixing(df, alpha=0.5, total_fraction=0.5)
    frac = {
        r["source"]: r["n"] / {"rare": 20, "common": 400}[r["source"]]
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # alpha=0.5: f_rare/f_common = sqrt(400/20) ~ 4.5x; md5 keep rule is
    # uniform so realized fractions track the targets loosely
    assert frac["rare"] > frac["common"]
    # single-pass formula never exceeds the per-source population
    assert frac["rare"] <= 1.0


def test_temperature_mixing_alpha_one_is_proportional(spark):
    from fs2_kinesis_firehose_spark.operators.curation import temperature_mixing

    rows = [(i, "a") for i in range(100)] + [(i, "b") for i in range(100, 400)]
    df = spark.createDataFrame(rows, "doc_id int, source string")
    kept = temperature_mixing(df, alpha=1.0, total_fraction=0.4)
    got = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # alpha=1 -> every source keeps the same fraction (0.4); binomial noise
    assert abs(got["a"] / 100 - 0.4) < 0.15
    assert abs(got["b"] / 300 - 0.4) < 0.15


def test_temperature_mixing_deterministic(spark):
    from fs2_kinesis_firehose_spark.operators.curation import temperature_mixing

    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id int, source string")
    a = sorted(r["doc_id"] for r in temperature_mixing(df, alpha=0.7, total_fraction=0.3).collect())
    b = sorted(r["doc_id"] for r in temperature_mixing(df.repartition(7), alpha=0.7, total_fraction=0.3).collect())
    assert a == b


def test_temperature_mixing_null_source_bucket(spark):
    """NULL sources are a real bucket (null-safe fraction join), not rows
    silently dropped by an inner equi-join on a NULL key."""
    from fs2_kinesis_firehose_spark.operators.curation import temperature_mixing

    rows = [(i, "labeled") for i in range(200)] + [(i, None) for i in range(200, 400)]
    df = spark.createDataFrame(rows, "doc_id int, source string")
    kept = temperature_mixing(df, alpha=1.0, total_fraction=0.5)
    got = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # alpha=1 -> both buckets keep ~0.5; the NULL bucket must be present
    assert None in got and got[None] > 0
    assert abs(got[None] / 200 - 0.5) < 0.15
    assert abs(got["labeled"] / 200 - 0.5) < 0.15


def test_normalize_text_canonicalizes_case_punct_spacing(spark):
    from fs2_kinesis_firehose_spark.operators.curation import normalize_text

    df = spark.createDataFrame(
        [(0, "Hello,  World!"), (1, "hello world"), (2, "HELLO---WORLD")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["norm_text"] for r in normalize_text(df).collect()}
    assert got == {0: "hello world", 1: "hello world", 2: "helloworld"}


# --- leakage_safe_split ----------------------------------------------------


def test_leakage_safe_split_groups_never_straddle(spark):
    import pyspark.sql.functions as F

    from fs2_kinesis_firehose_spark.operators import curation as C

    # 60 groups of 3 duplicate rows each
    rows = [(g * 10 + i, f"text-{g}") for g in range(60) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    s = C.leakage_safe_split(df.withColumn("g", F.sha2("text", 256)), "g")
    per_group = s.groupBy("g").agg(F.countDistinct("split").alias("ns")).collect()
    assert all(r["ns"] == 1 for r in per_group)
    # all three splits occupied across 60 groups (sanity, not a tautology)
    assert s.select("split").distinct().count() == 3


def test_leakage_safe_split_matches_rep_assignment(spark):
    import pyspark.sql.functions as F

    from fs2_kinesis_firehose_spark.operators import curation as C

    rows = [(g * 10 + i, f"text-{g}") for g in range(40) for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = C.leakage_safe_split(df.withColumn("g", F.sha2("text", 256)), "g")
    # the representative (min doc_id = g*10) decides: recompute via the
    # row-level split of a reps-only frame and compare per group
    reps = df.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    want = {
        r["text"]: r["split"]
        for r in C.deterministic_split(reps, "doc_id").collect()
    }
    got = {r["text"]: r["split"] for r in s.select("text", "split").distinct().collect()}
    assert got == want


# --- weighted_sample (A-ES) ------------------------------------------------


def test_weighted_sample_matches_numpy_mirror(spark):
    import hashlib

    import pyspark.sql.functions as F  # noqa: F401

    from fs2_kinesis_firehose_spark.operators import curation as C

    rows = [(i, float(1 + (i % 7))) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double").repartition(9)
    got = [(r["doc_id"], r["sample_key"]) for r in
           C.weighted_sample(df, "w", 50, key_col="doc_id").collect()]

    import math
    def key(i, w):
        h = hashlib.md5(f"{i}wsample".encode()).hexdigest()[:8]
        u = (int(h, 16) + 0.5) / 2**32
        return round(math.log(u) / w, 9)

    want = sorted(((i, key(i, w)) for i, w in rows),
                  key=lambda t: (-t[1], t[0]))[:50]
    assert got == want


def test_weighted_sample_prefers_heavy_rows(spark):
    from fs2_kinesis_firehose_spark.operators import curation as C

    # weight 50 vs 1: the heavy half should dominate a 100-of-2000 sample
    rows = [(i, 50.0 if i < 1000 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    ids = [r["doc_id"] for r in C.weighted_sample(df, "w", 100).collect()]
    assert sum(1 for i in ids if i < 1000) > 85


def test_weighted_sample_excludes_nonpositive_and_validates(spark):
    import pytest as _pytest

    from fs2_kinesis_firehose_spark.operators import curation as C

    df = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, None), (4, 2.0)], "doc_id long, w double"
    )
    assert [r["doc_id"] for r in C.weighted_sample(df, "w", 10).collect()] == [4]
    with _pytest.raises(ValueError):
        C.weighted_sample(df, "w", 0)


# --- quantile_bucket -------------------------------------------------------


def test_quantile_bucket_terciles_and_nulls(spark):
    from fs2_kinesis_firehose_spark.operators import curation as C

    rows = [(i, float(i)) for i in range(1, 10)] + [(99, None)]
    df = spark.createDataFrame(rows, "id long, x double")
    got = {r["id"]: r["bucket"] for r in C.quantile_bucket(df, "x").collect()}
    # exact terciles of 1..9: q1/3 = 3.666667, q2/3 = 6.333333
    assert got == {1: "head", 2: "head", 3: "head",
                   4: "middle", 5: "middle", 6: "middle",
                   7: "tail", 8: "tail", 9: "tail", 99: None}


def test_quantile_bucket_validation(spark):
    import pytest as _pytest

    from fs2_kinesis_firehose_spark.operators import curation as C

    df = spark.createDataFrame([(1, 1.0)], "id long, x double")
    with _pytest.raises(ValueError):
        C.quantile_bucket(df, "x", (0.5,), ("a",))
    with _pytest.raises(ValueError):
        C.quantile_bucket(df, "x", (0.7, 0.3), ("a", "b", "c"))


def test_leakage_safe_split_null_groups_split_independently(spark):
    import pyspark.sql.functions as F

    from fs2_kinesis_firehose_spark.operators import curation as C

    # 300 rows with NULL group: each must be split by its OWN key (matching
    # the row-level deterministic_split), not collapsed into one mega-group
    df = spark.createDataFrame(
        [(i, None) for i in range(300)], "doc_id long, g string"
    ).repartition(5)
    got = {r["doc_id"]: r["split"] for r in C.leakage_safe_split(df, "g").collect()}
    want = {r["doc_id"]: r["split"]
            for r in C.deterministic_split(df, "doc_id").collect()}
    assert got == want
    assert len(set(got.values())) == 3  # not one split for everyone


# --- token_budget_sample ------------------------------------------------------


def test_token_budget_sample_inclusive_cut_and_determinism(spark):
    """The kept set is the md5-ordered prefix whose INCLUSIVE token cumsum
    fits the budget, per group; the cut is deterministic under re-run and
    input order."""
    from fs2_kinesis_firehose_spark.operators.curation import (
        hash_fraction,
        token_budget_sample,
    )
    from pyspark.sql import functions as F

    rows = [(g, i, 10) for g in ("a", "b") for i in range(20)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens int")
    kept = token_budget_sample(
        df, budget=55, group_col="source", tokens_col="n_tokens", key_col="doc_id"
    )
    got = {(r.source, r.doc_id) for r in kept.collect()}
    # 10-token docs, budget 55 -> exactly 5 kept per group (inclusive rule)
    assert sum(1 for s, _ in got if s == "a") == 5
    assert sum(1 for s, _ in got if s == "b") == 5
    # kept = the 5 smallest md5 fractions per group (python replay)
    ordered = (
        df.select("source", "doc_id", hash_fraction("doc_id", "budget").alias("h"))
        .orderBy("source", F.col("h"), "doc_id")
        .collect()
    )
    expect = set()
    for s in ("a", "b"):
        grp = sorted(
            (x for x in ordered if x.source == s), key=lambda x: (x.h, x.doc_id)
        )
        expect |= {(r.source, r.doc_id) for r in grp[:5]}
    assert got == expect
    # order-of-input invariance
    kept2 = token_budget_sample(
        spark.createDataFrame(list(reversed(rows)), "source string, doc_id long, n_tokens int"),
        budget=55, group_col="source", tokens_col="n_tokens", key_col="doc_id",
    )
    assert {(r.source, r.doc_id) for r in kept2.collect()} == got


def test_token_budget_sample_oversize_doc_dropped_not_truncated(spark):
    from fs2_kinesis_firehose_spark.operators.curation import token_budget_sample

    df = spark.createDataFrame(
        [("a", 1, 100)], "source string, doc_id long, n_tokens int"
    )
    assert token_budget_sample(df, budget=50).count() == 0


def test_token_budget_sample_validates_budget(spark):
    import pytest as _pt

    from fs2_kinesis_firehose_spark.operators.curation import token_budget_sample

    df = spark.createDataFrame([("a", 1, 1)], "source string, doc_id long, n_tokens int")
    with _pt.raises(ValueError):
        token_budget_sample(df, budget=0)


def test_group_cap_sample_caps_and_is_deterministic(spark):
    from pyspark.sql import Row

    from fs2_kinesis_firehose_spark.operators.curation import group_cap_sample

    rows = [Row(g="a", k=i) for i in range(10)] + [Row(g="b", k=100)]
    df = spark.createDataFrame(rows)
    kept = group_cap_sample(df, "g", "k", cap=3)
    out = kept.groupBy("g").count().collect()
    assert {r.g: r["count"] for r in out} == {"a": 3, "b": 1}
    # deterministic: same kept set on re-run
    k1 = sorted(r.k for r in kept.collect())
    k2 = sorted(r.k for r in group_cap_sample(df, "g", "k", cap=3).collect())
    assert k1 == k2
    # different salt → (almost surely) different kept set for the capped group
    k3 = sorted(r.k for r in group_cap_sample(df, "g", "k", cap=3, salt="other").collect())
    assert k1 != k3


def test_group_cap_sample_flag_mode_and_validation(spark):
    import pytest
    from pyspark.sql import Row

    from fs2_kinesis_firehose_spark.operators.curation import group_cap_sample

    df = spark.createDataFrame([Row(g="a", k=1), Row(g="a", k=2)])
    flagged = group_cap_sample(df, "g", "k", cap=1, keep_col="keep")
    assert flagged.count() == 2 and flagged.filter("keep").count() == 1
    with pytest.raises(ValueError, match="cap"):
        group_cap_sample(df, "g", "k", cap=0)


def test_group_cap_sample_null_key_encoding_is_collision_proof(spark):
    """The kept set under a BINDING cap must equal the hand-computed
    md5-of-TAGGED-encoding order ('1'||key for non-null, '0' for NULL) —
    a regression to the r12 sentinel coalesce (where a real key equal to
    the sentinel collides with NULL and their order becomes a coin flip)
    hashes different inputs and picks a different kept set."""
    import hashlib

    from fs2_kinesis_firehose_spark.operators.curation import group_cap_sample

    keys = ["\x00null", None, "0", "1x", "zq", "mm"]
    df = spark.createDataFrame([("a", k) for k in keys], "g string, k string")

    def enc(k):
        return "0" if k is None else "1" + k

    order = sorted(keys, key=lambda k: (hashlib.md5((enc(k) + "cap").encode()).hexdigest(), enc(k)))
    want = {k for k in order[:3]}
    kept = {r.k for r in group_cap_sample(df, "g", "k", cap=3).collect()}
    assert kept == want


def test_group_cap_sample_null_keys_sort_deterministically(spark):
    """NULL keys hash via a sentinel instead of md5(NULL)=NULL, so the
    seeded order has no engine-dependent NULLS FIRST/LAST placement
    (r12 advisory fix) and NULL-keyed rows still count against the cap."""
    from fs2_kinesis_firehose_spark.operators.curation import group_cap_sample

    schema = "g string, k long"
    rows = [("a", i) for i in range(5)] + [("a", None), ("a", None)]
    df = spark.createDataFrame(rows, schema)
    kept = group_cap_sample(df, "g", "k", cap=4)
    assert kept.count() == 4
    k1 = sorted((r.k is None, r.k) for r in kept.collect())
    k2 = sorted(
        (r.k is None, r.k) for r in group_cap_sample(df, "g", "k", cap=4).collect()
    )
    assert k1 == k2  # deterministic with NULLs present
