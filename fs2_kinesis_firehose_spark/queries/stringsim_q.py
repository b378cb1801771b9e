"""String-similarity and corpus-mining queries (late round 7).

``editdist_neardup_counts`` exercises the PassJoin segment-pigeonhole
edit-distance self-join on the one fixture column where typo-level
near-duplicates genuinely exist at every SF: ``customer.c_name``
(zero-padded serial names — ed≤1 pairs are ids differing by one digit
substitution or a shift).  The oracle replays the QUADRATIC definition,
so the segment filter's losslessness claim is driver-checked bit-for-bit.

``pmi_collocations_topk`` is collocation extraction (pointwise mutual
information over corpus bigrams, Church & Hanks 1990) — the corpus-mining
companion to tfidf_doc_keywords/heavy_hitter_bigrams.  All output columns
are exact int64 counts; ORDER is by the PMI ratio computed with one fixed
IEEE expression shape on both engines so the top-k cut selects the same
rows (ties broken by bigram text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.functions.text import tokens, word_ngram_rows
from fs2_kinesis_firehose_spark.operators.editdist import editdist_pair_counts
from fs2_kinesis_firehose_spark.queries import query
from fs2_kinesis_firehose_spark.tables import load_table

# c_name is 'Customer#' + 9 zero-padded digits.  Segment the DIGIT region
# only: the constant prefix would make the even partition's first segments
# universal join keys (every string in one bucket = the quadratic join the
# filter exists to avoid).  [9,16) = the 7 high digits (id div 100);
# [16,18) = the 2 low digits — the split that maximizes the smaller
# segment cardinality, i.e. minimizes sum(bucket_freq^2).
_ED_K = 1
_ED_BOUNDARIES = [(9, 7), (16, 2)]


@query(
    "editdist_neardup_counts",
    oracle=f"""
    SELECT levenshtein(a.c_name, b.c_name) AS edit_dist, COUNT(*) AS n_pairs
    FROM customer a
    JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= {_ED_K}
    GROUP BY 1
    ORDER BY 1
    """,
)
def editdist_neardup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-level near-dup accounting: pair counts at each edit distance
    ≤ k over customer names (operators/editdist.py — PassJoin segment
    filter, lossless by pigeonhole, verified by Spark's JVM
    levenshtein-with-threshold)."""
    cust = load_table(spark, sf_dir, "customer")
    return editdist_pair_counts(
        cust, "c_name", "c_custkey", k=_ED_K, boundaries=_ED_BOUNDARIES
    )


_PMI_MIN_COUNT = 5
_PMI_TOPK = 50


@query(
    "pmi_collocations_topk",
    oracle=f"""
    WITH w AS (
        SELECT string_split_regex(trim(text), '\\s+') AS words FROM documents
    ),
    uni AS (
        SELECT unnest(words) AS w FROM w
    ),
    ucnt AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
    n AS (SELECT COUNT(*) AS n FROM uni),
    big AS (
        SELECT unnest([{{'w1': words[i], 'w2': words[i + 1]}}
                       FOR i IN range(1, len(words))]) AS bg
        FROM w
    ),
    bcnt AS (
        SELECT bg.w1 AS w1, bg.w2 AS w2, COUNT(*) AS c_xy
        FROM big GROUP BY 1, 2
    )
    SELECT w1 || ' ' || w2 AS bigram, c_xy, u1.c AS c_x, u2.c AS c_y
    FROM bcnt
    JOIN ucnt u1 ON bcnt.w1 = u1.w
    JOIN ucnt u2 ON bcnt.w2 = u2.w
    CROSS JOIN n
    WHERE c_xy >= {_PMI_MIN_COUNT}
    ORDER BY (c_xy * 1.0 * n.n) / (u1.c * 1.0 * u2.c) DESC, bigram
    LIMIT {_PMI_TOPK}
    """,
)
def pmi_collocations_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k collocations by PMI: bigram + its exact corpus counts.

    Plan shape: one bigram aggregate, one unigram aggregate (both partial-
    aggregated map-side), two shuffle joins on the word, a 1-row total
    crossJoin, and a TakeOrderedAndProject — no Python, no window.  The
    output carries only EXACT integers (c_xy, c_x, c_y); the PMI ratio is
    used for ORDERING only and is computed with the identical
    left-associated IEEE expression ``(c_xy*1.0*N)/(c_x*1.0*c_y)`` on both
    engines, so the top-k boundary cut is deterministic (full tiebreak by
    bigram text)."""
    docs = load_table(spark, sf_dir, "documents")
    bigrams = word_ngram_rows(docs, "text", "doc_id", 2, distinct=False, out_col="bg")
    bcnt = (
        bigrams.select(
            F.substring_index("bg", " ", 1).alias("w1"),
            F.substring_index("bg", " ", -1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= _PMI_MIN_COUNT)
    )
    uni = docs.select(F.explode(tokens("text")).alias("w"))
    ucnt = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = uni.agg(F.count(F.lit(1)).alias("n"))
    ratio = (F.col("c_xy") * F.lit(1.0) * F.col("n")) / (
        F.col("c_x") * F.lit(1.0) * F.col("c_y")
    )
    return (
        bcnt.join(ucnt.withColumnRenamed("w", "w1").withColumnRenamed("c", "c_x"), "w1")
        .join(ucnt.withColumnRenamed("w", "w2").withColumnRenamed("c", "c_y"), "w2")
        .crossJoin(total)
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            "c_xy",
            "c_x",
            "c_y",
            ratio.alias("_ratio"),
        )
        .orderBy(F.col("_ratio").desc(), "bigram")
        .limit(_PMI_TOPK)
        .drop("_ratio")
    )
