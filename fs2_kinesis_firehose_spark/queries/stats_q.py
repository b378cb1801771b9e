"""ANALYZE-style statistics collection (late round 7).

``analyze_orders_stats`` materializes the CBO-input statistics row for the
orders table (operators/stats.py) — exact null counts, NDVs, min/max
bounds, string byte widths — as one wide natively-typed row the oracle
restates aggregate-for-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.operators.stats import column_stats
from fs2_kinesis_firehose_spark.queries import query
from fs2_kinesis_firehose_spark.tables import load_table


@query(
    "analyze_orders_stats",
    oracle="""
    SELECT
      COUNT(*) AS n_rows,
      CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderkey_nulls,
      COUNT(DISTINCT o_orderkey) AS o_orderkey_ndv,
      MIN(o_orderkey) AS o_orderkey_min,
      MAX(o_orderkey) AS o_orderkey_max,
      CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_custkey_nulls,
      COUNT(DISTINCT o_custkey) AS o_custkey_ndv,
      MIN(o_custkey) AS o_custkey_min,
      MAX(o_custkey) AS o_custkey_max,
      CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderstatus_nulls,
      COUNT(DISTINCT o_orderstatus) AS o_orderstatus_ndv,
      CAST(SUM(LENGTH(o_orderstatus)) AS BIGINT) AS o_orderstatus_sumlen,
      CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_totalprice_nulls,
      COUNT(DISTINCT o_totalprice) AS o_totalprice_ndv,
      MIN(o_totalprice) AS o_totalprice_min,
      MAX(o_totalprice) AS o_totalprice_max,
      CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderdate_nulls,
      COUNT(DISTINCT o_orderdate) AS o_orderdate_ndv,
      MIN(o_orderdate) AS o_orderdate_min,
      MAX(o_orderdate) AS o_orderdate_max,
      CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderpriority_nulls,
      COUNT(DISTINCT o_orderpriority) AS o_orderpriority_ndv,
      CAST(SUM(LENGTH(o_orderpriority)) AS BIGINT) AS o_orderpriority_sumlen
    FROM orders
    """,
)
def analyze_orders_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return column_stats(orders)


@query(
    "zipf_fit_stats",
    oracle=r"""
    WITH words AS (
        SELECT UNNEST(string_split_regex(trim(text), '\s+')) AS w
        FROM documents
        WHERE length(trim(text)) > 0
    ),
    freq AS (SELECT w, COUNT(*) AS f FROM words GROUP BY w),
    ranked AS (
        SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, w ASC) AS rn
        FROM freq
    ),
    top AS (
        SELECT ln(CAST(rn AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y
        FROM ranked WHERE rn <= 1000
    ),
    s AS (
        SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM top
    ),
    v AS (SELECT COUNT(*) AS n_vocab, CAST(SUM(f) AS BIGINT) AS n_tokens
          FROM freq)
    SELECT ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
               AS zipf_intercept,
           ROUND(POW(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2,
           n AS n_ranked,
           n_vocab,
           n_tokens
    FROM s, v
    """,
)
def zipf_fit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health Zipf diagnostic: OLS fit of ln(freq) ~ ln(rank) over
    the top-1000 word ranks — natural corpora sit near slope −1; synthetic
    / template-heavy / deduplication-damaged corpora drift (the standard
    quick check before training on a new feed).

    Plan: one word-count aggregate (vocab-sized output), a deliberate
    single-partition ROW_NUMBER window over the VOCAB (bounded by rank
    cutoff semantics, never corpus-sized — the AUC-histogram idiom), and
    one 6-number closed-form OLS aggregate; the corpus itself is scanned
    once.  Results rounded to 6 dp for cross-engine float stability."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.where(F.length(F.trim("text")) > 0)
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
    )
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    ranked = freq.select(
        "f",
        F.row_number()
        .over(Window.orderBy(F.col("f").desc(), F.col("w").asc()))
        .alias("rn"),
    )
    top = ranked.where(F.col("rn") <= 1000).select(
        F.log(F.col("rn").cast("double")).alias("x"),
        F.log(F.col("f").cast("double")).alias("y"),
    )
    s = top.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    v = freq.agg(
        F.count(F.lit(1)).alias("n_vocab"), F.sum("f").alias("n_tokens")
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.crossJoin(F.broadcast(v)).select(
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "zipf_intercept"
        ),
        F.round(
            F.pow(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"), F.lit(2))
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("r2"),
        F.col("n").alias("n_ranked"),
        "n_vocab",
        "n_tokens",
    )


@query(
    "join_key_skew_report",
    oracle="""
    WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id),
    s AS (
        SELECT COUNT(*) AS n_keys,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               MAX(cnt) AS max_rows_per_key
        FROM c
    ),
    t AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS topn_rows
        FROM (SELECT cnt FROM c ORDER BY cnt DESC, user_id ASC LIMIT 10)
    )
    SELECT n_keys, n_rows, max_rows_per_key,
           ROUND(n_rows / n_keys, 6) AS avg_rows_per_key,
           ROUND(max_rows_per_key / (n_rows / n_keys), 6) AS skew_ratio,
           topn_rows,
           ROUND(topn_rows / n_rows, 6) AS topn_share
    FROM s, t
    """,
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-shuffle skew diagnostic over the events fact's ``user_id`` —
    the key every sessionization/funnel/cohort query in this repo shuffles
    on.  ``skew_ratio`` is the hot-partition multiplier a hash exchange on
    this key inherits; ``topn_share`` separates one pathological key from
    a heavy head.  This report is what decides between plain hash
    partitioning, salting (``salted_join_priority_revenue``'s recipe) and
    AQE skew-join splitting — measured, not guessed.

    Plan: one map-side-combining aggregate on the key, then a global fold
    + a TakeOrdered top-10 over the per-key count table, joined by a 1-row
    broadcast.  The oracle restates all three folds with the identical
    division order."""
    from fs2_kinesis_firehose_spark.operators.stats import key_skew_report

    events = load_table(spark, sf_dir, "events")
    return key_skew_report(events, "user_id", top_n=10)
