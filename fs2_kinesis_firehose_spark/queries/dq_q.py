"""Data-quality gates and view maintenance (late round 7).

``dq_check_report`` is the Deequ-style constraint-validation suite
(Schelter et al., "Automating large-scale data quality verification",
PVLDB 2018 — public Amazon Deequ): uniqueness, referential integrity,
completeness, range and enum domain checks over the fixture warehouse,
one row per check with exact violation counts.  The gate every ingest
pipeline runs before publishing a snapshot.

``incremental_mv_refresh_accounting`` proves the additive-fold refresh
(operators/mv.py): a revenue/count view split at a date boundary is
refreshed by folding the delta's partial aggregate into the stored view,
and the output restates BOTH the folded and the recomputed measures so
the oracle (and the hash) certify fold == full-rescan exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.operators.mv import fold_additive_agg
from fs2_kinesis_firehose_spark.queries import query
from fs2_kinesis_firehose_spark.tables import load_table


@query(
    "dq_check_report",
    oracle="""
    SELECT 'pk_orderkey_unique' AS check_name,
           (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
            WHERE o_orderkey IS NOT NULL) AS n_violations
    UNION ALL
    SELECT 'fk_orders_customer',
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'complete_custkey',
           (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
    UNION ALL
    SELECT 'range_totalprice_positive',
           (SELECT COUNT(*) FROM orders
            WHERE o_totalprice IS NULL OR o_totalprice <= 0)
    UNION ALL
    SELECT 'enum_orderstatus',
           (SELECT COUNT(*) FROM orders
            WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('F', 'O', 'P'))
    UNION ALL
    SELECT 'range_lineitem_quantity',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50)
    """,
)
def dq_check_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six constraint checks, each ONE aggregate (the FK check is a
    broadcast anti-join count), unioned into a (check_name, n_violations)
    report.  Every count is exact, so the report doubles as the
    publish/abort gate: a pipeline asserts n_violations == 0 (or a
    budget) before a snapshot goes live.  At 100 TB each check is
    map-side partial aggregation over one scan; the checks share no
    state, so Spark runs the union's legs as independent stages."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    def one(name: str, cnt: DataFrame) -> DataFrame:
        return cnt.select(
            F.lit(name).alias("check_name"), F.col("n").cast("long").alias("n_violations")
        )

    pk = orders.where(F.col("o_orderkey").isNotNull()).agg(
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("n")
    )
    fk = (
        orders.where(F.col("o_custkey").isNotNull())
        .join(
            F.broadcast(customer.select("c_custkey")),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    complete = orders.agg(
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("n")
    )
    price = orders.agg(
        F.sum(
            (F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)).cast("long")
        ).alias("n")
    )
    enum_ = orders.agg(
        F.sum(
            (
                F.col("o_orderstatus").isNull()
                | ~F.col("o_orderstatus").isin("F", "O", "P")
            ).cast("long")
        ).alias("n")
    )
    qty = lineitem.agg(
        F.sum(
            (
                F.col("l_quantity").isNull()
                | (F.col("l_quantity") < 1)
                | (F.col("l_quantity") > 50)
            ).cast("long")
        ).alias("n")
    )
    return (
        one("pk_orderkey_unique", pk)
        .unionByName(one("fk_orders_customer", fk))
        .unionByName(one("complete_custkey", complete))
        .unionByName(one("range_totalprice_positive", price))
        .unionByName(one("enum_orderstatus", enum_))
        .unionByName(one("range_lineitem_quantity", qty))
    )


_MV_SPLIT = "1996-01-01"


@query(
    "incremental_mv_refresh_accounting",
    oracle=f"""
    WITH base AS (
        SELECT o_orderpriority AS priority,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_orders
        FROM orders WHERE o_orderdate < TIMESTAMP '{_MV_SPLIT}'
        GROUP BY 1
    ),
    delta AS (
        SELECT o_orderpriority AS priority,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_orders
        FROM orders WHERE o_orderdate >= TIMESTAMP '{_MV_SPLIT}'
        GROUP BY 1
    ),
    folded AS (
        SELECT COALESCE(b.priority, d.priority) AS priority,
               CAST(COALESCE(b.revenue_cents, 0) + COALESCE(d.revenue_cents, 0) AS BIGINT) AS revenue_cents,
               COALESCE(b.n_orders, 0) + COALESCE(d.n_orders, 0) AS n_orders
        FROM base b FULL OUTER JOIN delta d ON b.priority = d.priority
    ),
    full_recompute AS (
        SELECT o_orderpriority AS priority,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS full_revenue_cents,
               COUNT(*) AS full_n_orders
        FROM orders GROUP BY 1
    )
    SELECT f.priority, f.revenue_cents, f.n_orders,
           r.full_revenue_cents, r.full_n_orders,
           f.revenue_cents = r.full_revenue_cents
             AND f.n_orders = r.full_n_orders AS fold_matches
    FROM folded f JOIN full_recompute r ON f.priority = r.priority
    """,
)
def incremental_mv_refresh_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Refresh a revenue/count view by folding the delta's partial
    aggregate (operators/mv.py:fold_additive_agg — one full-outer join of
    two aggregate-sized tables, refresh cost ∝ delta) and restate the
    full recompute beside it.  Sums fold in EXACT integer cents: per-row
    cent quantization before any aggregation keeps the
    fold-vs-rescan comparison free of float-association noise while still
    certifying both pipelines agree to the cent (the repo's exact-cents
    idiom: per-row ROUND(x*100) longs, integer sums)."""
    orders = load_table(spark, sf_dir, "orders")
    # per-ROW cents, then an exact integer sum: a post-hoc round of the
    # double SUM is order-dependent (and fold-vs-rescan would double-round)
    cents = F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))

    def agg_slice(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_orderpriority").alias("priority")).agg(
            cents.alias("revenue_cents"), F.count(F.lit(1)).alias("n_orders")
        )

    split = F.lit(_MV_SPLIT).cast("timestamp")
    view = agg_slice(orders.where(F.col("o_orderdate") < split))
    delta = agg_slice(orders.where(F.col("o_orderdate") >= split))
    folded = fold_additive_agg(view, delta, ["priority"], ["revenue_cents", "n_orders"])
    full = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        cents.alias("full_revenue_cents"), F.count(F.lit(1)).alias("full_n_orders")
    )
    return folded.join(full, "priority").select(
        "priority",
        "revenue_cents",
        "n_orders",
        "full_revenue_cents",
        "full_n_orders",
        (
            (F.col("revenue_cents") == F.col("full_revenue_cents"))
            & (F.col("n_orders") == F.col("full_n_orders"))
        ).alias("fold_matches"),
    )
