"""As-of (most-recent-prior) join — the time-series join Spark lacks natively.

``asof_join(left, right)``: for each left row, attach the latest right row
with ``right.time <= left.time`` for the same key.

Spark realization (the scalable union+window form, not a range cross-join):
tag and union both sides, sort within key by (time, side-order), and
carry-forward the last seen right-side values with
``last(col, ignorenulls=True)`` over an unbounded-preceding window.  One
shuffle on the key; no row explosion; skew handled by AQE.  This is the
standard distributed as-of pattern (cf. pandas ``merge_asof`` semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance=None,
) -> DataFrame:
    """Left as-of join: every left row, plus the most recent right row at or
    before its timestamp (nulls when no prior right row exists).

    Ties on equal timestamps resolve to the right row (right sorts first at
    the same instant — matching ``<=`` semantics).

    ``tolerance`` (pandas ``merge_asof`` parity): a Column/expression
    bounding how STALE the match may be — a match with
    ``left_time - right_time > tolerance`` is nulled out (the left row is
    KEPT, its as-of values become NULL; it is not dropped).  Pass an
    interval for timestamps (``F.expr("INTERVAL 30 DAYS")``) or a numeric
    for numeric time axes.  Implemented by carrying the matched right
    time through the same window — zero extra shuffles.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, right_time)
    ]
    lt = left.select(
        F.col(key),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal times (<=)
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_time].dataType).alias("_rt"),
    )
    rt = right.select(
        F.col(key),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_time).alias("_rt"),
    )
    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_side",
        "_lrow",
        F.col("_t"),
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in value_cols],
        F.last("_rt", ignorenulls=True).over(w).alias("_rt"),
    ).filter(F.col("_side") == 1)
    if tolerance is not None:
        fresh = F.col("_rt").isNotNull() & (
            (F.col("_t") - F.col("_rt")) <= tolerance
        )
        carried = carried.select(
            "_side",
            "_lrow",
            *[
                F.when(fresh, F.col(f"_r_{c}")).alias(f"_r_{c}")
                for c in value_cols
            ],
        )
    return carried.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_r_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
