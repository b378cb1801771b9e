"""Temporal join/rollup operators: bucketed interval (range) join and
multi-granularity time-bucket rollup.

Complements ``operators/asof.py`` (nearest-past join).  No reference
analog — the reference is a delivery pipe; these are the temporal-analytics
operators the north star names (as-of join, range join, hypertable rollup).

Scale design:

- ``interval_join``: a naive point-in-interval join is a pure theta join →
  BroadcastNestedLoopJoin (O(n·m), parallelism limited to the streamed
  side).  Bucketing both sides on ``floor(t / bucket_width)`` turns it into
  an EQUI join: intervals replicate to each bucket they overlap (tiny for
  width ≳ interval length), points land in exactly one bucket, and the
  residual ``start ≤ p < end`` predicate filters inside the hash join.  One
  shuffle, skew handled by AQE.
- ``time_bucket_rollup``: hour+day+… aggregates in ONE shuffle via
  GROUPING SETS over pre-truncated bucket columns (the continuous-aggregate
  pattern; Catalyst expands grouping sets with a single exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _floor_div(c: Column, w: Column) -> Column:
    """Exact floor division on longs across the FULL long range: the
    numerator (c - pmod(c, w)) is exactly divisible, and the division runs
    in decimal(38) — double division would misround for |values| > 2^53
    (e.g. nanosecond epochs ~1.7e18), silently bucketing a point one off
    from its containing interval."""
    exact = (c - F.pmod(c, w)).cast("decimal(38,0)")
    return (exact / w.cast("decimal(38,0)")).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (half-open), as a bucketed EQUI join.

    All three bound columns must share a numeric (long) domain — e.g.
    ``unix_micros`` of timestamps.  ``bucket_width`` trades replication for
    bucket size: an interval spanning k buckets is replicated k times, so
    pick width on the order of the typical interval length.

    Column name collisions between the two inputs are the caller's to
    resolve (standard join contract)."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    w = F.lit(bucket_width).cast("long")
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                _floor_div(F.col(start_col).cast("long"), w),
                _floor_div(F.col(end_col).cast("long") - 1, w),
            )
        ),
    )
    pt = points.withColumn("_bucket", _floor_div(F.col(point_col).cast("long"), w))
    return (
        pt.join(
            iv,
            (pt["_bucket"] == iv["_bucket"])
            & (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col)),
        )
        .drop("_bucket")
    )


def sessionize(
    df: DataFrame,
    *,
    ts_col: str,
    key_col: str,
    gap: int,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Gap-based batch sessionization: append ``session_id`` (1-based per
    key) that increments whenever the time since the previous event of the
    same key exceeds ``gap`` (numeric domain, e.g. epoch micros).

    Two window functions over ONE partitioning (lag → running sum of
    session starts), so Catalyst plans a single sort+shuffle on the key —
    the batch analog of the streaming session window
    (streaming/windows.py), and fully engine-portable SQL (unlike the
    state-store path).  Pass ``order_cols`` for a deterministic tiebreak
    when timestamps can collide within a key."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > gap), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("session_id", F.sum(is_new).over(w))


def time_bucket_rollup(
    df: DataFrame,
    ts_col: str,
    aggs: list[Column],
    *,
    granularities: tuple[str, ...] = ("hour", "day"),
) -> DataFrame:
    """Multi-granularity time rollup in one shuffle: for each granularity in
    ``granularities`` emit (grain, bucket, *aggs) where bucket is the
    ``date_trunc`` of ``ts_col`` — the hypertable continuous-aggregate shape,
    via ``DataFrame.groupingSets`` so Catalyst plans a single exchange
    instead of one scan+shuffle per grain.

    ``bucket`` is emitted as a formatted string (engine-portable output; raw
    timestamp reprs differ across engines)."""
    gcols = [f"_g_{g}" for g in granularities]
    base = df.select(
        *[F.date_trunc(g, F.col(ts_col)).alias(c) for g, c in zip(granularities, gcols)],
        *df.columns,
    )
    # grouping() is only valid inside the aggregate, so the grain flags ride
    # along as aggregate columns and are folded into a label afterwards
    flags = [F.grouping(c).alias(f"_in{c}") for c in gcols]
    rolled = base.groupingSets(
        [[c] for c in gcols], *[F.col(c) for c in gcols]
    ).agg(*flags, *aggs)
    grain_expr = None
    for g, c in zip(granularities, gcols):
        cond = F.col(f"_in{c}") == 0
        grain_expr = F.when(cond, g) if grain_expr is None else grain_expr.when(cond, g)
    agg_cols = [
        c for c in rolled.columns if c not in gcols and not c.startswith("_in_g_")
    ]
    return rolled.select(
        grain_expr.alias("grain"),
        F.date_format(F.coalesce(*[F.col(c) for c in gcols]), "yyyy-MM-dd HH:mm:ss").alias(
            "bucket"
        ),
        *agg_cols,
    )


def funnel_times(
    df,
    steps: list[str],
    *,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
):
    """N-step ordered funnel: for each key, the earliest completion time of
    every successive step STRICTLY AFTER the previous step's completion —
    the standard product-analytics conversion cascade (view → click →
    purchase).  Returns one row per key that completed step 1, with columns
    ``t1..tN`` as epoch-microsecond longs (NULL from the first uncompleted
    step onward).

    Strict ordering means a step-2 event at exactly t1 does NOT count —
    each step must strictly follow the previous one; re-orderable same-
    timestamp events are not a conversion.

    Scale shape: step i is one filtered aggregate + one hash join, all
    keyed on ``key_col`` — 2(N−1)+1 shuffles on ONE key, so a pre-
    partitioned/bucketed event table pays a single exchange.  No windows,
    no Python; declarative joins Catalyst can reorder and AQE can size.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs >= 2 steps")
    t = F.unix_micros(F.col(ts_col))
    cur = (
        df.where(F.col(type_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(t).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = df.where(F.col(type_col) == step).select(
            F.col(key_col), t.alias("_t")
        )
        reached = (
            nxt.join(
                cur.where(F.col(f"t{i - 1}").isNotNull()).select(
                    key_col, f"t{i - 1}"
                ),
                key_col,
            )
            .where(F.col("_t") > F.col(f"t{i - 1}"))
            .groupBy(key_col)
            .agg(F.min("_t").alias(f"t{i}"))
        )
        cur = cur.join(reached, key_col, "left")
    return cur


def hourly_fill(
    df,
    key_col: str = "user_id",
    ts_col: str = "ts",
    *,
    count_col: str = "n_events",
):
    """Per-key hourly resample with zero-fill: one row for EVERY hour between
    a key's first and last event (inclusive), ``count_col`` = events in that
    hour (0 for gaps) — the dense grid rate-limit audits, gap reports, and
    time-series models need (a plain groupBy silently drops empty buckets).

    Scale shape: aggregate to (key, hour) first — the grid is generated
    from the AGGREGATED table's per-key min/max (one ``sequence`` +
    ``posexplode``-free explode, codegen), never from raw events; the fill
    join is keyed on (key, hour).  Grid size is Σ per-key spans — data-
    independent of raw event count.
    """
    bucket = F.date_trunc("hour", F.col(ts_col))
    base = (
        df.groupBy(F.col(key_col), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias(count_col))
    )
    grid = (
        base.groupBy(key_col)
        .agg(F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1"))
        .select(
            key_col,
            F.explode(
                F.sequence("_b0", "_b1", F.expr("interval 1 hour"))
            ).alias("bucket"),
        )
    )
    return grid.join(base, [key_col, "bucket"], "left").select(
        key_col, "bucket", F.coalesce(F.col(count_col), F.lit(0)).alias(count_col)
    )
