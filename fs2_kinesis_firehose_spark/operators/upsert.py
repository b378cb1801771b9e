"""Batch snapshot upsert: MERGE-shaped SCD1 apply without a table format.

``MERGE INTO`` needs Delta/Iceberg; a plain-parquet pipeline still has
mutable reference tables (label stores, metadata, account snapshots) that
take periodic change batches.  This operator applies one change batch to a
snapshot in a single full-outer join — the declarative form Catalyst can
plan as one shuffle (or exchange-free on co-bucketed layouts).

Semantics (per key):

- key only in snapshot → **unchanged** (kept as-is)
- key in changes with the delete flag set → **deleted** (dropped)
- key in both (no delete) → **updated** (change row's columns win)
- key only in changes (no delete) → **inserted**

Changes must be unique per key; pass ``version_col`` to resolve multi-row
batches (highest version wins — the latest-wins rule a CDC compactor
applies).  Determinism requires ``(key, version)`` unique: equal versions
on one key have no defined winner, the same contract MERGE itself has.
Output schema = snapshot schema (+ optional ``_action`` audit column for
accounting queries).

At 100 TB: one shuffle on the key for the join (plus one keyed window pass
only when ``version_col`` dedup is requested); no driver-side state; the
result is deterministic under retries, so writing it through an idempotent
sink gives exactly-once snapshot publication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["upsert_snapshot", "scd2_apply"]


def upsert_snapshot(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    *,
    delete_col: str | None = None,
    version_col: str | None = None,
    action_col: str | None = None,
) -> DataFrame:
    """Apply ``changes`` to ``snapshot`` (see module docstring for the
    per-key rules).  ``changes`` must contain ``key_col`` and every
    snapshot data column (plus optional delete/version columns)."""
    data_cols = [c for c in snapshot.columns if c != key_col]
    missing = [c for c in [key_col, *data_cols] if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing snapshot columns: {missing}")

    # NULL-key change rows are dropped: a NULL key matches nothing in a
    # full-outer join, and without this filter such a row would surface as
    # a phantom all-NULL "unchanged" output row (the in_change flag below
    # is derived from c.key IS NOT NULL).
    ch = changes.where(F.col(key_col).isNotNull())
    if version_col is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy(key_col).orderBy(F.desc(version_col))
        ch = (
            ch.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    is_delete = (
        F.coalesce(F.col(f"c.{delete_col}"), F.lit(False))
        if delete_col is not None
        else F.lit(False)
    )

    s = snapshot.alias("s")
    c = ch.alias("c")
    joined = s.join(c, F.col(f"s.{key_col}") == F.col(f"c.{key_col}"), "full_outer")
    in_change = F.col(f"c.{key_col}").isNotNull()
    in_snap = F.col(f"s.{key_col}").isNotNull()

    out = joined.where(~(in_change & is_delete)).select(
        F.coalesce(F.col(f"c.{key_col}"), F.col(f"s.{key_col}")).alias(key_col),
        *[
            F.when(in_change, F.col(f"c.{d}")).otherwise(F.col(f"s.{d}")).alias(d)
            for d in data_cols
        ],
        F.when(in_change & in_snap, F.lit("updated"))
        .when(in_change, F.lit("inserted"))
        .otherwise(F.lit("unchanged"))
        .alias("_action"),
    )
    if action_col is None:
        return out.drop("_action")
    return out.withColumnRenamed("_action", action_col)


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    key_col: str,
    change_ts_col: str,
    *,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: apply one change batch to a history
    table, preserving full lineage as validity intervals.

    ``history`` rows carry ``[from_col, to_col)`` with ``to_col`` NULL on
    the current version; ``changes`` carries the key, every data column,
    and ``change_ts_col``.  Per key in the batch:

    - current version exists and data differs → current row is CLOSED
      (``to_col`` = change ts) and a new current row opens at the change ts
    - current version exists with identical data → NO-OP (no spurious
      version — the standard SCD2 idempotence rule)
    - no current version → new current row opens at the change ts

    Closed historical rows are never touched.  Changes must be unique per
    key (one batch = one tick; chain batches for multiple ticks).

    One full-outer-shaped join on the key (expressed as one outer join over
    the CURRENT slice only + union with the closed slice); deterministic
    under retries like ``upsert_snapshot``.
    """
    data_cols = [
        c for c in history.columns if c not in (key_col, from_col, to_col)
    ]
    missing = [
        c for c in [key_col, *data_cols, change_ts_col] if c not in changes.columns
    ]
    if missing:
        raise ValueError(f"changes is missing columns: {missing}")

    closed = history.where(F.col(to_col).isNotNull())
    cur = history.where(F.col(to_col).isNull()).alias("s")
    # NULL-key changes are dropped explicitly (same contract as
    # upsert_snapshot — a NULL key can never match or open a version)
    c = changes.where(F.col(key_col).isNotNull()).alias("c")
    j = cur.join(c, F.col(f"s.{key_col}") == F.col(f"c.{key_col}"), "full_outer")
    in_change = F.col(f"c.{key_col}").isNotNull()
    in_cur = F.col(f"s.{key_col}").isNotNull()
    differs = in_change & in_cur & ~F.struct(
        *[F.col(f"s.{d}") for d in data_cols]
    ).eqNullSafe(F.struct(*[F.col(f"c.{d}") for d in data_cols]))

    # surviving current rows: untouched keys + no-op changes keep the old
    # row; real changes and brand-new keys open a fresh current version
    keep_old_current = j.where(in_cur & (~in_change | ~differs)).select(
        F.col(f"s.{key_col}").alias(key_col),
        *[F.col(f"s.{d}").alias(d) for d in data_cols],
        F.col(f"s.{from_col}").alias(from_col),
        F.lit(None).cast(history.schema[to_col].dataType).alias(to_col),
    )
    closed_now = j.where(differs).select(
        F.col(f"s.{key_col}").alias(key_col),
        *[F.col(f"s.{d}").alias(d) for d in data_cols],
        F.col(f"s.{from_col}").alias(from_col),
        F.col(f"c.{change_ts_col}").cast(history.schema[to_col].dataType).alias(to_col),
    )
    new_current = j.where(differs | (in_change & ~in_cur)).select(
        F.col(f"c.{key_col}").alias(key_col),
        *[F.col(f"c.{d}").alias(d) for d in data_cols],
        F.col(f"c.{change_ts_col}").cast(history.schema[from_col].dataType).alias(from_col),
        F.lit(None).cast(history.schema[to_col].dataType).alias(to_col),
    )
    return closed.unionByName(keep_old_current).unionByName(closed_now).unionByName(
        new_current
    )
