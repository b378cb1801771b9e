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

__all__ = ["upsert_snapshot"]


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

    ch = changes
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
