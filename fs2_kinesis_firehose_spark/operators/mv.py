"""Incremental materialized-view maintenance — additive aggregate folding.

The warehouse feature that makes 100 TB dashboards affordable: a
SUM/COUNT-shaped aggregate view is refreshed by folding the DELTA's
partial aggregate into the stored view instead of rescanning the base
(refresh cost ∝ delta, not corpus).  Correctness rests on the same
algebra Spark's own partial aggregation uses — sums and counts are
commutative monoids, so ``agg(base ⊎ delta) == fold(agg(base),
agg(delta))`` exactly, including for disjoint/overlapping key sets
(full-outer coalesce-to-identity).  AVG-style views store (sum, count)
pairs and derive the ratio at read time; MIN/MAX fold with greatest/
least (monoid, but not invertible — deletes need recompute); EXACT
DISTINCT does not fold — store HLL registers (operators/hll.py,
max-monoid) when approximate is acceptable.

Plan shape: one full-outer join on the view key between two
aggregate-sized tables (broadcast when the delta's key set is small) +
codegen coalesce-adds.  No raw-row work at refresh time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fold_additive_agg", "signed_cdc_delta"]


def fold_additive_agg(
    view: DataFrame, delta: DataFrame, keys: list[str], add_cols: list[str]
) -> DataFrame:
    """Fold a delta partial-aggregate into a stored view: full-outer join
    on ``keys``, per-column ``coalesce(v, 0) + coalesce(d, 0)`` for every
    additive measure in ``add_cols`` (sums and counts).  Output schema ==
    view schema; key-only-in-delta rows appear, key-only-in-view rows
    survive unchanged."""
    missing = [c for c in keys + add_cols if c not in delta.columns]
    if missing:
        raise ValueError(f"delta is missing fold columns: {missing}")
    clash = [
        f"_d_{c}"
        for c in keys + add_cols
        if f"_d_{c}" in view.columns or f"_d_{c}" in delta.columns
    ]
    if clash:
        # withColumnRenamed would silently collide (or no-op) and the
        # d["_d_<col>"] references below would bind the wrong column.
        raise ValueError(f"reserved _d_-prefixed names already present: {clash}")
    d = delta
    for c in add_cols + keys:
        d = d.withColumnRenamed(c, f"_d_{c}")
    # eqNullSafe, not a USING-join: SQL null != null would leave a
    # NULL-keyed group present in both sides as TWO output rows instead
    # of one folded row (a full recompute would emit one).
    cond = None
    for k in keys:
        c = view[k].eqNullSafe(d[f"_d_{k}"])
        cond = c if cond is None else cond & c
    joined = view.join(d, cond, "full_outer")
    out_cols: list = [F.coalesce(view[k], d[f"_d_{k}"]).alias(k) for k in keys]
    for c in add_cols:
        zero = F.lit(0).cast(view.schema[c].dataType)
        out_cols.append(
            (F.coalesce(F.col(c), zero) + F.coalesce(F.col(f"_d_{c}"), zero)).alias(c)
        )
    return joined.select(*out_cols)


def signed_cdc_delta(
    changes: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
    *,
    count_col: str = "n_rows",
    action_col: str = "action",
) -> DataFrame:
    """Partial-aggregate a CDC batch as SIGNED deltas so a change feed with
    UPDATES and DELETES can maintain a SUM/COUNT view through the same
    additive fold as inserts (``fold_additive_agg``): inserted rows
    contribute (+1, +new), removed rows (−1, −old), changed rows
    (0, new − old).  This is the retraction algebra of incremental view
    maintenance — sums are abelian GROUPS, not just monoids, so deletes
    fold exactly; MIN/MAX (monoid-only) cannot be maintained this way and
    need recompute on delete.

    ``measures`` maps each output measure to its ``(old_col, new_col)``
    pair in the change batch (NULL old = insert, NULL new = delete).
    Output: keys + count_col + one signed column per measure — the same
    shape ``fold_additive_agg`` takes as its delta.

    Plan: one map-side-combining aggregate over the (small) change batch;
    refresh cost stays ∝ |delta| regardless of view or base size.
    """
    # Validate the action vocabulary in-plan: a feed speaking a different
    # dialect ('deleted', 'upsert', NULL) must fail loudly, not silently
    # contribute sign 0 while still emitting the measure delta.
    sign = (
        F.when(F.col(action_col) == "added", F.lit(1))
        .when(F.col(action_col) == "removed", F.lit(-1))
        .when(F.col(action_col).isin("changed", "unchanged"), F.lit(0))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("signed_cdc_delta: unknown action "),
                    F.coalesce(F.col(action_col), F.lit("NULL")),
                )
            ).cast("int")
        )
    )
    aggs = [F.sum(sign).alias(count_col)]
    for out, (old_c, new_c) in measures.items():
        contrib = F.coalesce(F.col(new_c), F.lit(0)) - F.coalesce(
            F.col(old_c), F.lit(0)
        )
        aggs.append(F.sum(contrib).alias(out))
    return changes.groupBy(*keys).agg(*aggs)
