"""Arbitrary per-key streaming state (SURVEY.md §2 Tier B "stateful" row).

``running_user_stats`` keeps a per-user running aggregate across micro-batches
via ``applyInPandasWithState`` — the Spark-idiomatic form of a custom stateful
operator (state lives in the state store, partitioned by key across
executors; timeouts evict idle keys so state stays bounded at scale).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, max_value double"
STATE_SCHEMA = "n bigint, total double, mx double"


def _update_user_stats(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "total_value": round(total, 2), "max_value": mx}]
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user cumulative (count, sum, max) emitted every micro-batch.

    The reference has no stateful operator at all (SURVEY.md §2 "not
    present"); this is the engine's template for custom per-key streaming
    state: update-mode output, state store per key, no driver involvement."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
