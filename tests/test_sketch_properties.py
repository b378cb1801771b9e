"""Property-based invariants for the Misra–Gries compress step (pure
Python — no Spark): these are the guarantees the distributed operator's
correctness argument rests on (operators/sketches.py docstring)."""

from __future__ import annotations

import collections

from hypothesis import given, settings
from hypothesis import strategies as st

from fs2_kinesis_firehose_spark.operators.sketches import _compress

streams = st.lists(st.integers(0, 50), min_size=0, max_size=500)
ks = st.integers(1, 20)


@settings(max_examples=200, deadline=None)
@given(items=streams, k=ks)
def test_compress_size_and_underestimate(items, k):
    counts = dict(collections.Counter(items))
    out = _compress(dict(counts), k)
    assert len(out) <= k
    total = sum(counts.values())
    for item, w in out.items():
        assert 0 < w <= counts[item]          # never overcounts
    # the subtracted threshold t is bounded by total/(k+1): every item's
    # undercount from ONE compress obeys the MG error bound
    for item, c in counts.items():
        assert c - out.get(item, 0) <= total / (k + 1)


@settings(max_examples=100, deadline=None)
@given(items=streams, k=ks, cut=st.data())
def test_batched_pipeline_error_bound(items, k, cut):
    """Simulate exactly what misra_gries_summaries does per partition —
    merge exact per-batch counts, compress on overflow — for an arbitrary
    batch split: total undercount per item stays <= n/(k+1)."""
    n_batches = cut.draw(st.integers(1, 5))
    bounds = sorted(
        cut.draw(
            st.lists(st.integers(0, len(items)), min_size=n_batches - 1,
                     max_size=n_batches - 1)
        )
    )
    batches, prev = [], 0
    for b in [*bounds, len(items)]:
        batches.append(items[prev:b])
        prev = b

    counters: dict = {}
    high_water = max(4 * k, k + 1)
    for batch in batches:
        for item, c in collections.Counter(batch).items():
            counters[item] = counters.get(item, 0) + c
        if len(counters) > high_water:
            counters = _compress(counters, k)
    counters = _compress(counters, k)

    truth = collections.Counter(items)
    bound = len(items) / (k + 1)
    assert len(counters) <= k
    for item, c in truth.items():
        assert counters.get(item, 0) <= c
        assert c - counters.get(item, 0) <= bound
