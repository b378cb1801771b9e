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


# --- KLL quantile-sketch invariants (pure Python — no Spark) ----------------

import numpy as np

from fs2_kinesis_firehose_spark.operators.kll import KLLSketch

floats = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    min_size=1,
    max_size=3000,
)


@settings(max_examples=60, deadline=None)
@given(values=floats, k=st.integers(8, 64))
def test_kll_weight_conserved_and_ranks_monotone(values, k):
    sk = KLLSketch(k=k)
    sk.update_many(np.asarray(values))
    # total weight is conserved EXACTLY (odd levels retain their max)
    assert sk.rank(np.inf) == len(values)
    assert sk.rank(-np.inf) == 0
    # rank is monotone in the query point
    qs = sorted({min(values), max(values), 0.0})
    ranks = [sk.rank(q) for q in qs]
    assert ranks == sorted(ranks)
    # quantiles are monotone in phi and drawn from the inserted values
    prev = -np.inf
    for phi in (0.0, 0.25, 0.5, 0.75, 1.0):
        v = sk.quantile(phi)
        assert v >= prev
        assert v in set(values)
        prev = v


@settings(max_examples=40, deadline=None)
@given(values=floats, k=st.integers(16, 64), cut=st.integers(0, 3000))
def test_kll_merge_conserves_weight_and_bounds(values, k, cut):
    cut = min(cut, len(values))
    a, b = KLLSketch(k=k), KLLSketch(k=k)
    a.update_many(np.asarray(values[:cut]))
    b.update_many(np.asarray(values[cut:]))
    a.merge(b)
    assert a.n == len(values)
    assert a.rank(np.inf) == len(values)
    # the deterministic-compactor rank error stays inside a generous
    # envelope: the summary's median must split the data within 25% of n
    # for the small-k cases hypothesis generates (the tight ~1/k bound is
    # covered deterministically in tests/test_kll.py at k=200)
    data = np.sort(np.asarray(values))
    est = a.quantile(0.5)
    lo = np.searchsorted(data, est, side="left")
    hi = np.searchsorted(data, est, side="right")
    err = max(0.0, lo - 0.5 * len(data), 0.5 * len(data) - hi) / len(data)
    assert err <= 0.25
