"""Property-based tests (hypothesis) for the shared request slicer — the
quota invariants hold for ARBITRARY payload streams, not just the fixtures.
Pure Python: no SparkSession, so hundreds of examples run in milliseconds."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fs2_kinesis_firehose_spark.firehose.batching import slice_requests

payload_lists = st.lists(st.binary(min_size=0, max_size=200), max_size=200)


@given(payloads=payload_lists, batch_size=st.integers(1, 50), max_bytes=st.integers(200, 2000))
@settings(max_examples=300, deadline=None)
def test_slicer_invariants(payloads, batch_size, max_bytes):
    requests = list(
        slice_requests(
            payloads, batch_size=batch_size, max_batch_bytes=max_bytes, max_record_bytes=200
        )
    )
    # lossless and order-preserving
    assert [p for req, _ in requests for p in req] == payloads
    for req, nbytes in requests:
        assert 1 <= len(req) <= batch_size
        assert nbytes == sum(len(p) for p in req)
        assert nbytes <= max_bytes or len(req) == 1  # single record may fill a request
    # byte bound is tight: a request only exceeds max_bytes if it's one record
    # and record-size <= 200 <= max_bytes, so actually never exceeds
    assert all(nbytes <= max_bytes for _, nbytes in requests)


@given(payloads=payload_lists)
@settings(max_examples=100, deadline=None)
def test_slicer_greedy_byte_packing(payloads):
    """Flushes happen only when forced: each request except the last must be
    'full' — either at the record cap or unable to absorb the next payload."""
    batch_size, max_bytes = 10, 500
    requests = list(
        slice_requests(
            payloads, batch_size=batch_size, max_batch_bytes=max_bytes, max_record_bytes=1000
        )
    )
    for (req, nbytes), (nxt, _) in zip(requests, requests[1:]):
        assert len(req) == batch_size or nbytes + len(nxt[0]) > max_bytes


@given(
    payloads=payload_lists,
    batch_size=st.integers(1, 50),
    max_bytes=st.integers(1, 2000),
    max_record=st.integers(1, 5000),
)
@settings(max_examples=300, deadline=None)
def test_slicer_unclamped_parameters_never_overflow_request(payloads, batch_size, max_bytes, max_record):
    """max_record_bytes > max_batch_bytes must NOT let a single record form an
    over-quota request: the generator clamps internally, so the byte quota
    holds for ANY caller, not just ProducerSettings-clamped ones."""
    try:
        requests = list(
            slice_requests(
                payloads,
                batch_size=batch_size,
                max_batch_bytes=max_bytes,
                max_record_bytes=max_record,
            )
        )
    except ValueError:
        # a payload exceeded the (clamped) per-record limit — the documented
        # fail-fast contract, still never an over-quota request
        return
    assert [p for req, _ in requests for p in req] == payloads
    for req, nbytes in requests:
        assert 1 <= len(req) <= batch_size
        assert nbytes <= max_bytes


def test_slicer_oversized_record_raises():
    with pytest.raises(ValueError, match="per-record limit"):
        list(
            slice_requests(
                [b"x" * 11], batch_size=10, max_batch_bytes=100, max_record_bytes=10
            )
        )
