"""Sliding-window document chunking (operators/chunking.py).

Covers the start-grid boundary cases the oracle can't isolate: empty and
whitespace-only docs, docs shorter than one chunk, exact chunk_size length,
the no-pure-suffix-chunk stop rule, and the every-token-covered guarantee.
"""

from __future__ import annotations

import pytest

from fs2_kinesis_firehose_spark.operators.chunking import chunk_documents


def _chunks(spark, texts, **kw):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    rows = chunk_documents(df, **kw).orderBy("id", "chunk_idx").collect()
    out: dict[int, list] = {}
    for r in rows:
        out.setdefault(r["id"], []).append(r)
    return out


def test_empty_and_whitespace_docs_yield_no_chunks(spark):
    got = _chunks(spark, ["", "   ", "a b c"], chunk_size=4, overlap=1)
    assert set(got) == {2}


def test_short_doc_single_chunk(spark):
    (row,) = _chunks(spark, ["a b c"], chunk_size=8, overlap=2)[0]
    assert (row["chunk_idx"], row["chunk_start"], row["chunk_tokens"]) == (0, 0, 3)


def test_exact_chunk_size_is_one_chunk(spark):
    text = " ".join(f"t{i}" for i in range(8))
    rows = _chunks(spark, [text], chunk_size=8, overlap=2)[0]
    assert len(rows) == 1 and rows[0]["chunk_tokens"] == 8


def test_one_token_past_boundary_starts_second_chunk(spark):
    # 9 tokens, chunk 8, overlap 2, stride 6: starts 0 and 6 (6 <= 9-2-1).
    text = " ".join(f"t{i}" for i in range(9))
    rows = _chunks(spark, [text], chunk_size=8, overlap=2)[0]
    assert [(r["chunk_start"], r["chunk_tokens"]) for r in rows] == [(0, 8), (6, 3)]


def test_no_pure_suffix_duplicate_chunk(spark):
    # 10 tokens, chunk 8, overlap 2, stride 6: start 12 never emitted, and the
    # last chunk (start 6) contains tokens 6..9 — tokens 8,9 are new.
    text = " ".join(f"t{i}" for i in range(10))
    rows = _chunks(spark, [text], chunk_size=8, overlap=2)[0]
    starts = [r["chunk_start"] for r in rows]
    assert starts == [0, 6]
    prev_end = starts[0] + rows[0]["chunk_tokens"]
    assert starts[1] + rows[1]["chunk_tokens"] > prev_end or rows[1]["chunk_tokens"] == 0


@pytest.mark.parametrize("n_tokens", [1, 5, 16, 17, 18, 47, 100])
def test_every_token_covered_and_strided(spark, n_tokens):
    chunk_size, overlap = 16, 4
    stride = chunk_size - overlap
    text = " ".join(f"t{i}" for i in range(n_tokens))
    rows = _chunks(spark, [text], chunk_size=chunk_size, overlap=overlap)[0]
    covered = set()
    for r in rows:
        assert r["chunk_start"] == r["chunk_idx"] * stride
        assert 1 <= r["chunk_tokens"] <= chunk_size
        covered.update(range(r["chunk_start"], r["chunk_start"] + r["chunk_tokens"]))
    assert covered == set(range(n_tokens))


def test_keep_text_roundtrip(spark):
    got = _chunks(spark, ["alpha beta gamma delta"], chunk_size=3, overlap=1, keep_text=True)[0]
    assert [r["chunk_text"] for r in got] == ["alpha beta gamma", "gamma delta"]


def test_bad_overlap_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "id int, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=4, overlap=4)


# --- concat-and-chunk packing (concat_chunk_pack / pack_stats) ---------------


def _packed(spark, rows, seq_len=10, shards=1):
    from fs2_kinesis_firehose_spark.operators.chunking import concat_chunk_pack

    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    return concat_chunk_pack(
        df, token_col="n_tokens", key_col="doc_id", seq_len=seq_len, shards=shards
    )


def test_concat_pack_offsets_and_boundaries(spark):
    """Single shard: offsets are the exact prefix sums in key order and
    boundary flags fire exactly when a doc straddles a seq_len cut."""
    rows = [(1, 4), (2, 3), (3, 6), (4, 7), (5, 0)]
    got = {
        r.doc_id: (r.tok_start, r.first_seq, r.last_seq, r.spans_boundary)
        for r in _packed(spark, rows).collect()
    }
    # stream: d1 [0,4) d2 [4,7) d3 [7,13) d4 [13,20) d5 [20,20)
    assert got[1] == (0, 0, 0, False)
    assert got[2] == (4, 0, 0, False)
    assert got[3] == (7, 0, 1, True)     # straddles the 10-token cut
    assert got[4] == (13, 1, 1, False)
    assert got[5] == (20, 2, 2, False)   # empty doc: last == first


def test_concat_pack_sharding_is_md5_stable_and_partitioned(spark):
    """Shard assignment is the portable md5 bucket: re-running and
    repartitioning give identical shards, and per-shard offsets are
    independent prefix sums."""
    rows = [(i, 5) for i in range(40)]
    a = {r.doc_id: (r.shard, r.tok_start) for r in _packed(spark, rows, shards=4).collect()}
    b = {
        r.doc_id: (r.shard, r.tok_start)
        for r in _packed(spark, list(reversed(rows)), shards=4).collect()
    }
    assert a == b
    for s in {v[0] for v in a.values()}:
        offs = sorted(v[1] for v in a.values() if v[0] == s)
        assert offs == [5 * i for i in range(len(offs))]


def test_pack_stats_accounting(spark):
    from fs2_kinesis_firehose_spark.operators.chunking import pack_stats

    rows = [(1, 4), (2, 3), (3, 6), (4, 7), (5, 0)]
    st = pack_stats(
        _packed(spark, rows), token_col="n_tokens", seq_len=10
    ).collect()
    assert len(st) == 1
    r = st[0]
    assert (r.n_docs, r.total_tokens, r.n_sequences, r.pad_tokens, r.boundary_docs) == (
        5, 20, 2, 0, 1,
    )


def test_concat_pack_validates_args(spark):
    import pytest as _pt

    with _pt.raises(ValueError):
        _packed(spark, [(1, 1)], seq_len=0)
    with _pt.raises(ValueError):
        _packed(spark, [(1, 1)], shards=0)
