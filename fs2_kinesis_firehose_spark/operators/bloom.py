"""Distributed Bloom filter: build over a key column, apply as a semi-join
prefilter — the runtime-filter pattern for pruning a huge fact table by a
dimension key set that is too large to broadcast as a hash set but fits
easily as bits (1 M keys ≈ 1.2 MB at 10 bits/key vs ~100 MB of boxed longs).

Build: positions are computed JVM-side (``xxhash64(key, seed_i)`` per hash
function — codegen, no Python in the scan), per-partition bitmaps are OR'd
in one Arrow pass and emitted as their NON-ZERO 64-bit words ``(i, w)``;
a JVM-side ``bit_or`` hash aggregate folds the words across partitions, so
driver traffic is exactly ONE bitmap (≤ n_bits/64 word rows) no matter how
many tasks ran — a 10k-task build of a 1e9-key-scale bitmap collects the
same ~n_bits/8 bytes a 2-task build does.  (The earlier one-level fold
collected P whole bitmaps, a driver choke point at large P.)  Sparse
partitions emit only their set words, so shuffle volume is
``min(keys·n_hashes, bitmap)`` per partition, with the distributed
aggregate absorbing the P-way fan-in.

Apply: positions again JVM-side; the membership test is one vectorized
Arrow batch op against the (task-shipped) bitmap.  No false negatives —
every true key passes — so ``prefilter → exact join`` returns exactly the
plain join's rows; false positives only waste a little post-filter work
(rate ≈ (1 − e^{−kn/m})^k).  This is the same trick Spark's own runtime
row-group filtering plays, exposed as an operator the user can aim at any
fact/dim pair.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_prefilter", "expected_fpp"]


def _positions(key_col: str | Column, n_bits: int, n_hashes: int) -> Column:
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.array(
        *[F.pmod(F.xxhash64(c, F.lit(i)), F.lit(n_bits)) for i in range(n_hashes)]
    )


def _word_rows(
    df: DataFrame, key_col: str, *, n_bits: int, n_hashes: int
) -> DataFrame:
    """Folded bitmap as non-zero 64-bit words ``(i long, w long)``: one
    Arrow pass builds a per-partition bitmap and emits its set words; a
    JVM-side ``bit_or`` aggregate ORs them across partitions.  Row count is
    ≤ n_bits/64 and independent of the task count — this is the
    driver-bounded fold ``bloom_build`` collects (exposed separately so
    tests can pin the bound)."""
    n_bytes = n_bits // 8
    n_words = (n_bytes + 7) // 8  # bitmap padded to whole 64-bit words

    pos = (
        df.where(F.col(key_col).isNotNull())
        .select(F.explode(_positions(key_col, n_bits, n_hashes)).alias("p"))
    )

    def to_words(batches):
        bm = np.zeros(n_words * 8, dtype=np.uint8)
        for pdf in batches:
            p = pdf["p"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(bm, p >> 3, (1 << (p & 7)).astype(np.uint8))
        w = bm.view(np.int64)
        nz = np.flatnonzero(w)
        yield pd.DataFrame({"i": nz.astype(np.int64), "w": w[nz]})

    return (
        pos.mapInPandas(to_words, "i long, w long")
        .groupBy("i")
        .agg(F.bit_or("w").alias("w"))
    )


def bloom_build(
    df: DataFrame, key_col: str, *, n_bits: int = 1 << 20, n_hashes: int = 5
) -> bytes:
    """Build the bitmap over ``df[key_col]`` (NULLs ignored).  Returns
    ``n_bits/8`` bytes.  Distributed: one narrow scan + one Arrow pass +
    one word-level ``bit_or`` aggregate; the driver collects at most
    ``n_bits/64`` word rows (one bitmap's worth), independent of the
    partition count."""
    if n_bits % 8:
        raise ValueError("n_bits must be a multiple of 8")
    n_bytes = n_bits // 8
    n_words = (n_bytes + 7) // 8

    out = np.zeros(n_words, dtype=np.int64)
    for row in _word_rows(df, key_col, n_bits=n_bits, n_hashes=n_hashes).collect():
        out[row["i"]] = row["w"]
    return out.view(np.uint8)[:n_bytes].tobytes()


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    bitmap: bytes,
    *,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Keep rows whose key MAY be in the built set (plus NULL-free).  Use
    before the exact join; never instead of it (false positives)."""
    from pyspark.sql.pandas.functions import pandas_udf

    bm = np.frombuffer(bitmap, dtype=np.uint8)
    if len(bm) * 8 != n_bits:
        raise ValueError(f"bitmap has {len(bm) * 8} bits, expected {n_bits}")

    @pandas_udf("boolean")
    def member(pos: pd.Series) -> pd.Series:
        if pos.empty:
            return pd.Series([], dtype=bool)
        arr = np.vstack(pos.to_numpy()).astype(np.int64)  # rows × n_hashes
        bits = (bm[arr >> 3] >> (arr & 7).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1))

    return df.where(
        F.col(key_col).isNotNull()
        & member(_positions(key_col, n_bits, n_hashes))
    )


def expected_fpp(n_keys: int, n_bits: int, n_hashes: int) -> float:
    """Textbook false-positive-probability estimate (for sizing)."""
    return (1.0 - math.exp(-n_hashes * n_keys / n_bits)) ** n_hashes
