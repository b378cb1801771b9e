"""Document chunking — sliding token windows for context-length-bounded models.

A core training-data op the reference has no analog for (its unit of work is
an opaque byte record, `RecordOps.scala:26`): long documents are cut into
overlapping chunks of at most ``chunk_size`` tokens with stride
``stride = chunk_size - overlap``, BERT-style.  Chunk starts are
``0, stride, 2*stride, ...`` and generation stops once a chunk's start would
leave only already-covered tokens (``start >= n - overlap`` for start > 0),
so every token is covered and no trailing chunk is a pure suffix-duplicate
of its predecessor.

Scale design: the whole expansion is built-in Column expressions
(``split`` → ``sequence`` → ``transform`` → ``explode``) — JVM-side,
whole-stage-codegen, zero Python.  Per-row output is O(n_tokens / stride)
chunks; there is NO shuffle at all (narrow maps only), so the op runs at
scan speed on any corpus size and parallelism is file-split-driven.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    *,
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 16,
    keep_text: bool = False,
) -> DataFrame:
    """Explode each document into sliding whitespace-token chunks.

    Output columns (appended to the input's non-text columns):
    ``chunk_idx`` (0-based), ``chunk_start`` (token offset), ``chunk_tokens``
    (token count in this chunk) and ``chunk_hash`` (md5 of the
    space-rejoined chunk — engine-portable identity for downstream dedup);
    ``chunk_text`` only when ``keep_text`` (it multiplies output bytes by
    ~1/stride-overlap and is rarely needed once hashed).

    Empty / whitespace-only documents yield zero chunks (they carry no
    tokens to cover).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap=} {chunk_size=}")
    stride = chunk_size - overlap

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = F.when(F.trim(F.col(text_col)) == "", F.array().cast("array<string>")).otherwise(toks)
    n = F.size(toks)

    # starts = [0, stride, ...] up to the last start that still contributes
    # uncovered tokens: start <= n - overlap - 1 (and always 0 for n > 0).
    last_start = F.greatest(n - F.lit(overlap + 1), F.lit(0))
    starts = F.sequence(F.lit(0), last_start, F.lit(stride))

    chunk = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.slice(toks, s + 1, chunk_size).alias("toks"),
        ),
    )

    base = df.withColumn("_toks_n", n).withColumn("_chunks", chunk)
    out = (
        base.filter(F.col("_toks_n") > 0)
        .select(
            *[c for c in df.columns if c != text_col],
            F.posexplode("_chunks").alias("chunk_idx", "_c"),
        )
        .select(
            *[c for c in df.columns if c != text_col],
            "chunk_idx",
            F.col("_c.start").alias("chunk_start"),
            F.size("_c.toks").alias("chunk_tokens"),
            F.md5(F.concat_ws(" ", "_c.toks")).alias("chunk_hash"),
            *([F.concat_ws(" ", "_c.toks").alias("chunk_text")] if keep_text else []),
        )
    )
    return out
