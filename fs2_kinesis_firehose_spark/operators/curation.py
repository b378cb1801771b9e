"""Training-data curation operators: deterministic splits, source mixing,
PII redaction, sequence packing.

These are the pipeline stages between "deduplicated corpus" and "training
batches" (north-star Tier C surface; no reference analog — the reference is a
delivery pipe, fs2-kinesis-firehose has no curation layer).

Engine-portability: the split/sample operators derive randomness from
``md5`` — available and bit-identical in Spark and DuckDB — so every
assignment is reproducible across engines, partitionings, and retries
(rand()/xxhash64 would be Spark-specific).  At 100 TB all of these are pure
codegen projections/filters (no shuffle) except ``pack_sequences``, which
shuffles once on the packing group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_SPACE = float(1 << 32)  # first 8 md5 hex chars → uniform over 2^32


def hash_fraction(col: Column | str, salt: str = "") -> Column:
    """Deterministic uniform [0, 1) from a key column: first 32 bits of
    ``md5(key || salt)``.  Same expression is expressible in any SQL engine
    with md5 — the engine-portable analog of ``rand(seed)``."""
    c = F.col(col) if isinstance(col, str) else col
    bits = F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 8), 16, 10
    ).cast("double")
    return bits / F.lit(HASH_SPACE)


def deterministic_split(
    df: DataFrame,
    key_col: str = "doc_id",
    *,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Append a ``split`` column assigning each row to a named split with the
    given weights (must sum to ~1).  Assignment depends only on (key, salt):
    stable under repartitioning, retries, incremental re-runs — the property
    train/val leakage audits need and ``randomSplit`` does not have."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    frac = hash_fraction(key_col, salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        # round the cumulative boundary so 0.8+0.1 is literally 0.9 — the
        # oracle SQL writes the same decimal constant, and a 1-ulp boundary
        # mismatch would misroute rows whose hash lands in the sliver
        cum = round(cum + weights[name], 9)
        expr = F.when(frac < cum, name) if expr is None else expr.when(frac < cum, name)
    expr = F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def weighted_source_sample(
    df: DataFrame,
    weights: dict[str, float],
    *,
    source_col: str = "source",
    key_col: str = "doc_id",
    default_weight: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Down-sample per source to the given keep-fractions (corpus mixing:
    e.g. keep 100%% of books, 30%% of crawl).  Pure filter — no shuffle; the
    keep decision is a deterministic function of (key, salt)."""
    w = F.lit(float(default_weight))
    for src, frac in sorted(weights.items()):
        w = F.when(F.col(source_col) == src, float(frac)).otherwise(w)
    return df.filter(hash_fraction(key_col, salt) < w)


def stratified_sample(
    df: DataFrame,
    *,
    group_col: str,
    n_per_group: int,
    key_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exactly ``n_per_group`` rows per group (fewer if the group is
    smaller), chosen deterministically: rank by md5-hash fraction within the
    group and keep the lowest ``n``.  Equivalent to a seeded uniform
    reservoir sample but stable across engines, partitionings, and re-runs.
    One shuffle on the group key."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(hash_fraction(key_col, salt), key_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------
# RE2-safe patterns (no lookaround) that behave identically in Spark and
# DuckDB regexp functions.  Order matters: SSN/IP before PHONE (digit runs).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``redacted`` (text with PII replaced by typed tokens) and a
    ``n_<kind>`` count column per pattern.  All pure regexp Column
    expressions — scan-speed at any scale."""
    out = df
    redacted = F.col(text_col)
    for kind, pattern, token in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}", F.size(F.regexp_extract_all(redacted, F.lit(pattern), 0))
        )
        redacted = F.regexp_replace(redacted, pattern, token)
    return out.withColumn("redacted", redacted)


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------
def pack_sequences(
    df: DataFrame,
    *,
    budget: int,
    group_col: str = "lang",
    key_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Next-fit sequence packing: within each group (docs ordered by key),
    append docs to the current sequence until the next one would exceed
    ``budget`` tokens, then start a new sequence.  Returns
    (group, key, tokens, seq_id).

    The running bin id is a data-dependent reset — not a window expression —
    so each group is packed in an Arrow-batched ``applyInPandas`` with an
    O(n) loop (sequential by nature; the parallelism axis is groups, exactly
    how sessionization scales).  A doc larger than ``budget`` gets a
    sequence of its own rather than being dropped (the packer's contract is
    lossless; oversize handling belongs upstream).
    """
    out_schema = (
        f"{group_col} {df.schema[group_col].dataType.simpleString()}, "
        f"{key_col} {df.schema[key_col].dataType.simpleString()}, "
        f"{tokens_col} bigint, seq_id bigint"
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(key_col).reset_index(drop=True)
        seq_ids = []
        seq, fill = 1, 0
        for n in pdf[tokens_col].astype(int):
            if fill > 0 and fill + n > budget:
                seq += 1
                fill = n
            else:
                fill += n
            seq_ids.append(seq)
        pdf = pdf[[group_col, key_col, tokens_col]].copy()
        pdf[tokens_col] = pdf[tokens_col].astype("int64")
        pdf["seq_id"] = seq_ids
        return pdf

    return (
        df.select(group_col, key_col, F.col(tokens_col).cast("bigint").alias(tokens_col))
        .groupBy(group_col)
        .applyInPandas(pack, out_schema)
    )
