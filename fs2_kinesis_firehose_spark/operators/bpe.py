"""BPE tokenizer training and application (Sennrich et al. 2016, public
algorithm) — the tokenizer-training stage of an LLM data pipeline.

Scale architecture: the CORPUS-sized work (word counting) is one distributed
scan + aggregate; the merge loop then runs over the WORD-FREQUENCY table,
which is vocabulary-sized (bounded further by ``min_count``) — metadata, not
data, exactly like IVF centroid training.  This is how production BPE
trainers work: no pass over the corpus per merge.

Application (``bpe_segment``) is an Arrow-batched pandas UDF with a
per-batch word cache — each DISTINCT word in a batch is segmented once, so
the per-row cost on natural text (Zipfian words) is a dict lookup.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.functions import text as T

END = "</w>"


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 5,
    max_vocab: int | None = 1_000_000,
) -> DataFrame:
    """(w, n) word-frequency table with the driver-collect bound enforced
    DISTRIBUTIVELY: words below ``min_count`` drop first, then only the top
    ``max_vocab`` by (count desc, word asc — deterministic tie-break) survive
    via orderBy+limit (TakeOrdered: per-partition top-k, driver merges k×P
    rows).  Without the cap, a 100 TB web corpus has 10⁸–10⁹ distinct tokens
    and the collect that follows is a driver OOM; with it, the collect is
    O(max_vocab) regardless of corpus cardinality."""
    counts = (
        df.select(F.explode(T.tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    if max_vocab is not None:
        counts = counts.orderBy(F.col("n").desc(), F.col("w").asc()).limit(max_vocab)
    return counts


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 50,
    min_count: int = 5,
    max_vocab: int | None = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Deterministic: the best pair each round is the most frequent, ties
    broken by lexicographic order — stable across partitionings and runs.
    The driver payload is bounded at O(min(effective vocabulary, max_vocab))
    by ``word_frequencies``: ``min_count`` (default 5 — web-scale corpora
    have unbounded hapax counts) prunes rare words and ``max_vocab`` caps the
    collect distributively, both BEFORE any row reaches the driver."""
    word_counts = {
        r.w: r.n
        for r in word_frequencies(
            df, text_col, min_count=min_count, max_vocab=max_vocab
        ).collect()
    }
    vocab: dict[tuple[str, ...], int] = {
        tuple(list(w) + [END]): n for w, n in word_counts.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def _segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col: array<string>`` — the text segmented with the
    learned merges (lowest-rank merge applied first, the standard BPE
    inference order)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @pandas_udf(ArrayType(StringType()))
    def seg(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def run(text):
            if text is None:
                return []
            out: list[str] = []
            for w in text.split():
                if w not in cache:
                    cache[w] = _segment_word(w, ranks)
                out.extend(cache[w])
            return out

        return pd.Series([run(t) for t in texts])

    return df.withColumn(out_col, seg(F.col(text_col)))
