"""BM25 ranked full-text retrieval over a documents table.

The reference connector moves framed records; a user curating LLM training
data also needs to *query* the corpus — "which documents best match these
terms" — for eval-set construction, targeted sampling, and contamination
triage.  This module implements Okapi BM25 (Robertson et al., TREC-3; the
Lucene-default ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf variant) as a pure
DataFrame plan.

Spark-first shape (scales to a 100 TB corpus):

- The query-term membership filter is applied to the exploded token stream
  BEFORE any shuffle, so only postings for the query's terms leave the scan
  stage — the on-the-fly equivalent of probing an inverted index.  Catalyst
  collapses tokenize→explode→filter into one codegen stage.
- Corpus stats (N, avgdl) are a 1-row aggregate joined back via
  BroadcastNestedLoopJoin; per-term document frequencies are a ≤|query|-row
  aggregate broadcast back.  No cartesian product, no Python, two hash
  shuffles on the doc key total.
- ``bm25_topk`` compiles the final ranking to TakeOrderedAndProject (no
  global sort) with a deterministic (score DESC, key ASC) tie-break.

For a *repeated*-query workload, materialize ``posting_lists`` once (bucketed
by term) and feed it to ``bm25_scores_from_postings`` — the per-query cost is
then a broadcast-semi-join probe of the postings table instead of a corpus
scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.functions import text as T

__all__ = ["posting_lists", "bm25_scores", "bm25_scores_from_postings", "bm25_topk", "rrf_fuse"]


def posting_lists(
    docs: DataFrame, *, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """Materializable inverted-index postings: one row per (term, doc) with
    term frequency and document length.

    One shuffle (groupBy term+doc).  Write this out partitioned/bucketed by
    ``term`` and repeated BM25 queries become pruned probes instead of corpus
    scans.
    """
    # dl is computed at scan time (size of the token array) rather than a
    # window count over the exploded stream — saves a per-doc shuffle.
    return (
        docs.select(
            F.col(key_col),
            F.size(T.tokens(text_col)).alias("dl"),
            F.explode(T.tokens(text_col)).alias("term"),
        )
        .groupBy(key_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """Per-document BM25 score for a bag-of-words query; returns
    ``(key_col, bm25)`` for every document containing ≥1 query term.

    ``round_to`` rounds the final double so the score is stable across
    engines/summation orders (the correctness oracle restates the formula in
    DuckDB).
    """
    terms = [str(t) for t in query_terms]
    if not terms:
        raise ValueError("query_terms must be non-empty")

    base = docs.select(
        F.col(key_col),
        F.size(T.tokens(text_col)).alias("dl"),
        T.tokens(text_col).alias("_toks"),
    )
    # 1-row corpus stats; dl is integer-valued so avg() is bit-exact in any
    # summation order (exact long sum / count) — safe to compare cross-engine.
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    posts = (
        base.select(key_col, "dl", F.explode("_toks").alias("term"))
        .where(F.col("term").isin(terms))  # pre-shuffle: only query postings survive the scan
        .groupBy(key_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return _score_postings(posts, key_col=key_col, k1=k1, b=b, round_to=round_to, stats=stats)


def bm25_scores_from_postings(
    postings: DataFrame,
    query_terms: Sequence[str],
    n_docs: int,
    avgdl: float,
    *,
    key_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """Score against pre-materialized ``posting_lists`` output (the
    repeated-query path): corpus stats are passed in (computed once at index
    build), so the plan is filter→broadcast-df-join→aggregate only."""
    terms = [str(t) for t in query_terms]
    if not terms:
        raise ValueError("query_terms must be non-empty")
    posts = postings.where(F.col("term").isin(terms))
    stats = posts.sparkSession.createDataFrame(
        [(n_docs, float(avgdl))], "n_docs bigint, avgdl double"
    )
    return _score_postings(posts, key_col=key_col, k1=k1, b=b, round_to=round_to, stats=stats)


def _score_postings(
    posts: DataFrame, *, key_col: str, k1: float, b: float, round_to: int, stats: DataFrame
) -> DataFrame:
    dfs = posts.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        posts.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(stats))  # 1 row → BroadcastNestedLoopJoin, not CartesianProduct
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))),
        )
    )
    return scored.groupBy(key_col).agg(F.round(F.sum("contrib"), round_to).alias("bm25"))


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """Top-k BM25 retrieval with a deterministic tie-break (rounded score
    DESC, then key ASC).  Compiles to TakeOrderedAndProject — per-partition
    heaps + a k-row merge on the driver, never a global sort."""
    scores = bm25_scores(
        docs, query_terms, text_col=text_col, key_col=key_col, k1=k1, b=b, round_to=round_to
    )
    return scores.orderBy(F.desc("bm25"), F.asc(key_col)).limit(k)


def rrf_fuse(
    rankings: Sequence[DataFrame],
    *,
    key_col: str = "doc_id",
    rrf_k: int = 60,
    top_n: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of ≥2 candidate
    lists: ``score(d) = Σ_r 1/(rrf_k + rank_r(d))`` — the standard way to
    combine lexical (BM25) and dense (embedding-cosine) retrieval without
    score calibration.

    Each input DataFrame must be ``(key_col, <score>)`` with exactly one
    non-key column; ranks are assigned 1-based by (score DESC, key ASC) — the
    same deterministic tie-break as ``bm25_topk`` / ``brute_force_topk``.
    Documents absent from a list simply contribute nothing for it (standard
    RRF).

    CONTRACT: inputs are pre-truncated top-N candidate lists (the practical
    RRF shape), NOT corpus-sized tables — each ranking is globally ordered
    with a single-partition window, which is O(N log N) on one task and only
    sane because N is small.  Truncate upstream (TakeOrderedAndProject)
    first; this operator fuses candidates, it does not rank the corpus.

    Each ranking must be UNIQUE per key (one row per candidate): a ranking
    with duplicate keys would silently contribute several 1/(k+rank) terms
    for one document and inflate its fused score.  The check is LAZY and
    in-plan — the fusing aggregate also counts rows vs distinct ranking ids
    per key and ``raise_error``s on a mismatch at execution time — so plan
    construction triggers ZERO Spark jobs and never forces the (possibly
    expensive, un-cached) candidate pipelines to run twice.
    """
    from pyspark.sql.window import Window

    if len(rankings) < 2:
        raise ValueError("rrf_fuse needs >= 2 rankings")
    contribs = []
    for idx, r in enumerate(rankings):
        others = [c for c in r.columns if c != key_col]
        if len(others) != 1:
            raise ValueError(
                f"each ranking must be (key, score); got columns {r.columns}"
            )
        w = Window.orderBy(F.desc(others[0]), F.asc(key_col))
        contribs.append(
            r.select(
                F.col(key_col),
                F.lit(idx).alias("_ridx"),
                (F.lit(1.0) / (F.lit(rrf_k) + F.row_number().over(w))).alias("c"),
            )
        )
    fused = contribs[0]
    for c in contribs[1:]:
        fused = fused.unionByName(c)
    # duplicate-key guard folded into the ONE fusing aggregate: a key with
    # more contribution rows than distinct ranking ids was duplicated inside
    # some ranking → fail loudly when the plan actually runs
    agg = fused.groupBy(key_col).agg(
        F.round(F.sum("c"), round_to).alias("rrf_score"),
        F.count(F.lit(1)).alias("_n"),
        F.count_distinct("_ridx").alias("_nd"),
        F.array_sort(F.collect_list("_ridx")).alias("_rids"),
    )
    out = agg.select(
        F.col(key_col),
        F.when(
            F.col("_n") > F.col("_nd"),
            F.raise_error(
                F.concat(
                    F.lit("rrf_fuse: duplicate key "),
                    F.col(key_col).cast("string"),
                    F.lit(" within a ranking (contributing ranking ids: "),
                    F.col("_rids").cast("string"),
                    F.lit(
                        " — a repeated id is the offender): aggregate to "
                        "one row per candidate before fusing"
                    ),
                )
            ).cast("double"),
        )
        .otherwise(F.col("rrf_score"))
        .alias("rrf_score"),
    )
    if top_n is not None:
        out = out.orderBy(F.desc("rrf_score"), F.asc(key_col)).limit(top_n)
    return out
