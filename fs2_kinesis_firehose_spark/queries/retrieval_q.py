"""Ranked-retrieval queries: BM25 over the ``documents`` table.

The oracle restates Okapi BM25 (Lucene-default idf) in DuckDB over the same
whitespace tokenization the Spark side uses.  Constants are formatted with
``repr`` so both engines parse the identical double; ``dl`` is integer-valued
so ``avg(dl)`` is bit-exact cross-engine; the final score is rounded to 4
decimals to absorb last-ulp ``ln`` differences between libm and the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fs2_kinesis_firehose_spark.operators import retrieval
from fs2_kinesis_firehose_spark.queries import query
from fs2_kinesis_firehose_spark.tables import load_table

# Fixed bag-of-words query over the fixture vocabulary.
_QUERY_TERMS = ["hash", "join", "filter", "vector"]
_K = 20
_K1 = 1.2
_B = 0.75

_terms_sql = ", ".join(f"'{t}'" for t in _QUERY_TERMS)


@query(
    "bm25_topk",
    # string_split_regex('\\s+') matches functions/text.tokens exactly (split
    # on any whitespace run), not just single spaces — r4 ADVICE.
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs, AVG(len(t)) AS avgdl FROM toks
    ),
    posts AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks)
        WHERE term IN ({_terms_sql})
        GROUP BY doc_id, dl, term
    ),
    dfs AS (SELECT term, COUNT(*) AS df FROM posts GROUP BY term)
    SELECT p.doc_id,
           ROUND(SUM(
               LN(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
               * (p.tf * {_K1 + 1.0!r})
               / (p.tf + {_K1!r} * ({1.0 - _B!r} + {_B!r} * p.dl / s.avgdl))
           ), 4) AS bm25
    FROM posts p
    JOIN dfs f USING (term)
    CROSS JOIN stats s
    GROUP BY p.doc_id
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT {_K}
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for a fixed 4-term query: postings filtered to the
    query terms before the first shuffle, df/stats broadcast back, ranking
    via TakeOrderedAndProject with (score DESC, doc_id ASC) tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    return retrieval.bm25_topk(
        docs, _QUERY_TERMS, k=_K, k1=_K1, b=_B, round_to=4
    )


# Second fixed query for the materialized-postings path — different terms so
# the two BM25 rows exercise different postings.
_PQUERY_TERMS = ["sort", "merge", "shuffle"]


@query(
    "bm25_postings_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs, AVG(len(t)) AS avgdl FROM toks
    ),
    postings AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks)
        GROUP BY doc_id, dl, term
    ),
    posts AS (
        SELECT * FROM postings WHERE term IN ({", ".join(f"'{t}'" for t in _PQUERY_TERMS)})
    ),
    dfs AS (SELECT term, COUNT(*) AS df FROM posts GROUP BY term)
    SELECT p.doc_id,
           ROUND(SUM(
               LN(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
               * (p.tf * {_K1 + 1.0!r})
               / (p.tf + {_K1!r} * ({1.0 - _B!r} + {_B!r} * p.dl / s.avgdl))
           ), 4) AS bm25
    FROM posts p
    JOIN dfs f USING (term)
    CROSS JOIN stats s
    GROUP BY p.doc_id
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT {_K}
    """,
)
def bm25_postings_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repeated-query path end-to-end under the driver: ``posting_lists``
    is materialized once (localCheckpoint — the stand-in for the bucketed
    parquet write), corpus stats (N, avgdl) are computed at index build as a
    bounded 1-row collect, and the query itself runs purely against the index
    via ``bm25_scores_from_postings`` (filter → broadcast-join → aggregate;
    the corpus text is never re-scanned)."""
    from pyspark.sql import functions as F

    from fs2_kinesis_firehose_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    index = retrieval.posting_lists(docs).localCheckpoint(eager=False)
    n_docs, avgdl = docs.agg(
        F.count(F.lit(1)), F.avg(F.size(T.tokens("text")))
    ).collect()[0]
    scores = retrieval.bm25_scores_from_postings(
        index, _PQUERY_TERMS, n_docs, avgdl, k1=_K1, b=_B, round_to=4
    )
    return scores.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(_K)
