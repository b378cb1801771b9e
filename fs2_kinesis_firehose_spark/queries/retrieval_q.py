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
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
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
