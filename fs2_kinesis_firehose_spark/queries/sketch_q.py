"""Registered queries for the mergeable-sketch operators (operators/sketches.py).

``heavy_hitter_bigrams`` runs the FULL two-pass Misra–Gries pipeline over
the documents corpus — per-partition sketches (mapInPandas), merge, global
compress to k=800 counters (below the fixture's 916 distinct bigrams, so
the compress path genuinely executes at every SF), broadcast recount,
phi·n cut.  Because pass 2 recounts exactly, the OUTPUT is deterministic
and independent of every sketch internal — which is why a plain
GROUP BY/HAVING oracle can check the whole pipeline end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.functions.text import tokens, word_ngram_rows
from fs2_kinesis_firehose_spark.operators import sketches as SK
from fs2_kinesis_firehose_spark.queries import query
from fs2_kinesis_firehose_spark.tables import load_table

_PHI = 0.00125
_K = 800  # == ceil(1/phi): minimum counter budget; forces real compression


@query(
    "heavy_hitter_bigrams",
    oracle=f"""
    WITH w AS (
        SELECT string_split_regex(trim(text), '\\s+') AS words FROM documents
    ),
    big AS (
        SELECT unnest([words[i] || ' ' || words[i + 1]
                       FOR i IN range(1, len(words))]) AS bigram
        FROM w
    ),
    tot AS (SELECT COUNT(*) AS n FROM big)
    SELECT bigram, COUNT(*) AS cnt
    FROM big, tot
    GROUP BY bigram, n
    HAVING COUNT(*) >= CEIL({_PHI} * n)
    """,
)
def heavy_hitter_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bigrams = word_ngram_rows(docs, "text", "doc_id", 2, distinct=False, out_col="bg")
    # total bigram count at SCAN speed (size(tokens)-1 per doc, no explode,
    # no window shuffle) instead of a third evaluation of the gram build;
    # the empty-text phantom token yields size=1 → 0 grams, matching
    # word_ngram_rows' contract.
    totals = docs.agg(
        F.sum(F.greatest(F.size(tokens("text")) - 1, F.lit(0))).cast("long").alias("n")
    )
    return (
        SK.heavy_hitters(bigrams, "bg", _PHI, k=_K, totals=totals)
        .withColumnRenamed("item", "bigram")
    )
