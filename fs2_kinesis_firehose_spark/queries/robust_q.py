"""Robust-statistics queries (late round 7).

``mad_event_outliers`` runs Hampel-rule outlier accounting
(|x − median| > 3·MAD, discrete lower medians) per event_type over the
events stream — the exact companion to ``kll_doclen_quantiles``'s
approximate path.  The oracle replays the identical order-statistic
construction with window functions, so every count and both medians must
match bit-for-bit (no interpolation anywhere — see operators/robust.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fs2_kinesis_firehose_spark.operators.robust import mad_outlier_stats
from fs2_kinesis_firehose_spark.queries import query
from fs2_kinesis_firehose_spark.tables import load_table

_C = 3.0


@query(
    "mad_event_outliers",
    oracle=f"""
    WITH v AS (
        SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM v
    ),
    med AS (SELECT event_type, value AS median FROM r WHERE rn = (n + 1) // 2),
    d AS (
        SELECT v.event_type, v.value, med.median,
               ABS(v.value - med.median) AS dev
        FROM v JOIN med USING (event_type)
    ),
    r2 AS (
        SELECT event_type, dev,
               row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM d
    ),
    mad AS (SELECT event_type, dev AS mad FROM r2 WHERE rn = (n + 1) // 2)
    SELECT d.event_type,
           COUNT(*) AS n,
           MAX(d.median) AS median,
           MAX(mad.mad) AS mad,
           CAST(SUM(CASE WHEN d.dev > {_C} * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d JOIN mad USING (event_type)
    GROUP BY d.event_type
    """,
)
def mad_event_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return mad_outlier_stats(events, "event_type", "value", c=_C)
