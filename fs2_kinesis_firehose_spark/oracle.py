"""Local mirror of the driver's DuckDB-oracle correctness gate.

The driver runs each registered Spark query and its oracle SQL side-by-side at
sf=0.01 and compares row-count + schema + order-insensitive value hash.  This
module reproduces that comparison locally so every query is validated *before*
the driver sees it (tests/test_oracle_parity.py parametrizes over the registry).
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from fs2_kinesis_firehose_spark.tables import TABLE_NAMES, table_path

ORACLE_SF_DIR = "/root/testdata/sf0.01"


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with the fixture tables registered as views
    (mirrors the driver's pre-registration)."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _canon_cell(v: object) -> object:
    """Canonicalize a cell for order-insensitive comparison."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NaN"
        # exact doubles compare via repr; queries round explicitly where
        # engine-order-dependent float aggregation could differ
        return repr(v)
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(str(_canon_cell(x)) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, bool):
        return f"bool:{v}"
    return v if isinstance(v, str) else str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return rows


@dataclass
class CompareResult:
    name: str
    spark_rows: int
    oracle_rows: int
    match: bool
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK" if self.match else "MISMATCH"
        extra = "" if self.match else "; ".join(self.mismatches[:5])
        return f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows} {extra}"


def compare_query(spark: SparkSession, name: str, sf_dir: str = ORACLE_SF_DIR) -> CompareResult:
    from fs2_kinesis_firehose_spark import queries as q

    q.load_all()
    spark_pdf = q.QUERIES[name](spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(q.ORACLES[name]).fetch_df()
    finally:
        con.close()

    mismatches: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        mismatches.append(
            f"schema: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
    if len(spark_pdf) != len(oracle_pdf):
        mismatches.append("row count differs")
    if not mismatches:
        s_rows, o_rows = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
        if s_rows != o_rows:
            diffs = [
                f"row {i}: spark={s} oracle={o}"
                for i, (s, o) in enumerate(zip(s_rows, o_rows))
                if s != o
            ]
            mismatches.append(f"{len(diffs)} differing rows")
            mismatches.extend(diffs[:4])
    return CompareResult(
        name=name,
        spark_rows=len(spark_pdf),
        oracle_rows=len(oracle_pdf),
        match=not mismatches,
        mismatches=mismatches,
    )
