"""Local replica of the driver's DuckDB-oracle comparison.

Runs a declared Spark query and its oracle SQL side by side and compares
row count, column-name set, and an order-insensitive value comparison
(rows sorted by their full stringified tuple — a stand-in for the
driver's value hash).  Catches parity bugs before the driver does.
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

from data_ingestion_system_spark.catalog import TABLES

REL_TOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    try:  # Decimal and friends
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
    except Exception:
        pass
    return repr(v)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    """Raise AssertionError with a diff summary if Spark and DuckDB disagree."""
    spark_rows = spark_df.collect()
    spark_cols = list(spark_df.columns)

    rel = con.execute(sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])

    s_norm = sorted(tuple(_norm(r[i]) for i in order) for r in spark_rows)
    d_norm = sorted(tuple(_norm(r[i]) for i in dorder) for r in duck_rows)

    mism = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first: {mism[0]}"
