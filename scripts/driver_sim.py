#!/usr/bin/env python
"""Driver simulator: replicate the grading driver's correctness pass.

Faithful to the driver's *pandas* canonicalizer (learned from r1):

* both sides go through pandas (``sdf.toPandas()`` with Arrow enabled,
  ``rel.df()``) — so a DuckDB HUGEINT that pandas widens to float64
  MISMATCHES a Spark bigint, exactly as the driver's value-hash does
  (r1: ``ingest_expectations``/``ingest_variant_payload``);
* values are compared with a type tag (integer vs float vs other), so
  ``0`` != ``0.0``;
* an array/list-valued output column on an oracle-checked query is an
  ERROR, mirroring the driver's ``unhashable type: 'list'`` death on
  ``multimodal_features`` in r1.

Vanilla (untuned) SparkSession, fresh import of __spark_entry__, every
declared query run at sf0.01 and value-compared (order-insensitive,
columns sorted by name) against its DuckDB oracle. Exit 0 iff all match.
"""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def norm(v):
    """Type-tagged canonical string for one cell (pandas-shaped values)."""
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NULL" if math.isnan(f) else f"f:{f:.12g}"
    if isinstance(v, pd.Timestamp):
        return f"t:{v.isoformat()}"
    if isinstance(v, datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, date):
        return f"t:{v.isoformat()}T00:00:00"
    if isinstance(v, (list, tuple, np.ndarray)):
        raise TypeError("unhashable type: 'list'")  # the driver dies here too
    import decimal

    if isinstance(v, decimal.Decimal):
        return f"f:{float(v):.12g}"
    return repr(v)


def canon(pdf, cols):
    """Sorted-row tuples over name-sorted columns, driver-style."""
    out = []
    for _, r in pdf[cols].iterrows():
        out.append(tuple(norm(x) for x in r))
    out.sort()
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    import duckdb

    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # the grading driver's canonicalizer is pandas-based; Arrow gives the
    # same int-with-nulls -> float64 widening on the Spark side as
    # duckdb's .df() does on the oracle side
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    rows = e.entry(spark).collect()
    print(f"entry: {len(rows)} rows")
    assert len(rows) > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    only = sys.argv[1:]  # optional: restrict to named queries
    qs, osql = e.queries(), e.oracle_sql()
    bad, rows_only = [], []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF)
            if name not in osql:
                n = sdf.count()
                rows_only.append(name)
                print(f"{name}: rows-only ({n} rows)")
                continue
            spdf = sdf.toPandas()
            dpdf = con.execute(osql[name]).df()
            scols, dcols = sorted(spdf.columns), sorted(dpdf.columns)
            if scols != dcols:
                bad.append(name)
                print(f"{name}: COLUMN MISMATCH {scols} vs {dcols}")
                continue
            srows, drows = canon(spdf, scols), canon(dpdf, dcols)
        except Exception as ex:  # driver records an error row
            bad.append(name)
            print(f"{name}: ERROR {type(ex).__name__}: {ex}")
            continue
        if srows != drows:
            bad.append(name)
            diff = next(((a, b) for a, b in zip(srows, drows) if a != b),
                        (len(srows), len(drows)))
            print(f"{name}: VALUE MISMATCH ({len(srows)} vs {len(drows)} rows) "
                  f"first diff: {diff}")
        else:
            print(f"{name}: OK ({len(srows)} rows)")
    n_run = (len(qs) if not only else len(only))
    print(f"\n{n_run - len(bad) - len(rows_only)}/{n_run} oracle-matched, "
          f"{len(rows_only)} rows-only, {len(bad)} failed")
    print("ALL MATCH" if not bad else f"FAILED: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
