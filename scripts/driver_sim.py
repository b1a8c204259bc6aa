#!/usr/bin/env python
"""Driver simulator: replicate the grading driver's correctness pass.

Vanilla (untuned) SparkSession, fresh import of __spark_entry__, every
declared query run at sf0.01 and value-compared (order-insensitive,
columns sorted by name) against its DuckDB oracle. Exit 0 iff all match.
"""

from __future__ import annotations

import math
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return repr(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.12g}"
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    import decimal

    if isinstance(v, decimal.Decimal):
        return f"{float(v):.12g}"
    return repr(v)


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    import duckdb

    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    rows = e.entry(spark).collect()
    print(f"entry: {len(rows)} rows")
    assert len(rows) > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs, osql = e.queries(), e.oracle_sql()
    bad, rows_only = [], []
    for name, fn in sorted(qs.items()):
        sdf = fn(spark, SF)
        if name not in osql:
            n = sdf.count()
            rows_only.append(name)
            print(f"{name}: rows-only ({n} rows)")
            continue
        srows = [tuple(norm(r[c]) for c in sorted(sdf.columns)) for r in sdf.collect()]
        rel = con.execute(osql[name])
        dcols = [d[0] for d in rel.description]
        idx = sorted(range(len(dcols)), key=lambda i: dcols[i])
        drows = [tuple(norm(r[i]) for i in idx) for r in rel.fetchall()]
        if sorted(sdf.columns) != sorted(dcols):
            bad.append(name)
            print(f"{name}: COLUMN MISMATCH {sorted(sdf.columns)} vs {sorted(dcols)}")
        elif sorted(srows) != sorted(drows):
            bad.append(name)
            s, d = sorted(srows), sorted(drows)
            diff = next(((a, b) for a, b in zip(s, d) if a != b),
                        (len(s), len(d)))
            print(f"{name}: VALUE MISMATCH ({len(s)} vs {len(d)} rows) first diff: {diff}")
        else:
            print(f"{name}: OK ({len(srows)} rows)")
    print(f"\n{len(qs) - len(bad) - len(rows_only)}/{len(qs)} oracle-matched, "
          f"{len(rows_only)} rows-only, {len(bad)} failed")
    print("ALL MATCH" if not bad else f"FAILED: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
