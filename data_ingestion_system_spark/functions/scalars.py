"""Scalar utility expressions closing out SURVEY §2's long tail.

* **UUID generation (O-42)** — the reference mints v4 transaction ids
  client-side (``src/scripts/benchmark.ts:2,18``); here it's Spark's
  codegen'd ``uuid()`` expression, evaluated row-parallel with no Python
  and no coordination (each executor draws from its own RNG stream —
  the property that makes UUIDs the right distributed id: no sequence
  bottleneck to shard).
* **byte-size pretty-print (O-44)** — the reference formats throughput
  numbers for its benchmark report (``src/scripts/benchmark.ts:62-66``);
  a pure CASE ladder over binary magnitudes, deterministic and
  engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_uuid(df: DataFrame, col_name: str = "record_uuid") -> DataFrame:
    """Attach an RFC-4122 v4 id per row (O-42).

    ``uuid()`` is JVM-side and per-row independent, so id minting scales
    with the scan and never shuffles.  Non-deterministic BY DESIGN (two
    runs mint different ids) — downstream exactly-once paths must key on
    content ids, not minted ids; tests assert format and uniqueness, not
    values."""
    return df.withColumn(col_name, F.expr("uuid()"))


_UNITS = ["B", "KiB", "MiB", "GiB", "TiB", "PiB"]


def format_bytes(col: Column | str) -> Column:
    """Human-readable byte size (O-44): '923 B', '1.21 KiB', '3.5 GiB'.

    A branch-per-magnitude CASE ladder (codegen'd, no UDF): the widest
    matching binary unit with two decimals, bytes shown as integers."""
    c = F.col(col).cast("double") if isinstance(col, str) else col.cast("double")
    expr = F.concat(F.format_number(c, 0), F.lit(" B"))
    for i, unit in enumerate(_UNITS[1:], start=1):
        bound = float(1 << (10 * i))
        expr = F.when(
            c >= bound,
            F.concat(F.format_number(c / F.lit(bound), 2), F.lit(f" {unit}")),
        ).otherwise(expr)
    return expr
