"""Audit-search operators — the reference's flagship interactive query.

Reference semantics (``src/services/audit.services.ts:109-163``): build a
conjunctive equality WHERE clause from whichever of 5 filters are present
(zero filters -> full scan), project an explicit column list (never
``SELECT *``), ``ORDER BY timestamp DESC``, ``LIMIT 100``.  Filter dict is
assembled by the route handler (``src/routes/audit.routes.ts:11-23``).

Spark-first design:

* The filter dict becomes a single ``Column`` predicate folded with ``&``
  (O-10).  Catalyst pushes every equality into the parquet scan
  (``PushedFilters`` in the formatted plan), so at 100 TB only matching
  row-groups are read — this replaces the reference's five secondary
  B-tree indexes (``src/scripts/setup-db.ts:72-78``).
* Explicit projection (O-11) -> parquet column pruning (``ReadSchema``).
* ``orderBy(desc).limit(k)`` (O-19 + O-20) fuses into
  ``TakeOrderedAndProject`` — a distributed top-k that never performs a
  global sort: each task keeps a k-row heap, the driver merges.  At 1000
  executors this moves k rows per task, not the table.

Determinism: the reference inherits Postgres's unstable tie order; the
oracle comparison needs a total order, so ties on the sort key are broken
by the table's primary key (descending, to keep "most recent first").
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conjunctive_filter(df: DataFrame, filters: Mapping[str, object]) -> DataFrame:
    """O-10: AND-of-equalities from a dict; empty dict -> full scan.

    Mirrors ``audit.services.ts:109-145`` (undefined keys already removed
    by the caller, as the route handler does at ``audit.routes.ts:20-23``).
    """
    pred: Column | None = None
    for key, value in filters.items():
        clause = F.col(key) == F.lit(value)
        pred = clause if pred is None else (pred & clause)
    return df.filter(pred) if pred is not None else df


def search(
    df: DataFrame,
    filters: Mapping[str, object] | None = None,
    project: Sequence[str] | None = None,
    order_col: str = "ts",
    tiebreak_col: str | None = None,
    limit: int = 100,
) -> DataFrame:
    """Q-search: filter -> project -> top-k most recent.

    ``limit=100`` matches the reference's hard cap
    (``audit.services.ts:162``); ``order_col`` descending matches
    ``ORDER BY timestamp DESC`` (``:161``).
    """
    out = conjunctive_filter(df, filters or {})
    if project:
        out = out.select(*project)
    order = [F.col(order_col).desc_nulls_last()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    return out.orderBy(*order).limit(limit)
