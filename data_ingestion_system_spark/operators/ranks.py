"""Distributed global order statistics: TeraSort range staging.

The shared primitive behind every "global rank / prefix sum WITHOUT a
global window" query (agg_equidepth_histogram, agg_mann_whitney,
agg_ks_test, agg_lorenz_gini): range-partition the rows on the sort key
so that

1. ``percentile_approx`` range cuts become driver literals — they steer
   LOAD BALANCE only; correctness never depends on where they land,
   because pid assignment is monotone in the sort key (ties on the key
   stay within one pid since assignment ignores tie-break columns);
2. per-pid counts (rows, plus any requested indicator sums) fold into
   prefix-sum OFFSETS — ``<= nparts`` longs each, the blessed
   driver-resident-codebook pattern, never a data collect;
3. a window PARTITIONED BY pid (``row_number`` / running ``sum``) plus
   the offset equals the exact global rank / global prefix sum, with
   every window task holding ~N/nparts rows.

At 100 TB this replaces a single-task global sort with two pruned map
passes and a balanced window — the TeraSort lowering.  A null sort key
routes to pid 0, matching Spark's nulls-first ASC order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["range_stage", "offset_at"]


def range_stage(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    sum_cols: tuple[str, ...] = (),
    accuracy: int = 10_000,
) -> tuple[DataFrame, dict[str, list[int]], dict[str, int]]:
    """Stage ``df`` for exact global order statistics on ``value_col``.

    Returns ``(staged, offsets, totals)``:

    * ``staged`` — ``df`` plus a ``pid`` column (monotone in the sort
      key);
    * ``offsets`` — for ``"__rows__"`` and each name in ``sum_cols``, a
      prefix-sum list indexed by pid: how many rows (resp. how much of
      the summed column) sort strictly below the pid's range;
    * ``totals`` — grand total for each of those keys.

    ``sum_cols`` must be integer-valued columns (e.g. 0/1 indicators);
    their offsets make per-group prefix sums exact, the way
    ``agg_ks_test`` tracks the arm-1 cumulative count.
    """
    nparts = max(8, min(64, spark.sparkContext.defaultParallelism))
    probs = [i / nparts for i in range(1, nparts)]
    bounds = df.agg(
        F.percentile_approx(value_col, probs, accuracy).alias("b")
    ).collect()[0]["b"]
    # empty input: percentile_approx yields NULL -> degrade to a single
    # pid so downstream aggregates return zero rows instead of raising
    # (ADVICE r3: an events slice with no purchase/click rows)
    bounds = bounds or []

    pid = F.when(F.col(value_col).isNull(), F.lit(0))
    for i, cut in enumerate(bounds):
        pid = pid.when(F.col(value_col) < F.lit(float(cut)), F.lit(i))
    pid = pid.otherwise(F.lit(len(bounds)))
    staged = df.withColumn("pid", pid)

    keys = ["__rows__", *sum_cols]
    aggs = [F.count("*").alias("__rows__")]
    aggs += [F.sum(c).cast("long").alias(c) for c in sum_cols]
    per = {r["pid"]: r for r in staged.groupBy("pid").agg(*aggs).collect()}

    npid = len(bounds) + 1
    offsets: dict[str, list[int]] = {}
    totals: dict[str, int] = {}
    for key in keys:
        acc, offs = 0, []
        for p in range(npid):
            offs.append(acc)
            if p in per and per[p][key] is not None:
                acc += per[p][key]
        offsets[key] = offs
        totals[key] = acc
    return staged, offsets, totals


def offset_at(offsets: list[int]) -> Column:
    """The pid's offset as a column: ``element_at(array(lits), pid+1)``."""
    return F.element_at(F.array(*[F.lit(o) for o in offsets]),
                        F.col("pid") + 1)
