"""Unit pins for operators/ranks.py::range_stage — the shared TeraSort
primitive behind the global-order-statistics queries."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_ingestion_system_spark.operators.ranks import offset_at, range_stage


def _exact_ranks(spark, rows):
    """row_number + offsets must equal the single-partition global rank,
    including under heavy duplicate values (ties stay within one pid)."""
    df = spark.createDataFrame(rows, ["value", "event_id"])
    staged, offs, totals = range_stage(spark, df, "value")
    assert totals["__rows__"] == len(rows)
    w = Window.partitionBy("pid").orderBy("value", "event_id")
    got = {(r["value"], r["event_id"]): r["rnk"] for r in staged.select(
        "value", "event_id",
        (F.row_number().over(w) + offset_at(offs["__rows__"])).alias("rnk")
    ).collect()}
    want = {(v, e): i + 1 for i, (v, e) in enumerate(
        sorted(rows, key=lambda t: (t[0], t[1])))}
    assert got == want


def test_range_stage_exact_global_rank_uniform(spark):
    rows = [(float(v), i) for i, v in enumerate(
        [(i * 37) % 101 for i in range(500)])]
    _exact_ranks(spark, rows)


def test_range_stage_exact_global_rank_skewed_ties(spark):
    # 80% of the mass on ONE value: every percentile cut lands on it,
    # so the tie-stays-in-one-pid property is what keeps ranks exact
    rows = [(5.0, i) for i in range(400)]
    rows += [(float(v), 400 + i) for i, v in enumerate(range(100))]
    _exact_ranks(spark, rows)


def test_range_stage_indicator_offsets(spark):
    """Prefix sums for an indicator column equal the true global
    cumulative count below each pid's range."""
    rows = [(float(i % 50), i, i % 3 == 0) for i in range(300)]
    df = spark.createDataFrame(rows, ["value", "event_id", "flag"]) \
        .withColumn("a1", F.col("flag").cast("int"))
    staged, offs, totals = range_stage(spark, df, "value", sum_cols=("a1",))
    assert totals["a1"] == sum(1 for _, i, f in rows if f)
    # per pid: offset == count of flagged rows in all LOWER pids
    per_pid = {r["pid"]: r["na"] for r in staged.groupBy("pid")
               .agg(F.sum("a1").alias("na")).collect()}
    acc = 0
    for p in range(len(offs["a1"])):
        assert offs["a1"][p] == acc
        acc += per_pid.get(p, 0) or 0
