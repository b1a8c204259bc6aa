"""Temporal-join primitives shared by batch and streaming paths.

``point_in_interval_enrich`` is the bucketed lowering of the SCD2
"status as of T" join (see join_interval_bucketed's docstring in
queries_relational.py for the full scale analysis); factoring it out
lets the streaming enrichment (streaming/enrich.py) run the IDENTICAL
plan per micro-batch, so batch/stream parity holds by construction —
pinned end-to-end by tests/test_streaming_windowed.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(events: DataFrame) -> DataFrame:
    """Collapse an event log into SCD2 status intervals per user:
    (user_id, status, valid_from, valid_to), valid_to NULL for the
    current interval.  One window pass (partitioned by user), change
    rows only — the silver-table build a warehouse materializes once
    and every point-in-time read joins against."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = events.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev"))
    chg = s.filter(F.col("prev").isNull()
                   | (F.col("prev") != F.col("event_type")))
    return chg.select(
        "user_id", F.col("event_type").alias("status"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"))


def point_in_interval_enrich(probes: DataFrame,
                             intervals: DataFrame) -> DataFrame:
    """Tag each probe (event_id, user_id, ts) with the interval status
    valid at its timestamp (valid_from <= ts < valid_to; open interval
    matches everything after its start).

    Bucketed range-join lowering: intervals explode to the daily
    buckets they cover (open intervals clamp to the probe-side max day,
    a 1-row broadcast scalar), the join runs on (user_id, day) EQUALITY
    and the exact range predicate filters survivors — per-key fan-out
    is bounded by intervals-overlapping-one-day, never probe-count x
    interval-count.  The buckets partition the match space (each
    match's probe day falls in exactly one covered bucket), so results
    equal the naive inequality join row-for-row."""
    probes = probes.select(
        "event_id", "user_id", "ts",
        F.date_trunc("day", "ts").alias("day"))
    max_day = probes.agg(F.max("day").alias("max_day"))
    buckets = (intervals.crossJoin(F.broadcast(max_day))
               .withColumn(
                   "day",
                   F.explode(F.sequence(
                       F.date_trunc("day", "valid_from"),
                       F.greatest(
                           F.date_trunc(
                               "day",
                               F.coalesce(F.col("valid_to"),
                                          F.col("max_day"))),
                           F.date_trunc("day", "valid_from")),
                       F.expr("INTERVAL 1 DAY"))))
               .select("user_id", "day", "status", "valid_from",
                       "valid_to"))
    return (probes.join(buckets, ["user_id", "day"])
            .filter((F.col("valid_from") <= F.col("ts"))
                    & (F.col("valid_to").isNull()
                       | (F.col("ts") < F.col("valid_to"))))
            .select("event_id", "user_id", "ts",
                    F.col("status").alias("status_at_event")))
