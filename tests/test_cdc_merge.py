"""Tombstone / applied-row pins for cdc_merge_upsert (the CDC MERGE
apply): latest-wins upsert, `error` as delete tombstone, untouched base
rows stream through the broadcast anti join.  Referenced from the query
docstring (queries_relational.py) — value-level semantics the generic
oracle sweep can't isolate per-branch."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from data_ingestion_system_spark.operators.queries_relational import (
    cdc_merge_upsert,
)

_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("value", T.DoubleType()),
])


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def cdc_sf_dir(spark, tmp_path_factory):
    """Tiny events table exercising every MERGE branch around the
    2024-01-21 cutoff baked into the query."""
    rows = [
        # user 1: base only -> kept verbatim
        (1, 1, "click", _ts(10), 1.0),
        (2, 1, "view", _ts(9), 1.0),        # older, loses latest-wins
        # user 2: base + delta upsert -> delta status wins
        (3, 2, "click", _ts(10), 1.0),
        (4, 2, "purchase", _ts(22), 1.0),
        # user 3: base + delta tombstone -> deleted
        (5, 3, "click", _ts(10), 1.0),
        (6, 3, "error", _ts(23), 1.0),
        # user 4: delta-only insert
        (7, 4, "view", _ts(25), 1.0),
        # user 5: delta error then LATER non-error -> latest wins, kept
        (8, 5, "error", _ts(22), 1.0),
        (9, 5, "view", _ts(24), 1.0),
        # user 6: base + delta where the LATEST delta row is the
        # tombstone -> deleted even though an earlier delta row exists
        (10, 6, "view", _ts(10), 1.0),
        (11, 6, "click", _ts(22), 1.0),
        (12, 6, "error", _ts(23), 1.0),
    ]
    d = tmp_path_factory.mktemp("cdc_sf")
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
        str(d / "events.parquet"))
    return str(d)


def test_merge_branches(spark, cdc_sf_dir):
    got = {r["user_id"]: (r["status"], r["status_ts"])
           for r in cdc_merge_upsert(spark, cdc_sf_dir).collect()}
    assert got == {
        1: ("click", _ts(10)),     # untouched base row
        2: ("purchase", _ts(22)),  # upserted
        4: ("view", _ts(25)),      # inserted
        5: ("view", _ts(24)),      # error superseded within the batch
    }
    # tombstoned keys are really gone, not just re-statused
    assert 3 not in got and 6 not in got


def test_merge_is_deterministic_on_ts_ties(spark, tmp_path_factory):
    """Latest-wins tie-breaks on event_id when two rows share a ts —
    retry-idempotent CDC batches depend on this."""
    rows = [
        (1, 7, "click", _ts(22, 5), 1.0),
        (2, 7, "view", _ts(22, 5), 1.0),   # same ts, higher event_id wins
    ]
    d = tmp_path_factory.mktemp("cdc_tie")
    spark.createDataFrame(rows, _SCHEMA).write.parquet(
        str(d / "events.parquet"))
    got = {r["user_id"]: r["status"]
           for r in cdc_merge_upsert(spark, str(d)).collect()}
    assert got == {7: "view"}
