"""Event-time windowed aggregation with watermarked late-data policy.

The reference has NO late-data policy: its correlation UPDATE silently
no-ops when a response outruns its request (``processQueue.ts:230-238``,
SURVEY.md §2.12).  This module is the principled replacement: tumbling
event-time windows + a watermark that states exactly how late a record
may be and still count.  Records later than the watermark are dropped
*deterministically* (and visibly — the drop shows up in
``lastProgress.stateOperators.numRowsDroppedByWatermark``), not lost by
racing.

Scale posture: windowed aggregation state lives in the state store keyed
by (window, group) — the watermark bounds it (closed windows are evicted),
so state size is O(open windows x groups), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from data_ingestion_system_spark.sources.ingest import (
    REQUEST_SCHEMA,
    project_requests,
    read_landing,
    validate_split,
)


def windowed_counts(spark: SparkSession, landing_dir: str,
                    window: str = "1 hour",
                    max_lateness: str = "2 hours") -> DataFrame:
    """Streaming plan: landing requests -> per-(window, action) counts.

    The same ``F.window`` expression runs in batch (agg_time_window query)
    — one definition of window semantics, two execution modes."""
    raw = read_landing(spark, landing_dir, REQUEST_SCHEMA, streaming=True)
    valid, _bad = validate_split(raw)
    proj = project_requests(valid).withColumn(
        # watermark tracking needs an instant; NTZ wall-clock is UTC here
        "event_time", F.col("timestamp").cast("timestamp")
    )
    return (
        proj.withWatermark("event_time", max_lateness)
        .groupBy(F.window("event_time", window), F.col("action"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("w_start"),
            "action", "n",
        )
    )


def start_windowed_counts(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    max_lateness: str = "2 hours",
) -> StreamingQuery:
    """Append-mode windowed counts -> parquet.

    Append mode emits a window exactly once, when the watermark passes its
    end — the sink only ever sees *finalized* windows, so downstream reads
    need no dedup/upsert.  Emission therefore trails by one trigger: a
    window closed by batch N's watermark is flushed in batch N+1."""
    agg = windowed_counts(spark, landing_dir, window, max_lateness)
    return (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start(path=out_dir, format="parquet")
    )
