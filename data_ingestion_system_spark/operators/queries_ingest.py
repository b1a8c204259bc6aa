"""Declared queries: the ingestion path's scalar/classify semantics,
oracle-checked on `events` (the landing-zone fixtures live in tmp dirs and
are covered by tests/test_ingest.py + test_streaming.py instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_system_spark.catalog import Catalog
from data_ingestion_system_spark.registry import register


@register("ingest_keys", """
SELECT event_id,
       strftime(ts, '%Y-%m-%d') AS audit_date,
       'audit/' || strftime(ts, '%Y-%m-%d') || '/' || event_id ||
           CASE WHEN event_type IN ('view', 'click') THEN '/request.json'
                ELSE '/response.json' END AS s3_key,
       CASE WHEN event_type IN ('view', 'click') THEN 'request'
            ELSE 'response' END AS record_type
FROM events
""")
def ingest_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-34 date truncate + O-38 key construction + O-13 classification —
    the write path's scalar layer (``s3.service.ts:33-34``,
    ``processQueue.ts:113``) as one checkable projection."""
    cat = Catalog(spark, sf_dir)
    audit_date = F.date_format(F.col("ts"), "yyyy-MM-dd")
    is_req = F.col("event_type").isin("view", "click")
    leaf = F.when(is_req, "/request.json").otherwise("/response.json")
    return cat.events.select(
        "event_id",
        audit_date.alias("audit_date"),
        F.concat(F.lit("audit/"), audit_date, F.lit("/"),
                 F.col("event_id").cast("string"), leaf).alias("s3_key"),
        F.when(is_req, "request").otherwise("response").alias("record_type"),
    )


@register("ingest_project_cast", """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
       CAST(ts AS DATE) AS event_date,
       epoch_ms(ts) AS ts_ms
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
""")
def ingest_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-12 schema-on-read projection + O-36/O-37 casts — the Lambda's
    field-pluck from untyped JSON (``processQueue.ts:114-129``) with the
    string->int and timestamp conversions it performs."""
    cat = Catalog(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k")
    return (
        cat.events.filter(k.isNotNull())
        .select(
            "event_id",
            k.cast("int").alias("k_int"),
            F.col("ts").cast("date").alias("event_date"),
            (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1000))
            .cast("long").alias("ts_ms"),
        )
    )
