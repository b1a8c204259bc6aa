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


@register("ingest_expectations", """
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_keys,
       count(*) - count(DISTINCT o_orderkey) AS dup_keys,
       CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS nonpositive_price,
       CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01 00:00:00'
                      OR o_orderdate > TIMESTAMP '2030-01-01 00:00:00'
                    THEN 1 ELSE 0 END) AS BIGINT) AS date_out_of_range,
       CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)
            AS BIGINT) AS bad_status
FROM orders
""")
def ingest_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations in ONE pass (O-14 generalized): null /
    uniqueness / range / domain rules evaluate as conditional aggregates
    over a single scan — adding a rule adds a column, never a pass.  The
    uniqueness check rides Spark's two-phase partial-distinct; everything
    else partial-aggregates map-side.  The same rule expressions drive a
    quarantine split when row-level routing is needed
    (sources/ingest.py::validate_split)."""
    cat = Catalog(spark, sf_dir)

    def viol(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    lo = F.lit("1990-01-01").cast("timestamp_ntz")
    hi = F.lit("2030-01-01").cast("timestamp_ntz")
    return cat.orders.agg(
        F.count("*").alias("n_rows"),
        viol(F.col("o_orderkey").isNull()).alias("null_keys"),
        (F.count("*") - F.count_distinct(F.col("o_orderkey"))).alias("dup_keys"),
        viol(F.col("o_totalprice") <= 0).alias("nonpositive_price"),
        viol((F.col("o_orderdate") < lo) | (F.col("o_orderdate") > hi))
        .alias("date_out_of_range"),
        viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias("bad_status"),
    )


@register("agg_corr_stats", """
SELECT event_type,
       round(corr(value, CAST(json_extract_string(props, '$.k') AS INT)), 4)
         AS corr_vk,
       round(covar_samp(value, CAST(json_extract_string(props, '$.k') AS INT)), 4)
         AS covar_vk,
       round(stddev_samp(value), 4) AS sd_value,
       round(var_samp(value), 4) AS var_value
FROM events
GROUP BY event_type
""")
def agg_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group: Pearson correlation and sample
    covariance between the metric column and a JSON-extracted payload
    field, plus dispersion.  All are single-pass co-moment aggregates
    with map-side partial combine — the building blocks for feature
    screening over training data at any scale."""
    cat = Catalog(spark, sf_dir)
    # Project the JSON extraction ONCE before the aggregate (r9,
    # measured 3.1s -> ~1.7s): as an inline agg-input expression,
    # get_json_object(props, ...) appeared in both the corr and
    # covar_samp update paths and re-parsed the payload string twice
    # per row — the textbook "compute derived columns once, then
    # aggregate" split (guide §2.3's project-before-the-exchange).
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (cat.events
            .select("event_type", "value", k.alias("k"))
            .groupBy("event_type").agg(
                F.round(F.corr(F.col("value"), F.col("k")), 4)
                .alias("corr_vk"),
                F.round(F.covar_samp(F.col("value"), F.col("k")), 4)
                .alias("covar_vk"),
                F.round(F.stddev_samp("value"), 4).alias("sd_value"),
                F.round(F.var_samp("value"), 4).alias("var_value"),
            ))


@register("ingest_variant_payload", """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
GROUP BY event_type
""")
def ingest_variant_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-12/O-41 in their Spark-4-native form: the schemaless layer-B
    payload (``src/services/s3.service.ts:82`` stores whatever JSON the
    client sent) lands in a VARIANT column via ``parse_json`` — parsed
    ONCE into a binary-encoded tree, then every ``variant_get`` path
    access is a cheap typed extraction, unlike ``get_json_object`` which
    re-parses the string per call.  At 100 TB the bronze table stores
    the VARIANT column and downstream queries bind fields lazily —
    schema-on-read without either a rigid struct or repeated parsing.
    The oracle reads the same paths with DuckDB's JSON extraction."""
    cat = Catalog(spark, sf_dir)
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "bigint")
    return (
        cat.events
        .select("event_type", k.alias("k"))
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"),
             F.sum("k").alias("sum_k"),
             F.min("k").alias("min_k"),
             F.max("k").alias("max_k"))
    )


@register("ingest_try_safe_exprs", """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CASE WHEN TRY_CAST(json_extract_string(props, '$.k')
                                   AS BIGINT) IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_payload,
       CAST(sum(CASE WHEN TRY_CAST(event_type AS BIGINT) IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_nonnumeric_type,
       round(avg(value / nullif(TRY_CAST(json_extract_string(props, '$.k')
                                         AS BIGINT), 0)), 4) AS avg_ratio
FROM events
GROUP BY event_type
""")
def ingest_try_safe_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family (the ANSI-mode answer to O-36/O-37's
    blind casts): `try_cast` yields NULL instead of an exception on a
    malformed payload field, `try_divide` absorbs the k=0 rows that a
    plain division would blow up on under ANSI mode, and the counts
    quantify how much of the feed is malformed — per-batch data-quality
    telemetry that never kills the job.  Everything stays in
    whole-stage codegen; the oracle mirrors with DuckDB's TRY_CAST and
    NULLIF-guarded division (NULL results fall out of `avg` in both
    engines)."""
    cat = Catalog(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").try_cast("bigint")
    return (
        cat.wide_table("events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(k.isNull(), 1).otherwise(0))
            .cast("bigint").alias("n_bad_payload"),
            F.sum(F.when(F.col("event_type").try_cast("bigint").isNull(),
                         1).otherwise(0))
            .cast("bigint").alias("n_nonnumeric_type"),
            F.round(F.avg(F.try_divide(F.col("value"),
                                       F.nullif(k, F.lit(0)))), 4)
            .alias("avg_ratio"),
        )
    )
