"""Bucketed (co-located) joins + the SQL API surface.

Bucketing is the storage-side answer to repeated fact-fact joins at
100 TB: both tables pre-hash-partitioned on the join key into the same
bucket count join with ZERO shuffle (each task reads matching bucket
files from both sides).  The reference delegates this concern to Postgres
indexes; in Spark it's `bucketBy` + `saveAsTable`."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_system_spark.catalog import Catalog

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("warehouse")
    cat = Catalog(spark, sf_dir)
    for name, df, key in (
        ("b_orders", cat.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
         "o_orderkey"),
        ("b_lineitem", cat.lineitem.select("l_orderkey", "l_extendedprice"),
         "l_orderkey"),
    ):
        (
            df.write.mode("overwrite")
            .option("path", str(root / name))
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    joined = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("l_extendedprice").alias("rev"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must not introduce an exchange on the join key: both
    # sides' bucketing satisfies the distribution requirement
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
    assert joined.count() > 0


def test_bucketed_matches_unbucketed(spark, sf_dir, bucketed):
    cat = Catalog(spark, sf_dir)
    expect = (
        cat.lineitem.join(cat.orders,
                          F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    )
    got = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_sql_api_over_registered_views(spark, sf_dir):
    """The catalog exposes every table to spark.sql; DataFrame and SQL
    formulations of Q-search agree row for row."""
    cat = Catalog(spark, sf_dir)
    cat.register_views()
    sql_rows = spark.sql("""
        SELECT event_id, ts, user_id
        FROM events
        WHERE user_id = 7
        ORDER BY ts DESC, event_id DESC
        LIMIT 20
    """).collect()
    df_rows = (
        cat.events.filter(F.col("user_id") == 7)
        .select("event_id", "ts", "user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(20)
        .collect()
    )
    assert sql_rows == df_rows
