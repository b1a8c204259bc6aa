"""DDL / catalog surface (SURVEY §2.10, O-46..O-49): managed databases
and parquet tables through the SQL API, idempotent creation included."""

from __future__ import annotations

from data_ingestion_system_spark.catalog import Catalog


def test_managed_table_ddl_roundtrip(spark, sf_dir, tmp_path):
    Catalog(spark, sf_dir).register_views(("orders",))
    spark.sql("CREATE DATABASE IF NOT EXISTS audit")
    spark.sql("CREATE DATABASE IF NOT EXISTS audit")  # idempotent (O-46)
    spark.sql("DROP TABLE IF EXISTS audit.order_slice")
    spark.sql("""
        CREATE TABLE IF NOT EXISTS audit.order_slice USING PARQUET AS
        SELECT o_orderkey, o_totalprice FROM orders LIMIT 100
    """)
    n0 = spark.table("audit.order_slice").count()
    assert n0 == 100

    # O-8-style batch append through SQL INSERT
    spark.sql("""
        INSERT INTO audit.order_slice
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_orderkey LIMIT 10
    """)
    assert spark.table("audit.order_slice").count() == n0 + 10

    # CREATE TABLE IF NOT EXISTS is a no-op on the existing table (O-47)
    spark.sql("""
        CREATE TABLE IF NOT EXISTS audit.order_slice USING PARQUET AS
        SELECT o_orderkey, o_totalprice FROM orders LIMIT 5
    """)
    assert spark.table("audit.order_slice").count() == n0 + 10

    # temp view scratch space (O-49) shadows nothing and drops cleanly
    spark.table("audit.order_slice").createOrReplaceTempView("scratch")
    assert spark.table("scratch").count() == n0 + 10
    spark.catalog.dropTempView("scratch")

    spark.sql("DROP TABLE audit.order_slice")
    spark.sql("DROP DATABASE audit")
