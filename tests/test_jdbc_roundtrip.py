"""O-8 optional RDBMS branch: a true JDBC round-trip against embedded
Derby (bundled with Spark), mirroring the reference's transactional
batched insert (src/lambda/processQueue.ts:179-190, batch size 100).
Write with batchsize=100, read back, compare values exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_system_spark.catalog import Catalog
from data_ingestion_system_spark.sources.writers import (
    read_jdbc,
    write_jdbc_batch,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_batch_roundtrip(spark, sf_dir, tmp_path):
    url = f"jdbc:derby:{tmp_path}/auditdb;create=true"
    cat = Catalog(spark, sf_dir)
    # the reference inserts audit metadata rows; 250 rows > 2 batches at
    # batchsize=100, so the batching path is genuinely exercised
    src = (cat.orders
           .select("o_orderkey", "o_custkey", "o_orderstatus",
                   "o_totalprice")
           .orderBy("o_orderkey").limit(250))
    write_jdbc_batch(src, url, "audit_rows", mode="overwrite",
                     batchsize=100, driver=DERBY_DRIVER,
                     max_connections=2)
    back = read_jdbc(spark, url, "audit_rows", driver=DERBY_DRIVER)

    want = {tuple(r) for r in src.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want
    assert back.count() == 250

    # append is transactional per batch: a second write doubles the rows
    write_jdbc_batch(src, url, "audit_rows", mode="append",
                     batchsize=100, driver=DERBY_DRIVER,
                     max_connections=1)
    assert read_jdbc(spark, url, "audit_rows",
                     driver=DERBY_DRIVER).count() == 500
