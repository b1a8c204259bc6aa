"""Schema evolution + micro-batch sizing.

The reference's payloads are schemaless (``s3.service.ts:82``) and its
Lambda plucks known fields, silently ignoring drift.  The engine's
contract: additive drift (new columns) is absorbed via mergeSchema;
landing records with unknown fields still project cleanly (explicit
schema = unknown fields dropped, missing fields null)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_ingestion_system_spark.sources.ingest import (
    REQUEST_SCHEMA,
    project_requests,
    read_landing,
    validate_split,
)


def test_parquet_merge_schema_additive(spark, tmp_path):
    p = str(tmp_path / "bronze")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(p)
    spark.createDataFrame([(2, "b", 9.5)], "id long, v string, score double") \
        .write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    rows = {r.id: r for r in merged.collect()}
    assert set(merged.columns) == {"id", "v", "score"}
    assert rows[1].score is None        # old rows: new column null
    assert rows[2].score == 9.5


def test_landing_unknown_and_missing_fields(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    # unknown extra field + missing optional fields: still a valid record
    (landing / "drift.json").write_text(json.dumps({
        "transactionId": "tx", "timestamp": "2024-03-01T10:00:00.000Z",
        "url": "/api/new", "brandNewField": {"nested": True},
    }))
    valid, bad = validate_split(read_landing(spark, str(landing), REQUEST_SCHEMA))
    assert bad.count() == 0
    row = project_requests(valid).first()
    assert row.transaction_id == "tx"
    assert row.endpoint == "/api/new"
    assert row.app_id is None           # missing optional -> null, not error


def test_max_files_per_trigger_batches(spark, tmp_path):
    """O-26 micro-batch sizing: maxFilesPerTrigger bounds each batch; a
    backlog of 4 files under maxFilesPerTrigger=2 drains in >=2 batches."""
    landing = tmp_path / "landing"
    landing.mkdir()
    for i in range(4):
        (landing / f"r{i}.json").write_text(json.dumps({
            "transactionId": f"t{i}", "timestamp": "2024-03-01T10:00:00.000Z",
            "url": "/x",
        }))
    stream = (
        spark.readStream.schema(REQUEST_SCHEMA)
        .option("maxFilesPerTrigger", "2")
        .json(str(landing))
    )
    batch_sizes = []

    def count_batch(df, _bid):
        batch_sizes.append(df.count())

    q = (
        stream.writeStream.foreachBatch(count_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sum(batch_sizes) == 4
    assert len(batch_sizes) >= 2
    assert all(n <= 2 for n in batch_sizes)
