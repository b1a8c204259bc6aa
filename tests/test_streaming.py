"""Streaming pipeline end-to-end: landing -> bronze -> silver correlate,
with quarantine, checkpoint idempotence, and observed metrics."""

from __future__ import annotations

import json

import pytest

from data_ingestion_system_spark.streaming.pipeline import (
    MetricsCollector,
    silver_view,
    start_ingest_stream,
)

REQS = [
    {"transactionId": "t1", "timestamp": "2024-03-01T10:00:00.000Z",
     "method": "POST", "url": "/api/a", "appId": "app1",
     "workflowId": "wf1", "action": "create"},
    {"transactionId": "t2", "timestamp": "2024-03-01T10:05:00.000Z",
     "method": "GET", "url": "/api/b", "appId": "app2",
     "workflowId": "wf2", "action": "read"},
]
# two responses for t1 (latest-wins), one orphan response (request never
# landed -> still present in responses, absent from silver join output)
RESPS = [
    {"transactionId": "t1", "timestamp": "2024-03-01T10:00:01.000Z", "statusCode": 500},
    {"transactionId": "t1", "timestamp": "2024-03-01T10:00:05.000Z", "statusCode": 200},
    {"transactionId": "t9", "timestamp": "2024-03-01T10:00:02.000Z", "statusCode": 404},
]


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "req_landing": tmp_path / "landing_req",
        "resp_landing": tmp_path / "landing_resp",
        "req_bronze": tmp_path / "bronze_req",
        "resp_bronze": tmp_path / "bronze_resp",
        "quarantine": tmp_path / "quarantine",
        "ckpt_req": tmp_path / "ckpt_req",
        "ckpt_resp": tmp_path / "ckpt_resp",
    }
    d["req_landing"].mkdir()
    d["resp_landing"].mkdir()
    for i, rec in enumerate(REQS):
        (d["req_landing"] / f"r{i}.json").write_text(json.dumps(rec))
    (d["req_landing"] / "bad.json").write_text("{nope")
    for i, rec in enumerate(RESPS):
        (d["resp_landing"] / f"p{i}.json").write_text(json.dumps(rec))
    return {k: str(v) for k, v in d.items()}


def _drain(spark, dirs):
    for kind, landing, bronze, ckpt in (
        ("request", dirs["req_landing"], dirs["req_bronze"], dirs["ckpt_req"]),
        ("response", dirs["resp_landing"], dirs["resp_bronze"], dirs["ckpt_resp"]),
    ):
        q = start_ingest_stream(
            spark, landing, bronze, dirs["quarantine"], ckpt,
            kind=kind, available_now=True,
        )
        q.awaitTermination(120)


def test_stream_to_silver(spark, dirs):
    collector = MetricsCollector()
    spark.streams.addListener(collector)
    try:
        _drain(spark, dirs)

        bronze_req = spark.read.parquet(dirs["req_bronze"])
        assert bronze_req.count() == 2
        assert "audit_date" in bronze_req.columns

        quarantined = spark.read.json(dirs["quarantine"])
        assert quarantined.count() == 1  # the corrupt request file

        silver = silver_view(spark, dirs["req_bronze"], dirs["resp_bronze"])
        rows = {r.transaction_id: r for r in silver.collect()}
        assert set(rows) == {"t1", "t2"}          # orphan response t9 dropped
        assert rows["t1"].status_code == 200      # latest of the two responses
        assert rows["t1"].response_s3_key == "audit/2024-03-01/t1/response.json"
        assert rows["t2"].status_code is None     # uncorrelated request

        # O-9 metrics observed on the stream
        assert collector.totals.get("RequestsProcessed", 0) == 3  # incl. corrupt row
        assert collector.totals.get("ResponsesProcessed", 0) == 3
        assert collector.totals.get("FailedRecords", 0) == 1
        assert collector.batches >= 2
    finally:
        spark.streams.removeListener(collector)


def test_redelivery_dedup_within_watermark(spark, tmp_path):
    """The reference's at-least-once path inserts a redelivered message
    twice; dropDuplicatesWithinWatermark suppresses the duplicate even
    when it arrives in a LATER micro-batch."""
    import json as J
    landing = tmp_path / "landing"
    landing.mkdir()
    rec = {"transactionId": "dup1", "timestamp": "2024-03-01T10:00:00.000Z",
           "method": "POST", "url": "/x", "appId": "a", "workflowId": "w",
           "action": "c"}
    other = {"transactionId": "t2", "timestamp": "2024-03-01T10:10:00.000Z",
             "method": "GET", "url": "/y", "appId": "b", "workflowId": "w",
             "action": "r"}

    def drain():
        q = start_ingest_stream(
            spark, str(landing), str(tmp_path / "bronze"),
            str(tmp_path / "quarantine"), str(tmp_path / "ckpt"),
            kind="request", available_now=True, dedup_within="1 hour",
        )
        q.awaitTermination(120)

    (landing / "m1.json").write_text(J.dumps(rec))
    drain()
    # redelivery: same record again (new file), plus a genuinely new one
    (landing / "m1_redelivered.json").write_text(J.dumps(rec))
    (landing / "m2.json").write_text(J.dumps(other))
    drain()

    bronze = spark.read.parquet(str(tmp_path / "bronze"))
    assert bronze.count() == 2  # duplicate suppressed, new record kept
    assert bronze.filter(bronze.transaction_id == "dup1").count() == 1


def test_batch_commit_invalidates_result_cache(spark, dirs):
    from data_ingestion_system_spark.plans.cache import ResultCache

    cache = ResultCache()
    cache.put("audit:{}", ["stale rows"])
    q = start_ingest_stream(
        spark, dirs["req_landing"], dirs["req_bronze"], dirs["quarantine"],
        dirs["ckpt_req"], kind="request", available_now=True,
        result_cache=cache,
    )
    q.awaitTermination(120)
    assert cache.get("audit:{}") is None  # fresh data evicted the stale top-k


def test_checkpoint_no_reprocess(spark, dirs):
    _drain(spark, dirs)
    n1 = spark.read.parquet(dirs["req_bronze"]).count()
    # drain again with the same checkpoint: no new files -> no new rows
    _drain(spark, dirs)
    assert spark.read.parquet(dirs["req_bronze"]).count() == n1

    # a late request lands: only the delta is processed, and a previously
    # orphaned response would now correlate on read (silver is a view)
    late = {"transactionId": "t9", "timestamp": "2024-03-01T09:59:00.000Z",
            "method": "GET", "url": "/api/late", "appId": "app9",
            "workflowId": "wf9", "action": "read"}
    import pathlib
    pathlib.Path(dirs["req_landing"], "late.json").write_text(json.dumps(late))
    _drain(spark, dirs)
    assert spark.read.parquet(dirs["req_bronze"]).count() == n1 + 1

    silver = silver_view(spark, dirs["req_bronze"], dirs["resp_bronze"])
    t9 = silver.filter(silver.transaction_id == "t9").first()
    assert t9.status_code == 404  # the reference would have lost this update


def test_streaming_write_audit_publish(spark, tmp_path):
    """foreachBatch + publish_if_valid: each micro-batch is staged,
    audited, and only clean batches reach the published table."""
    import json

    from pyspark.sql import functions as F

    from data_ingestion_system_spark.sources.ingest import (
        REQUEST_SCHEMA,
        project_requests,
        read_landing,
        validate_split,
    )
    from data_ingestion_system_spark.sources.writers import publish_if_valid

    landing = tmp_path / "landing_wap"
    landing.mkdir()
    pub = str(tmp_path / "published_wap")
    ckpt = str(tmp_path / "ckpt_wap")

    rec = {"transactionId": "t1",
           "timestamp": "2024-03-01T01:00:00.000Z",
           "method": "POST", "url": "/api/x", "appId": "app1",
           "workflowId": "wf", "action": "create"}
    (landing / "r1.json").write_text(json.dumps(rec))

    outcomes = []

    def audit_and_publish(batch_df, batch_id):
        good, _bad = validate_split(batch_df)
        proj = project_requests(good)
        try:
            publish_if_valid(
                proj, pub,
                {"null_txn": F.col("transaction_id").isNull()})
            outcomes.append(("published", batch_id))
        except ValueError:
            outcomes.append(("rejected", batch_id))

    q = (read_landing(spark, str(landing), REQUEST_SCHEMA, streaming=True)
         .writeStream.foreachBatch(audit_and_publish)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    assert outcomes and outcomes[0][0] == "published"
    got = spark.read.parquet(pub)
    assert got.count() == 1
    assert got.collect()[0].transaction_id == "t1"
