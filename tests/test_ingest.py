"""Batch ingestion: landing JSON -> validate/quarantine -> project ->
date-partitioned bronze with partition pruning."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_system_spark.sources.ingest import (
    REQUEST_SCHEMA,
    RESPONSE_SCHEMA,
    project_requests,
    project_responses,
    read_landing,
    validate_split,
)
from data_ingestion_system_spark.sources.writers import (
    read_binary_dir,
    write_date_partitioned,
)

REQS = [
    {"transactionId": "t1", "timestamp": "2024-03-01T10:00:00.000Z",
     "method": "POST", "url": "/api/test", "headers": {"h": "1"},
     "body": json.dumps({"x": 1}), "query": {"q": "a"},
     "files": [{"key": "audit/2024-03-01/t1/files/a.bin", "originalName": "a.bin"}],
     "appId": "app1", "workflowId": "wf1", "action": "create"},
    {"transactionId": "t2", "timestamp": "2024-03-02T11:00:00.000Z",
     "method": "GET", "url": "/api/other", "headers": {}, "body": None,
     "query": {}, "files": [], "appId": "app2", "workflowId": "wf2",
     "action": "read"},
    # missing transactionId -> quarantine (audit.middleware.ts:22-26)
    {"timestamp": "2024-03-02T12:00:00.000Z", "method": "GET",
     "url": "/api/bad", "appId": "app3"},
]

RESPS = [
    {"transactionId": "t1", "timestamp": "2024-03-01T10:00:01.000Z",
     "statusCode": 200, "headers": {}, "body": "ok", "appId": "app1",
     "workflowId": "wf1", "action": "create"},
]


@pytest.fixture()
def landing(tmp_path):
    req_dir = tmp_path / "landing" / "requests"
    resp_dir = tmp_path / "landing" / "responses"
    req_dir.mkdir(parents=True)
    resp_dir.mkdir(parents=True)
    for i, rec in enumerate(REQS):
        (req_dir / f"r{i}.json").write_text(json.dumps(rec))
    (req_dir / "corrupt.json").write_text("{this is not json")
    for i, rec in enumerate(RESPS):
        (resp_dir / f"p{i}.json").write_text(json.dumps(rec))
    return str(req_dir), str(resp_dir)


def test_validate_split_and_project(spark, landing):
    req_dir, _ = landing
    raw = read_landing(spark, req_dir, REQUEST_SCHEMA)
    valid, bad = validate_split(raw)
    assert valid.count() == 2
    assert bad.count() == 2  # corrupt JSON + missing txn id

    proj = project_requests(valid)
    rows = {r.transaction_id: r for r in proj.collect()}
    assert rows["t1"].endpoint == "/api/test"
    assert rows["t1"].app_id == "app1"
    assert rows["t1"].request_s3_key == "audit/2024-03-01/t1/request.json"
    assert str(rows["t1"].timestamp) == "2024-03-01 10:00:00"
    assert rows["t2"].workflow_id == "wf2"


def test_nested_fields_readable(spark, landing):
    req_dir, _ = landing
    raw, _bad = validate_split(read_landing(spark, req_dir, REQUEST_SCHEMA))
    r1 = raw.filter(F.col("transactionId") == "t1").first()
    assert r1.headers["h"] == "1"
    assert r1.files[0].originalName == "a.bin"
    assert json.loads(r1.body) == {"x": 1}


def test_partitioned_write_prunes(spark, landing, tmp_path):
    req_dir, _ = landing
    valid, _ = validate_split(read_landing(spark, req_dir, REQUEST_SCHEMA))
    bronze = str(tmp_path / "bronze")
    write_date_partitioned(project_requests(valid), bronze,
                           ts_col="timestamp", sort_col="timestamp")

    assert sorted(
        d for d in os.listdir(bronze) if d.startswith("audit_date=")
    ) == ["audit_date=2024-03-01", "audit_date=2024-03-02"]

    back = spark.read.parquet(bronze)
    pruned = back.filter(F.col("audit_date") == "2024-03-01")
    assert pruned.count() == 1
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(audit_date" in plan


def test_response_projection(spark, landing):
    _, resp_dir = landing
    valid, bad = validate_split(read_landing(spark, resp_dir, RESPONSE_SCHEMA))
    assert bad.count() == 0
    row = project_responses(valid).first()
    assert row.transaction_id == "t1"
    assert row.status_code == 200
    assert row.response_s3_key == "audit/2024-03-01/t1/response.json"


def test_binary_source_size_cap(spark, tmp_path):
    bdir = tmp_path / "files"
    bdir.mkdir()
    (bdir / "small.bin").write_bytes(b"\x00" * 100)
    (bdir / "big.bin").write_bytes(b"\x00" * 2000)
    got = read_binary_dir(spark, str(bdir), max_bytes=1000).collect()
    assert len(got) == 1
    assert got[0].path.endswith("small.bin")
    assert got[0].length == 100
    assert bytes(got[0].content) == b"\x00" * 100
