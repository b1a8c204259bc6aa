"""End-to-end integration: the full reference story on one corpus.

landing JSON -> streaming ingest (dedup, quarantine) -> bronze ->
silver latest-wins view -> conjunctive search (top-k) -> cached service
-> payload enrichment from the actual landing objects.  Mirrors the
reference pipeline S3 -> SQS -> Lambda -> Postgres -> search API
(SURVEY.md §3) collapsed into one engine."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_ingestion_system_spark.operators.search import search
from data_ingestion_system_spark.plans.cache import CachedSearchService
from data_ingestion_system_spark.streaming.pipeline import (
    silver_view,
    start_ingest_stream,
)

REQS = [
    {"transactionId": f"t{i}", "timestamp": f"2024-03-01T10:{i:02d}:00.000Z",
     "method": "POST", "url": f"/api/{'a' if i % 2 else 'b'}",
     "appId": f"app{i % 2}", "workflowId": "wf", "action": "create",
     "body": json.dumps({"n": i})}
    for i in range(8)
]
RESPS = [
    {"transactionId": f"t{i}", "timestamp": f"2024-03-01T10:{i:02d}:30.000Z",
     "statusCode": 200 if i % 3 else 500, "body": "ok"}
    for i in range(6)   # t6, t7 stay uncorrelated
]


def test_full_pipeline(spark, tmp_path):
    req_landing = tmp_path / "lr"
    resp_landing = tmp_path / "lp"
    req_landing.mkdir()
    resp_landing.mkdir()
    for i, r in enumerate(REQS):
        (req_landing / f"r{i}.json").write_text(json.dumps(r))
    for i, r in enumerate(RESPS):
        (resp_landing / f"p{i}.json").write_text(json.dumps(r))

    # ingest both streams
    for kind, landing, bronze, ckpt in (
        ("request", req_landing, "bronze_req", "ck_r"),
        ("response", resp_landing, "bronze_resp", "ck_p"),
    ):
        q = start_ingest_stream(
            spark, str(landing), str(tmp_path / bronze),
            str(tmp_path / "quarantine"), str(tmp_path / ckpt),
            kind=kind, available_now=True, dedup_within="1 hour",
        )
        q.awaitTermination(120)

    # silver: all 8 requests, 6 correlated
    silver = silver_view(spark, str(tmp_path / "bronze_req"),
                         str(tmp_path / "bronze_resp"))
    assert silver.count() == 8
    assert silver.filter(F.col("status_code").isNotNull()).count() == 6

    # search surface over silver (reference's filter matrix)
    executions = []

    def run_search(filters):
        executions.append(dict(filters))
        return search(silver, filters, order_col="timestamp",
                      tiebreak_col="transaction_id", limit=100)

    svc = CachedSearchService(run_search)
    app0 = svc.search({"app_id": "app0"})
    assert {r.transaction_id for r in app0} == {"t0", "t2", "t4", "t6"}
    errors = svc.search({"app_id": "app0", "status_code": 500})
    assert {r.transaction_id for r in errors} == {"t0"}  # t3 is app1
    assert svc.search({"app_id": "app0"}) == app0        # cache hit
    assert len(executions) == 2

    # enrichment: top results joined back to the actual landing payloads
    payloads = (
        spark.read.json(str(req_landing))
        .select(F.col("transactionId").alias("transaction_id"),
                F.col("body").alias("payload_body"))
    )
    top = search(silver, {"app_id": "app0"}, order_col="timestamp",
                 tiebreak_col="transaction_id", limit=2)
    enriched = {
        r.transaction_id: json.loads(r.payload_body)
        for r in payloads.join(F.broadcast(top.select("transaction_id")),
                               "transaction_id").collect()
    }
    assert enriched == {"t4": {"n": 4}, "t6": {"n": 6}}  # 2 most recent app0
