"""Python Data Source connector (audit_http_log): batch parallel read,
determinism, source-side filter pushdown, and micro-batch streaming with
exact offset-based resume."""

from __future__ import annotations

from data_ingestion_system_spark.sources.pyds import (
    _gen_rows,
    register_audit_source,
)


def _read(spark, **opts):
    register_audit_source(spark)
    r = spark.read.format("audit_http_log")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_partitioned_and_deterministic(spark):
    df = _read(spark, numPartitions=4, rowsPerPartition=50)
    assert df.count() == 200
    assert df.rdd.getNumPartitions() == 4
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _read(spark, numPartitions=4, rowsPerPartition=50).collect()))
    assert a == b  # seeded generator: two reads, identical rows
    row = dict(zip(df.columns, a[0]))
    assert row["transaction_id"].startswith("txn-")
    assert row["status_code"] in (200, 201, 400, 404, 500)


def test_filter_pushdown_drops_rows_at_source(spark):
    """An app_id equality predicate is claimed by pushFilters and the
    result matches the engine-side filter exactly (the source drops
    non-matching rows before they enter the plan)."""
    full = _read(spark, numPartitions=2, rowsPerPartition=100)
    expected = sorted(map(tuple, full.filter("app_id = 'app_3'").collect()))
    pushed = _read(spark, numPartitions=2, rowsPerPartition=100).filter(
        "app_id = 'app_3'")
    got = sorted(map(tuple, pushed.collect()))
    assert got == expected and len(got) > 0
    # and the raw generator honors the pushed filter (the executor-side
    # contract the reader relies on)
    raw = list(_gen_rows(0, 100, 42, "app_3"))
    assert raw and all(r[1] == "app_3" for r in raw)
    assert len(raw) < 100


def test_stream_micro_batches_and_resume(spark, tmp_path):
    """The streaming form emits fixed-size micro-batches and a restart
    from the checkpoint resumes at the recorded offset instead of
    replaying.  Each drain uses availableNow, which for a simple Python
    stream source falls back to exactly ONE micro-batch then terminates —
    so every invocation is a deterministic query restart."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    register_audit_source(spark)

    def drain_one_batch():
        q = (
            spark.readStream.format("audit_http_log")
            .option("rowsPerBatch", 20).load()
            .writeStream.option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start(path=out, format="parquet")
        )
        assert q.awaitTermination(120), "micro-batch did not finish"

    for expected in (20, 40, 60):
        drain_one_batch()
        assert spark.read.parquet(out).count() == expected

    rows = spark.read.parquet(out).collect()
    # no duplicates across the three restarts: offsets advanced exactly
    ids = [r.transaction_id + str(r.ts_ms) for r in rows]
    assert len(ids) == len(set(ids)) == 60
    # batch contents are the deterministic function of absolute offsets
    assert {r.transaction_id for r in rows} == {f"txn-s-{i}" for i in range(60)}
