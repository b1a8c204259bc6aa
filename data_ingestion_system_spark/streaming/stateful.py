"""Custom stateful streaming operator: request/response correlation with
explicit per-key state (applyInPandasWithState).

This is the streaming-native form of the reference's core join (O-16):
instead of a Lambda UPDATE racing arrivals (``processQueue.ts:199-244``,
where a response before its request silently vanishes), each
transaction_id owns a state slot.  Whichever half arrives first waits in
state; when the other half lands — any number of micro-batches later, in
either order — the correlated row is emitted exactly once.

Half-open transactions are flushed as ``outcome='timeout'`` rows when the
**event-time watermark** passes their last activity plus ``orphan_ttl``:
watermark-driven timeouts are deterministic (a function of the data, not
the wall clock), replayable from the checkpoint, and terminate cleanly
under ``availableNow`` triggers — a processing-time timeout would keep
the trigger alive waiting for the clock.

Scale posture: state is partitioned by the grouping key across the
cluster (one state store per shuffle partition); per-key state is one
fixed-width tuple, so memory is O(open transactions), and the TTL bounds
"open".
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# one in-flight transaction: the halves seen so far + last activity (ms)
STATE_SCHEMA = T.StructType([
    T.StructField("req_ts", T.StringType()),
    T.StructField("app_id", T.StringType()),
    T.StructField("endpoint", T.StringType()),
    T.StructField("status_code", T.IntegerType()),
    T.StructField("resp_ts", T.StringType()),
    T.StructField("last_ms", T.LongType()),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("transaction_id", T.StringType()),
    T.StructField("app_id", T.StringType()),
    T.StructField("endpoint", T.StringType()),
    T.StructField("status_code", T.IntegerType()),
    T.StructField("req_ts", T.StringType()),
    T.StructField("resp_ts", T.StringType()),
    T.StructField("outcome", T.StringType()),  # correlated | timeout
])

ORPHAN_TTL_MS = 3_600_000  # flush half-open transactions after 1h event time


def _correlate_one(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one transaction_id into state; emit when
    both halves are present (latest response wins) or when the watermark
    expires the key."""
    (txn,) = key

    if state.hasTimedOut:
        req_ts, app_id, endpoint, status_code, resp_ts, _last = state.get
        state.remove()
        yield pd.DataFrame([{
            "transaction_id": txn, "app_id": app_id, "endpoint": endpoint,
            "status_code": status_code, "req_ts": req_ts, "resp_ts": resp_ts,
            "outcome": "timeout",
        }])
        return

    req_ts = app_id = endpoint = resp_ts = None
    status_code: Any = None
    last_ms = 0
    if state.exists:
        req_ts, app_id, endpoint, status_code, resp_ts, last_ms = state.get

    for pdf in pdfs:
        if "event_time" in pdf.columns and len(pdf):
            batch_max = pdf["event_time"].max()
            if pd.notna(batch_max):
                last_ms = max(last_ms, int(batch_max.value // 1_000_000))
        for row in pdf.itertuples(index=False):
            if row.record_type == "request":
                req_ts, app_id, endpoint = row.ts, row.app_id, row.endpoint
            else:  # latest response wins
                if resp_ts is None or (row.ts or "") >= resp_ts:
                    status_code, resp_ts = row.status_code, row.ts

    if req_ts is not None and resp_ts is not None:
        state.remove()
        yield pd.DataFrame([{
            "transaction_id": txn, "app_id": app_id, "endpoint": endpoint,
            "status_code": status_code, "req_ts": req_ts, "resp_ts": resp_ts,
            "outcome": "correlated",
        }])
    else:
        state.update((req_ts, app_id, endpoint,
                      None if status_code is None else int(status_code),
                      resp_ts, last_ms))
        # expire when the watermark passes last activity + TTL (must be
        # strictly ahead of the current watermark or Spark rejects it)
        state.setTimeoutTimestamp(
            max(last_ms + ORPHAN_TTL_MS, state.getCurrentWatermarkMs() + 1)
        )


def correlate_with_state(events: DataFrame, lateness: str = "10 minutes") -> DataFrame:
    """events: (transaction_id, record_type, ts, app_id, endpoint,
    status_code) streaming DataFrame -> correlated/timeout rows.

    ``ts`` (ISO string) becomes the event-time column; the watermark both
    bounds late data and drives orphan expiry.  groupBy(transaction_id)
    shuffles each key's rows to its state-store partition; the pandas
    function then sees per-key Arrow batches."""
    with_et = events.withColumn("event_time", F.to_timestamp("ts"))
    return (
        with_et.withWatermark("event_time", lateness)
        .groupBy("transaction_id")
        .applyInPandasWithState(
            _correlate_one,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
