"""Streaming corpus curation: ingest-time near-dup rejection.

Wires the incremental MinHash index (operators/dedup_index.py) into a
Structured Streaming pipeline: documents land as JSON, every micro-batch
is (1) exact-deduped within itself, (2) probed against the signature
index of EVERYTHING accepted so far, (3) split into accepted docs and a
rejected-duplicates audit trail, and (4) the accepted docs' signatures
are appended to the index — so batch N+1's probe sees batch N without
ever rescanning text.  State across batches lives in the index table
(signature rows, ~bands longs/doc), not in streaming state: restarts
recover it for free from storage, and its size is independent of how
the stream is partitioned or resumed.

At 100 TB/day the cost per batch is O(batch + candidates): signature
pass over the batch, a band-partition-pruned equi-join against the
index, and point-reads of only the implicated corpus docs for exact
verify (see dedup_index.probe_index).  The reference has no dedup at
all (its at-least-once path duplicates on redelivery —
src/lambda/processQueue.ts:162-198); this closes that hole at the
content level, not just the message level.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from data_ingestion_system_spark.operators.dedup import normalized_text
from data_ingestion_system_spark.operators.dedup_index import (
    append_index,
    probe_index,
    write_index,
)

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])

_EMPTY_CLEAN_SCHEMA = "doc_id long, text string, lang string"


def _clean_store(spark: SparkSession, path: str) -> DataFrame:
    if os.path.isdir(path) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs):
        return spark.read.parquet(path)
    return spark.createDataFrame([], _EMPTY_CLEAN_SCHEMA)


def start_curation_stream(
    spark: SparkSession,
    landing_dir: str,
    clean_dir: str,
    rejects_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    *,
    threshold: float = 0.7,
    available_now: bool = True,
    processing_time: str = "1 second",
) -> StreamingQuery:
    """Landing JSON docs -> accepted corpus + rejected-dup audit + index.

    Within-batch exact dups collapse first (content fingerprint, min id
    wins); cross-batch/cross-history near-dups are whatever the index
    probe verifies at ``threshold``.  Rejects carry the matched corpus
    doc and the verified Jaccard — the human-auditable reason a doc
    never entered the corpus (O-27's quarantine pattern applied to
    content dedup)."""
    if not os.path.isdir(index_dir):
        # bootstrap an empty, schema-complete index so the first batch's
        # probe is uniform with every later one
        write_index(spark.createDataFrame([], _EMPTY_CLEAN_SCHEMA),
                    index_dir)

    raw = (spark.readStream.schema(DOC_SCHEMA).json(landing_dir))

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            # (1) within-batch exact dedup: min doc_id per normalized text
            fp = batch_df.withColumn(
                "__fp", F.md5(normalized_text(F.col("text"))))
            keep = fp.groupBy("__fp").agg(F.min("doc_id").alias("doc_id"))
            batch = (fp.join(keep, ["__fp", "doc_id"], "left_semi")
                     .drop("__fp"))
            # (2) probe accepted history via the signature index
            corpus = _clean_store(spark, clean_dir)
            hits = probe_index(spark, index_dir, batch, corpus,
                               threshold=threshold).persist()
            try:
                dup_ids = hits.select(
                    F.col("batch_id").alias("doc_id")).distinct()
                accepted = batch.join(dup_ids, "doc_id", "left_anti")
                # (3) accepted docs land; rejects carry their evidence
                accepted.write.mode("append").parquet(clean_dir)
                (hits.withColumn("micro_batch", F.lit(batch_id))
                 .write.mode("append").parquet(rejects_dir))
                # (4) tomorrow's probe sees today's accepted docs
                append_index(accepted, index_dir)
            finally:
                hits.unpersist()
        finally:
            batch_df.unpersist()

    writer = raw.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
