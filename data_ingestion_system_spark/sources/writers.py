"""Partitioned sinks + binary source — the storage layout that replaces
the reference's five secondary indexes.

The reference lays records out as ``audit/{yyyy-MM-dd}/{txn}/...`` S3 keys
(``src/services/s3.service.ts:33-34``) and leans on Postgres B-tree
indexes for the filter columns (``src/scripts/setup-db.ts:72-78``).  Spark
has no secondary indexes; the equivalent machinery is

* **hive-style date partitioning** (O-3/O-25): equality/range predicates
  on `audit_date` prune whole directories before any I/O;
* **sorted-within-partition layout**: sorting each file by the top-k sort
  key (`timestamp`) tightens parquet row-group min/max stats, so
  `ORDER BY ts DESC LIMIT k` touches the newest row-groups only;
* **row-group stats + dictionary + optional bloom filters** on the
  point-lookup column (`transaction_id`) do the B-tree's job per file.

At 100 TB the partition count, not the byte count, is the failure mode:
one `repartition` on the partition column before the write keeps it to
one file per date per shuffle partition instead of
`tasks x dates` small files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_ATTACHMENT_BYTES = 5 * 1024 * 1024  # multer cap, audit.middleware.ts:10


def with_audit_date(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """O-34: derive the partition column ``audit_date`` (yyyy-MM-dd)."""
    return df.withColumn("audit_date", F.date_format(F.col(ts_col), "yyyy-MM-dd"))


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "timestamp",
    sort_col: str | None = None,
    mode: str = "append",
    bloom_col: str | None = "transaction_id",
) -> None:
    """O-3 + O-25: date-partitioned parquet append with skipping-friendly
    layout.  ``repartition(partition_col)`` coalesces each date's rows into
    the same tasks (small-file control); ``sortWithinPartitions`` makes the
    row-group stats on the sort column tight."""
    out = with_audit_date(df, ts_col).repartition(F.col("audit_date"))
    if sort_col:
        out = out.sortWithinPartitions(F.col("audit_date"), F.col(sort_col).desc())
    writer = out.write.mode(mode).partitionBy("audit_date")
    if bloom_col and bloom_col in df.columns:
        writer = (
            writer.option(f"parquet.bloom.filter.enabled#{bloom_col}", "true")
            .option(f"parquet.bloom.filter.expected.ndv#{bloom_col}", "1000000")
        )
    writer.parquet(path)


def read_binary_dir(spark: SparkSession, path: str,
                    max_bytes: int = MAX_ATTACHMENT_BYTES,
                    glob: str | None = None) -> DataFrame:
    """O-2/O-5: binary attachment source -> (path, modificationTime,
    length, content: binary).  The reference's 5 MB multer cap becomes a
    filter on `length` — pushed to the file listing, so oversize blobs are
    never fetched."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path).filter(F.col("length") <= max_bytes)
