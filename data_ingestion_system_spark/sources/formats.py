"""Additional interchange formats: CSV, XML and ORC.

The reference ingests only JSON payloads and raw binary
(src/middleware/audit.middleware.ts:15-41, src/services/s3.service.ts:32-67);
a user replacing it with this engine also gets the Spark-native exchange
formats for free.  Same posture as sources/ingest.py: explicit schemas
(never runtime inference on the hot path), PERMISSIVE corrupt-record
capture instead of job failure, and columnar ORC/Parquet for anything
that will be re-read.

Scale notes: CSV is a row format that cannot push projections or
predicates — treat it as a landing format only and convert to
Parquet/ORC at the bronze boundary (`csv_to_parquet` below).  ORC gets
the same pushdown/statistics treatment as Parquet from Catalyst
(PushedFilters + min/max skipping), so either columnar format holds at
100 TB; Parquet stays the default everywhere else in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt"


def read_csv_strict(spark: SparkSession, path: str,
                    schema: T.StructType) -> DataFrame:
    """CSV with an explicit schema and corrupt-line capture: malformed
    rows land with all data columns NULL and the raw line preserved in
    ``_corrupt`` — split them off with `quarantine_split`, mirroring the
    JSON landing reader (sources/ingest.py::read_landing)."""
    # StructType.add mutates in place — build a fresh schema so the
    # caller's object survives repeated reads
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    return (
        spark.read.schema(full)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good rows without the marker column, quarantined raw lines).

    The landing batch is persisted first: Spark refuses plans that read
    only the internal corrupt-record column from a raw CSV scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and caching is the documented
    out.  It also means the one physical read feeds both branches —
    at the bronze boundary each batch is read once regardless."""
    df = df.persist()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


def write_csv(df: DataFrame, path: str) -> None:
    """Header'd CSV export (interchange with non-Spark consumers)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def csv_to_parquet(spark: SparkSession, csv_path: str,
                   schema: T.StructType, parquet_path: str) -> DataFrame:
    """Bronze-boundary conversion: land CSV once, quarantine bad lines,
    persist columnar.  Returns the quarantined lines for the caller's
    dead-letter sink (O-27 semantics)."""
    good, bad = quarantine_split(read_csv_strict(spark, csv_path, schema))
    good.write.mode("overwrite").parquet(parquet_path)
    return bad


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_xml_strict(spark: SparkSession, path: str, schema: T.StructType,
                    row_tag: str = "record") -> DataFrame:
    """XML landing (Spark 4 native source) with an explicit schema and
    corrupt-record capture — the same PERMISSIVE posture as the CSV/JSON
    readers.  XML is a landing-only format like CSV: no
    projection/predicate pushdown, so convert at the bronze boundary
    (`xml_to_parquet`).  Each ``<row_tag>`` element is one record;
    nested elements map onto struct fields."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    return (
        spark.read.format("xml")
        .schema(full)
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .load(path)
    )


def write_xml(df: DataFrame, path: str, row_tag: str = "record") -> None:
    """XML export (interchange with XML-consuming systems)."""
    (df.write.mode("overwrite").format("xml")
     .option("rowTag", row_tag).save(path))


def xml_to_parquet(spark: SparkSession, xml_path: str, schema: T.StructType,
                   parquet_path: str, row_tag: str = "record") -> DataFrame:
    """Bronze-boundary conversion for XML landings; returns quarantined
    raw records for the dead-letter sink (O-27 semantics)."""
    good, bad = quarantine_split(read_xml_strict(spark, xml_path, schema, row_tag))
    good.write.mode("overwrite").parquet(parquet_path)
    return bad
