"""CSV / ORC interchange: schema'd round-trips, corrupt-line quarantine,
and ORC predicate pushdown parity with parquet."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestion_system_spark.catalog import Catalog
from data_ingestion_system_spark.sources import formats as FM

ORDERS_CSV_SCHEMA = T.StructType([
    T.StructField("o_orderkey", T.LongType()),
    T.StructField("o_custkey", T.LongType()),
    T.StructField("o_orderstatus", T.StringType()),
    T.StructField("o_totalprice", T.DoubleType()),
])


def _orders_subset(spark, sf_dir):
    return (Catalog(spark, sf_dir).orders
            .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
            .limit(200))


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    src = _orders_subset(spark, sf_dir)
    path = str(tmp_path / "orders_csv")
    FM.write_csv(src, path)
    good, bad = FM.quarantine_split(
        FM.read_csv_strict(spark, path, ORDERS_CSV_SCHEMA))
    assert bad.count() == 0
    assert sorted(map(tuple, good.collect())) == sorted(map(tuple, src.collect()))


def test_csv_corrupt_lines_quarantined(spark, tmp_path):
    path = tmp_path / "landing_csv"
    path.mkdir()
    (path / "part-ok.csv").write_text(
        "o_orderkey,o_custkey,o_orderstatus,o_totalprice\n"
        "1,10,O,99.5\n"
        "2,20,F,12.0\n")
    (path / "part-bad.csv").write_text(
        "o_orderkey,o_custkey,o_orderstatus,o_totalprice\n"
        "3,30,O,50.0\n"
        "not-a-number,x,?,zzz\n")
    good, bad = FM.quarantine_split(
        FM.read_csv_strict(spark, str(path), ORDERS_CSV_SCHEMA))
    assert {r.o_orderkey for r in good.collect()} == {1, 2, 3}
    bad_lines = [r[FM.CORRUPT_COL] for r in bad.collect()]
    assert bad_lines == ["not-a-number,x,?,zzz"]


def test_csv_to_parquet_bronze(spark, sf_dir, tmp_path):
    src = _orders_subset(spark, sf_dir)
    csv_path = str(tmp_path / "csv_in")
    pq_path = str(tmp_path / "pq_out")
    FM.write_csv(src, csv_path)
    bad = FM.csv_to_parquet(spark, csv_path, ORDERS_CSV_SCHEMA, pq_path)
    assert bad.count() == 0
    assert spark.read.parquet(pq_path).count() == src.count()


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    src = _orders_subset(spark, sf_dir)
    path = str(tmp_path / "orders_orc")
    FM.write_orc(src, path)
    back = FM.read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    # ORC scans take predicate pushdown like parquet: the filter must
    # reach the scan node, not sit in a post-scan Filter only
    plan = (back.filter(F.col("o_orderkey") == 1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,1)]" in plan


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    src = _orders_subset(spark, sf_dir)
    path = str(tmp_path / "orders_xml")
    FM.write_xml(src, path, row_tag="order")
    good, bad = FM.quarantine_split(
        FM.read_xml_strict(spark, path, ORDERS_CSV_SCHEMA, row_tag="order"))
    assert bad.count() == 0
    assert sorted(map(tuple, good.collect())) == sorted(map(tuple, src.collect()))


def test_xml_corrupt_records_quarantined(spark, tmp_path):
    d = tmp_path / "xml_land"
    d.mkdir()
    (d / "batch.xml").write_text(
        "<root>"
        "<order><o_orderkey>1</o_orderkey><o_custkey>7</o_custkey>"
        "<o_orderstatus>F</o_orderstatus><o_totalprice>10.5</o_totalprice></order>"
        "<order><o_orderkey>not_a_number</o_orderkey><o_custkey>8</o_custkey>"
        "<o_orderstatus>O</o_orderstatus><o_totalprice>1.0</o_totalprice></order>"
        "</root>")
    good, bad = FM.quarantine_split(
        FM.read_xml_strict(spark, str(d), ORDERS_CSV_SCHEMA, row_tag="order"))
    assert [r.o_orderkey for r in good.collect()] == [1]
    assert bad.count() == 1  # type-mismatched record lands in quarantine


def test_xml_to_parquet_bronze(spark, sf_dir, tmp_path):
    src = _orders_subset(spark, sf_dir)
    xml_path = str(tmp_path / "xml_in")
    pq_path = str(tmp_path / "pq_out")
    FM.write_xml(src, xml_path, row_tag="order")
    bad = FM.xml_to_parquet(spark, xml_path, ORDERS_CSV_SCHEMA, pq_path,
                            row_tag="order")
    assert bad.count() == 0
    assert spark.read.parquet(pq_path).count() == 200
