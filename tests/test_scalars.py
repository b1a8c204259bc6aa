"""O-42 uuid minting + O-44 byte pretty-print."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from data_ingestion_system_spark.functions.scalars import format_bytes, with_uuid

UUID_V4 = re.compile(
    r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$")


def test_with_uuid_format_and_uniqueness(spark):
    rows = with_uuid(spark.range(500)).collect()
    ids = [r.record_uuid for r in rows]
    assert len(set(ids)) == 500                      # unique per row
    for u in ids[:50]:
        assert UUID_V4.match(u), u                   # RFC-4122 v4 shape


def test_format_bytes_ladder(spark):
    cases = [
        (0, "0 B"),
        (923, "923 B"),
        (1024, "1.00 KiB"),
        (1240, "1.21 KiB"),
        (10 * 1024 * 1024, "10.00 MiB"),
        (int(3.5 * (1 << 30)), "3.50 GiB"),
        ((1 << 40) * 2, "2.00 TiB"),
    ]
    df = spark.createDataFrame([(v,) for v, _ in cases], "n long")
    got = [r.s for r in
           df.select(format_bytes("n").alias("s")).orderBy("n").collect()]
    assert got == [s for _, s in sorted(cases)]
