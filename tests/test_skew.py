"""Salted-join correctness: equal to the plain join on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_system_spark.operators.skew import salted_join


def _skewed(spark):
    # 90% of probe rows share one hot key
    probe = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id") % 50)
        .alias("k"),
        F.col("id").alias("pv"),
    )
    build = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("bv"))
    return probe, build


def test_salted_inner_equals_plain(spark):
    probe, build = _skewed(spark)
    got = sorted(map(tuple, salted_join(probe, build, "k", salt=8).collect()))
    expect = sorted(map(tuple, probe.join(build, "k").collect()))
    assert got == expect and len(got) == 1000


def test_salted_left_preserves_probe(spark):
    probe, build = _skewed(spark)
    small_build = build.filter(F.col("k") < 5)   # most probe rows unmatched
    got = sorted(
        (r.k, r.pv, r.bv)
        for r in salted_join(probe, small_build, "k", salt=4, how="left").collect()
    )
    expect = sorted(
        (r.k, r.pv, r.bv)
        for r in probe.join(small_build, "k", "left").collect()
    )
    assert got == expect and len(got) == 1000


def test_salt_actually_spreads_hot_key(spark):
    probe, build = _skewed(spark)
    joined = salted_join(probe, build, "k", salt=8)
    # inspect the salted shuffle key distribution: hot key 7 must occupy
    # multiple (k, salt) groups
    from data_ingestion_system_spark.operators.skew import SALT_COL
    salted = probe.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(8)),
    )
    groups = (
        salted.filter(F.col("k") == 7)
        .select(SALT_COL).distinct().count()
    )
    assert groups >= 6   # 900 hot rows spread over ~8 salts
    assert joined.count() == 1000
